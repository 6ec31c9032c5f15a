"""Generate benchmarks/golden/nk_hrv_oracle.json — a hand-derived
neurokit2-convention oracle for the HRV features (VERDICT r4 weak #5).

neurokit2 cannot be installed here (zero egress), but for a FIXED R-peak
sequence its HRV outputs are published, standardized formulas (neurokit2
0.2.12 implements the Task Force definitions verbatim; reference
preprocess.py:82-95 feeds nk.hrv the detected peaks):

  RRI     = diff(peaks)/fs*1000                       [ms]
  RMSSD   = sqrt(mean(diff(RRI)^2))
  SDNN    = std(RRI, ddof=1)
  SampEn  = Richman-Moorman sample entropy, m=2, r=0.2*SD(RRI)
            (nk's tolerance 'sd' uses ddof=1; this file commits BOTH
            conventions so the delta of ours — ddof=0 — is quantified)
  LF/HF   = Welch band-power ratio of the PCHIP-interpolated tachogram
            (analytic truth for sinusoidally modulated RR: the band powers
            are A^2/2 each, so LF/HF = (A_lf/A_hf)^2)

This script derives those constants with standalone code (NO import of
multimodalsignal_tpu — independence from the implementation under test) on
three fixed 60 s windows: pure-HF, pure-LF, and mixed LF+HF modulation.
The peak sample indices themselves are part of the committed fixture: peak
placement is continuous-time beat integration quantized to the 128 Hz grid,
so quantization is inside the oracle, not a source of delta.

benchmarks/feature_validation.py and tests/test_features.py consume the
JSON and report per-feature deltas of the real pipeline (ECG synthesis ->
R-peak detection -> hrv_features) against these constants.

Run: python benchmarks/make_nk_oracle.py   (CPU, <1 s; deterministic)
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

FS = 128
WINDOW_S = 60
OUT = Path(__file__).parent / "golden" / "nk_hrv_oracle.json"

# (name, [(freq_hz, amplitude_ms), ...]) — all modulations sit strictly
# inside their Task Force band: LF 0.04-0.15 Hz, HF 0.15-0.4 Hz.
PROFILES = (
    ("hf", ((0.30, 60.0),)),
    ("lf", ((0.095, 60.0),)),
    ("mixed", ((0.095, 50.0), (0.30, 40.0))),
)
BASE_RR_MS = 800.0
FIRST_PEAK_SAMPLE = 50
TAIL_GUARD = 50  # keep peaks clear of the window edge (QRS synthesis room)


def beat_times(mods, horizon_s: float) -> np.ndarray:
    """Continuous-time beat integration: t_{k+1} = t_k + rr(t_k)."""
    t, times = 0.0, [0.0]
    while True:
        rr_ms = BASE_RR_MS + sum(a * np.sin(2 * np.pi * f * t)
                                 for f, a in mods)
        t += rr_ms / 1000.0
        if t >= horizon_s:
            return np.asarray(times)
        times.append(t)


def sample_entropy(x: np.ndarray, m: int, r: float) -> float:
    """Literal O(n^2) Richman-Moorman SampEn (Chebyshev distance, self-match
    excluded) — independent of the package's vectorized implementation."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)

    def count(mm: int) -> int:
        total = 0
        for i in range(n - mm + 1):
            for j in range(i + 1, n - mm + 1):
                if max(abs(x[i + k] - x[j + k]) for k in range(mm)) <= r:
                    total += 1
        return total

    b, a = count(m), count(m + 1)
    return float(-np.log(a / b))


def main() -> None:
    profiles = {}
    for name, mods in PROFILES:
        times = beat_times(mods, WINDOW_S - (FIRST_PEAK_SAMPLE + TAIL_GUARD) / FS)
        peaks = FIRST_PEAK_SAMPLE + np.round(times * FS).astype(np.int64)
        assert peaks[-1] < WINDOW_S * FS - TAIL_GUARD
        rr_ms = np.diff(peaks) / FS * 1000.0

        sd0 = float(np.std(rr_ms, ddof=0))
        sd1 = float(np.std(rr_ms, ddof=1))
        analytic = {
            "bands_hz": {"lf": [0.04, 0.15], "hf": [0.15, 0.40]},
            "modulations": [{"freq_hz": f, "amplitude_ms": a}
                            for f, a in mods],
            # A^2/2 per in-band sinusoid; 0.0 when the band is empty.
            "lf_power_ms2": sum(a * a / 2 for f, a in mods
                                if 0.04 <= f < 0.15),
            "hf_power_ms2": sum(a * a / 2 for f, a in mods
                                if 0.15 <= f < 0.40),
        }
        lf, hf = analytic["lf_power_ms2"], analytic["hf_power_ms2"]
        analytic["lfhf"] = (lf / hf) if hf > 0 else None

        profiles[name] = {
            "peaks": peaks.tolist(),
            "rr_ms": [round(v, 6) for v in rr_ms.tolist()],
            "num_beats": int(len(peaks)),
            "rmssd_ms": float(np.sqrt(np.mean(np.diff(rr_ms) ** 2))),
            "sdnn_ms": sd1,
            "sampen_r_sd0": sample_entropy(rr_ms, 2, 0.2 * sd0),
            "sampen_r_sd1": sample_entropy(rr_ms, 2, 0.2 * sd1),
            "analytic": analytic,
        }

    out = {
        "description": "hand-derived neurokit2-convention HRV oracle on "
                       "fixed 60 s windows (see make_nk_oracle.py)",
        "fs": FS,
        "window_s": WINDOW_S,
        "base_rr_ms": BASE_RR_MS,
        "sampen": {"m": 2, "r_factor": 0.2,
                   "note": "nk 0.2.12 tolerance 'sd' uses ddof=1 (sampen_r_sd1); "
                           "the package's data/features.py uses ddof=0 "
                           "(sampen_r_sd0) — both committed so the "
                           "convention delta is pinned"},
        "profiles": profiles,
    }
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(out, indent=2) + "\n")
    for name, p in profiles.items():
        print(f"{name:6s} beats={p['num_beats']:3d} "
              f"rmssd={p['rmssd_ms']:8.3f} sdnn={p['sdnn_ms']:8.3f} "
              f"sampen(sd1)={p['sampen_r_sd1']:.4f} "
              f"lfhf={p['analytic']['lfhf']}")
    print(f"written: {OUT}")


if __name__ == "__main__":
    main()
