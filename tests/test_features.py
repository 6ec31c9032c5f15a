"""Handcrafted feature extraction sanity on signals with known physiology."""

import numpy as np
import pytest

from multimodalsignal_tpu.data.features import (
    FEATURE_NAMES,
    PCHIP_POWER_RECOVERY,
    detect_r_peaks,
    extract_handcrafted_features,
    resp_features,
    sample_entropy,
)

FS = 128
T = 60 * FS


def _ecg(hr_bpm=70.0, fs=FS, seconds=60, jitter=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    phase = (t * hr_bpm / 60.0) % 1.0
    if jitter:
        phase = ((t + jitter * np.cumsum(rng.standard_normal(len(t))) / fs) * hr_bpm / 60.0) % 1.0
    return np.exp(-((phase - 0.5) ** 2) / (2 * 0.003)) + 0.02 * rng.standard_normal(len(t))


def test_r_peak_rate():
    ecg = _ecg(hr_bpm=72.0)
    peaks = detect_r_peaks(ecg, FS)
    # 72 bpm over 60 s -> ~72 beats
    assert 68 <= len(peaks) <= 76
    rr = np.diff(peaks) / FS
    assert abs(np.median(rr) - 60.0 / 72.0) < 0.05


def test_resp_rate():
    t = np.arange(T) / FS
    resp = np.sin(2 * np.pi * (15.0 / 60.0) * t) + 0.05 * np.random.default_rng(0).standard_normal(T)
    feats = resp_features(resp, FS)
    assert abs(feats["RESP_Rate_Mean"] - 15.0) < 1.5
    assert feats["RESP_RRV_SDNN"] >= 0


def test_sample_entropy_regular_vs_random():
    rng = np.random.default_rng(0)
    regular = np.tile([800.0, 810.0], 30)
    random = rng.uniform(600, 1000, 60)
    assert sample_entropy(random) > sample_entropy(regular)


def test_extract_full_window_names_and_nan_contract():
    rng = np.random.default_rng(1)
    t = np.arange(T) / FS
    window = {
        "chest_ECG": _ecg(65.0),
        "chest_EDA": 2.0 + 0.3 * np.sin(2 * np.pi * 0.02 * t) + 0.01 * rng.standard_normal(T),
        "chest_Resp": np.sin(2 * np.pi * 0.25 * t),
        "chest_EMG": 0.05 * rng.standard_normal(T),
    }
    feats = extract_handcrafted_features(window, FS)
    assert tuple(feats) == FEATURE_NAMES
    for k in ("HRV_RMSSD", "HRV_SDNN", "EMG_Amplitude_Mean", "RESP_Rate_Mean"):
        assert np.isfinite(feats[k]), k
    assert feats["EMG_Amplitude_Mean"] == pytest.approx(np.mean(np.abs(window["chest_EMG"])))

    # Garbage ECG -> HRV features NaN, others still computed (reference
    # preprocess.py:92-95 NaNs only the failing group).
    window["chest_ECG"] = np.zeros(T)
    feats = extract_handcrafted_features(window, FS)
    assert np.isnan(feats["HRV_RMSSD"])
    assert np.isfinite(feats["EMG_Amplitude_Mean"])


def test_hrv_distinguishes_stress():
    """Higher HR + lower variability (stress) must separate from baseline."""
    calm = extract_handcrafted_features({"chest_ECG": _ecg(62.0, jitter=0.02, seed=2)}, FS)
    stressed = extract_handcrafted_features({"chest_ECG": _ecg(95.0, jitter=0.002, seed=3)}, FS)
    assert np.isfinite(calm["HRV_SDNN"]) and np.isfinite(stressed["HRV_SDNN"])
    assert stressed["HRV_SDNN"] < calm["HRV_SDNN"]


# ---------------------------------------------------------------------------
# Analytic golden values (VERDICT: pin exact math, not just monotonicity)
# ---------------------------------------------------------------------------

def _ecg_from_peaks(peak_samples, n, fs=FS):
    """Clean ECG with narrow gaussian R waves exactly at the given samples."""
    t = np.arange(n)
    ecg = np.zeros(n)
    for p in peak_samples:
        ecg += np.exp(-((t - p) ** 2) / (2 * 2.0**2))
    return ecg


def test_rmssd_sdnn_exact_on_constructed_rr():
    """Place R peaks at exact samples -> RMSSD/SDNN must equal the closed-form
    values of the constructed RR sequence."""
    from multimodalsignal_tpu.data.features import hrv_features

    intervals = np.tile([102, 109], 20)  # samples @128 Hz ~ 797/852 ms
    peaks = 100 + np.concatenate([[0], np.cumsum(intervals)])
    n = int(peaks[-1] + 200)
    ecg = _ecg_from_peaks(peaks, n)

    detected = detect_r_peaks(ecg, FS)
    np.testing.assert_array_equal(detected, peaks)

    rr_ms = np.diff(peaks) / FS * 1000.0
    expected_rmssd = np.sqrt(np.mean(np.diff(rr_ms) ** 2))
    expected_sdnn = np.std(rr_ms, ddof=1)

    feats = hrv_features(ecg, FS)
    assert feats["HRV_RMSSD"] == pytest.approx(expected_rmssd, rel=1e-9)
    assert feats["HRV_SDNN"] == pytest.approx(expected_sdnn, rel=1e-9)


@pytest.mark.parametrize("f_mod,band,pchip_factor",
                         [(0.1, "lf", PCHIP_POWER_RECOVERY["lf"]),
                          (0.3, "hf", PCHIP_POWER_RECOVERY["hf"])])
def test_rr_band_powers_sinusoidal_tachogram(f_mod, band, pchip_factor):
    """RR modulated at f_mod with amplitude A carries A^2/2 ms^2 of power in
    exactly one band: 0.1 Hz -> LF (0.04-0.15), 0.3 Hz -> HF (0.15-0.4).
    A band-edge or sign error in _rr_band_powers fails this.

    The PCHIP tachogram interpolant (the neurokit2 family; _rr_band_powers
    docstring) smooths a ~1.25 Hz beat-sampled modulation: the measured
    power recovery factors on this fixture are pinned (0.9941 at 0.1 Hz,
    0.8408 at 0.3 Hz — vs 0.990/0.676 for linear interpolation). A drift
    here means the estimator's transfer function changed."""
    from multimodalsignal_tpu.data.features import _rr_band_powers

    amp = 100.0  # ms
    t, times = 0.0, []
    while t < 300.0:  # 5 min of beats for spectral resolution
        times.append(t)
        rr_s = (800.0 + amp * np.sin(2 * np.pi * f_mod * t)) / 1000.0
        t += rr_s
    rpeaks = np.round(np.asarray(times) * FS).astype(np.int64)
    rr_ms = np.diff(rpeaks) / FS * 1000.0
    lf, hf = _rr_band_powers(rpeaks, rr_ms, FS)

    expected = amp**2 / 2.0 * pchip_factor
    major, minor = (lf, hf) if band == "lf" else (hf, lf)
    assert major == pytest.approx(expected, rel=0.02), (lf, hf)
    assert minor < 0.05 * major, (lf, hf)


def _sample_entropy_bruteforce(x, m=2, r_factor=0.2):
    """Literal O(N^2) SampEn definition — an independent oracle."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    r = r_factor * np.std(x, ddof=0)

    def count(mm):
        total = 0
        for i in range(n - mm + 1):
            for j in range(i + 1, n - mm + 1):
                if max(abs(x[i + k] - x[j + k]) for k in range(mm)) <= r:
                    total += 1
        return total

    b, a = count(m), count(m + 1)
    return -np.log(a / b)


def test_sample_entropy_matches_bruteforce_oracle():
    rng = np.random.default_rng(5)
    for x in (rng.uniform(600, 1000, 60),
              800 + 50 * np.sin(np.arange(60) * 0.7),
              np.tile([700.0, 900.0, 800.0], 20)):
        assert sample_entropy(x) == pytest.approx(
            _sample_entropy_bruteforce(x), rel=1e-10
        )


def test_sample_entropy_degenerate_cases():
    assert np.isnan(sample_entropy(np.full(50, 800.0)))  # r == 0
    assert np.isnan(sample_entropy(np.array([1.0, 2.0])))  # too short


def test_scr_count_exact_on_constructed_events():
    """K well-separated SCR events on a flat tonic -> exactly K peaks."""
    from multimodalsignal_tpu.data.features import eda_features

    n = T
    t = np.arange(n) / FS
    eda = np.full(n, 2.0)
    onsets_s = [5.0, 15.0, 25.0, 38.0, 50.0]
    for onset in onsets_s:
        rise = np.clip(t - onset, 0.0, None)
        tau = 2.0
        eda += 0.5 * (rise / tau) * np.exp(1 - rise / tau)
    feats = eda_features(eda, FS)
    assert feats["EDA_SCR_Peaks_N"] == len(onsets_s)


def test_eda_tonic_slope_on_linear_ramp():
    """Pure linear ramp, no events: slope per 16 Hz sample = a / 16; no SCRs
    beyond noise floor."""
    from multimodalsignal_tpu.data.features import eda_features

    a = 0.01  # EDA units per second
    t = np.arange(T) / FS
    eda = 2.0 + a * t
    feats = eda_features(eda, FS)
    assert feats["EDA_Tonic_Slope"] == pytest.approx(a / 16.0, rel=0.05)
    # No fabricated SCRs: the detrended resample kills the Gibbs ringing a
    # plain FFT resample of this non-periodic ramp produces (23 fake peaks).
    assert feats["EDA_SCR_Peaks_N"] == 0


def test_batch_matches_per_window():
    """The batched extractor's vectorized whole-subject DSP (one sosfiltfilt /
    rfft / polyfit over [N, T]) must reproduce the per-window extractors,
    including a NaN-poisoned window staying contained to its own row."""
    from multimodalsignal_tpu.data.features import extract_features_batch

    rng = np.random.default_rng(7)
    t = np.arange(T) / FS
    n = 6
    windows = {
        "chest_ECG": np.stack([_ecg(60.0 + 5 * i, jitter=0.01 * i, seed=i) for i in range(n)]),
        "chest_EDA": np.stack([
            2.0 + 0.1 * i + 0.3 * np.sin(2 * np.pi * (0.02 + 0.005 * i) * t)
            + 0.01 * rng.standard_normal(T) for i in range(n)
        ]),
        "chest_Resp": np.stack([
            np.sin(2 * np.pi * (0.2 + 0.02 * i) * t)
            + 0.05 * rng.standard_normal(T) for i in range(n)
        ]),
        "chest_EMG": 0.05 * rng.standard_normal((n, T)),
    }
    windows["chest_ECG"][3, 100] = np.nan  # poison one window

    batch = extract_features_batch(windows, FS)
    ref = np.stack([
        [extract_handcrafted_features({k: v[i] for k, v in windows.items()}, FS)[name]
         for name in FEATURE_NAMES]
        for i in range(n)
    ])
    assert batch.shape == ref.shape == (n, len(FEATURE_NAMES))
    assert np.array_equal(np.isnan(batch), np.isnan(ref))
    np.testing.assert_allclose(batch, ref, rtol=1e-7, atol=1e-12, equal_nan=True)
    # Integer-valued peak-count features must agree exactly.
    for j, name in enumerate(FEATURE_NAMES):
        if name == "EDA_SCR_Peaks_N":
            ok = ~np.isnan(ref[:, j])
            assert np.array_equal(batch[ok, j], ref[ok, j])
    # The poisoned window NaNs its HRV group only; neighbours stay finite.
    assert np.isnan(batch[3, :5]).all()
    assert np.isfinite(batch[2]).all() and np.isfinite(batch[4]).all()


def test_nk_oracle_parity():
    """Per-feature parity against the hand-derived neurokit2-convention
    constants (benchmarks/golden/nk_hrv_oracle.json; derivation:
    benchmarks/make_nk_oracle.py — for a fixed detected-peak sequence,
    nk 0.2.12's RMSSD/SDNN/SampEn are exact published formulas, and LF/HF
    has an analytic truth for sinusoidally modulated RR). The full pipeline
    runs here: ECG synthesis from the committed peaks -> detect_r_peaks
    (must be exact, isolating estimator error from detection error) ->
    hrv_features."""
    import json
    from pathlib import Path

    from multimodalsignal_tpu.data.features import hrv_features

    oracle = json.loads(
        (Path(__file__).parent.parent / "benchmarks" / "golden"
         / "nk_hrv_oracle.json").read_text())
    assert oracle["fs"] == FS
    n = oracle["window_s"] * FS
    # PCHIP tachogram-interpolant power transfer at the oracle's modulation
    # frequencies (canonical constants: data/features.py).
    factor = {0.095: PCHIP_POWER_RECOVERY["lf"],
              0.30: PCHIP_POWER_RECOVERY["hf"]}

    for name, p in oracle["profiles"].items():
        peaks = np.asarray(p["peaks"], dtype=np.int64)
        ecg = _ecg_from_peaks(peaks, n)
        np.testing.assert_array_equal(detect_r_peaks(ecg, FS), peaks,
                                      err_msg=f"profile {name}")
        feats = hrv_features(ecg, FS)
        assert feats["HRV_RMSSD"] == pytest.approx(p["rmssd_ms"], rel=1e-9)
        assert feats["HRV_SDNN"] == pytest.approx(p["sdnn_ms"], rel=1e-9)
        # ddof=0 convention exactly; nk's ddof=1 tolerance shift crosses no
        # template distance on these fixtures (both constants committed).
        assert feats["HRV_SampEn"] == pytest.approx(p["sampen_r_sd0"], rel=1e-9)
        assert feats["HRV_SampEn"] == pytest.approx(p["sampen_r_sd1"], rel=1e-9)
        an = p["analytic"]
        if an["lfhf"] is not None and an["lfhf"] > 0:
            predicted = an["lfhf"] * factor[0.095] / factor[0.30]
            assert feats["HRV_LFHF"] == pytest.approx(predicted, rel=0.02), name
        if an["hf_power_ms2"] > 0:
            assert feats["HRV_HF"] == pytest.approx(
                an["hf_power_ms2"] * factor[0.30], rel=0.05), name
