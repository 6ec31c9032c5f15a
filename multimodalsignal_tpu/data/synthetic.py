"""Synthetic WESAD-shaped fixtures.

The real WESAD corpus is a manual download (reference README.md:27-31), so the
test/CI story needs a generator that fabricates S*/S*.pkl + S*_quest.csv files
with the exact layout the loaders expect (byte-keyed pickle dict with chest
channels ACC [T,3] and ECG/EDA/EMG/Resp/Temp [T,1] at 700 Hz, ';'-separated
quest CSV with # ORDER/# START/# END rows).

Signals are label-dependent (heart rate, EDA tonic level, respiration rate and
EMG amplitude all shift with the protocol condition) so end-to-end tests can
actually learn the classification task rather than fit noise.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

DEFAULT_TASKS = (
    ("Base", 3.0),
    ("TSST", 2.0),
    ("Medi 1", 1.0),
    ("Fun", 1.5),
    ("Medi 2", 1.0),
)

# Per-condition physiology used to synthesize separable signals.
_CONDITION = {
    "Base": dict(hr=65.0, eda=2.0, resp=14.0, emg=0.02),
    "TSST": dict(hr=95.0, eda=6.0, resp=22.0, emg=0.12),
    "Fun": dict(hr=78.0, eda=3.5, resp=17.0, emg=0.05),
    "Medi1": dict(hr=60.0, eda=1.5, resp=11.0, emg=0.015),
    "Medi2": dict(hr=58.0, eda=1.4, resp=10.0, emg=0.015),
}


def _ecg_like(t: np.ndarray, hr_hz: float, rng: np.random.Generator) -> np.ndarray:
    """Spiky pseudo-ECG: narrow gaussian R peaks on a jittered beat grid."""
    phase = (t * hr_hz + rng.uniform(0, 1)) % 1.0
    r_wave = np.exp(-((phase - 0.5) ** 2) / (2 * 0.003))
    t_wave = 0.25 * np.exp(-((phase - 0.75) ** 2) / (2 * 0.01))
    return 0.9 * r_wave + t_wave + 0.02 * rng.standard_normal(t.shape)


def synthesize_subject(
    subject_id: str,
    tasks=DEFAULT_TASKS,
    fs: int = 700,
    seed: int | None = None,
    subject_variability: float = 1.0,
    noise: float = 1.0,
) -> tuple[dict, str]:
    """Build one subject: (pickle-ready dict, quest CSV text).

    subject_variability scales the cross-subject physiological offsets and
    noise scales all additive noise — raise both (e.g. 2.5 / 4.0) to make
    LOSO generalization non-trivial, so early stopping and cross-subject
    normalization behave like they do on real WESAD."""
    if seed is None:
        seed = abs(hash(subject_id)) % (2**31)
    rng = np.random.default_rng(seed)
    # Subject-specific physiological offsets: makes the per-subject
    # normalization in the dataset layer load-bearing, like real WESAD.
    hr_off = rng.uniform(-8, 8) * subject_variability
    eda_off = rng.uniform(0.5, 2.0) ** subject_variability
    # Subject-specific RESPONSE MAGNITUDE: at subject_variability > 1 some
    # subjects are weak physiological responders (their condition deltas
    # shrink toward baseline), which is what actually makes cross-subject
    # LOSO generalization hard on real WESAD. 1.0 at default variability.
    if subject_variability > 1.0:
        response_scale = rng.uniform(0.15, 1.0)
    else:
        response_scale = 1.0
    base_cond = _CONDITION["Base"]

    segments = {k: [] for k in ("ACC", "ECG", "EDA", "EMG", "Resp", "Temp")}
    # Wrist (Empatica E4) channels at their native rates (wesad_io.WRIST_RATES).
    wrist_segments = {k: [] for k in ("ACC", "BVP", "EDA", "TEMP")}
    wrist_fs = {"ACC": 32, "BVP": 64, "EDA": 4, "TEMP": 4}
    order, starts, ends = [], [], []
    cursor_min = 0.0
    for task, dur_min in tasks:
        key = task.replace(" ", "").strip()
        cond = _CONDITION.get(key, _CONDITION["Base"])
        if response_scale != 1.0:
            cond = {
                k: base_cond[k] + (cond[k] - base_cond[k]) * response_scale
                for k in cond
            }
        n = int(dur_min * 60 * fs)
        t = np.arange(n) / fs
        hr_hz = max(cond["hr"] + hr_off + rng.uniform(-2, 2) * noise, 35.0) / 60.0
        ecg = _ecg_like(t, hr_hz, rng)
        if noise != 1.0:
            ecg += 0.02 * (noise - 1.0) * rng.standard_normal(n)
        scr_events = rng.poisson(max(cond["eda"] - 1.0, 0.2) * dur_min)
        eda = np.full(n, cond["eda"] * eda_off) + 0.1 * np.sin(2 * np.pi * 0.01 * t)
        for _ in range(scr_events):
            onset = rng.integers(0, max(n - fs, 1))
            tau = rng.uniform(1.0, 4.0) * fs
            rise = np.clip(np.arange(n) - onset, 0, None)
            eda += 0.4 * (rise / tau) * np.exp(1 - rise / tau)
        eda += 0.01 * noise * rng.standard_normal(n)
        resp_rate = cond["resp"] + 0.3 * hr_off
        resp = (np.sin(2 * np.pi * resp_rate / 60.0 * t)
                + 0.05 * noise * rng.standard_normal(n))
        emg = cond["emg"] * rng.standard_normal(n)
        temp = 34.0 + 0.2 * np.sin(2 * np.pi * 0.001 * t) + 0.01 * rng.standard_normal(n)
        acc = 0.1 * rng.standard_normal((n, 3)) + np.array([0.0, 0.0, 1.0])

        segments["ACC"].append(acc)
        segments["ECG"].append(ecg[:, None])
        segments["EDA"].append(eda[:, None])
        segments["EMG"].append(emg[:, None])
        segments["Resp"].append(resp[:, None])
        segments["Temp"].append(temp[:, None])

        # Wrist channels: BVP mirrors the cardiac rhythm, wrist EDA the tonic
        # level, each at the E4's native rate.
        tb = np.arange(int(dur_min * 60 * wrist_fs["BVP"])) / wrist_fs["BVP"]
        bvp = np.sin(2 * np.pi * hr_hz * tb) + 0.1 * rng.standard_normal(tb.shape)
        n_eda = int(dur_min * 60 * wrist_fs["EDA"])
        w_eda = (np.full(n_eda, cond["eda"] * eda_off * 0.8)
                 + 0.05 * noise * rng.standard_normal(n_eda))
        n_tmp = int(dur_min * 60 * wrist_fs["TEMP"])
        w_tmp = 33.0 + 0.02 * rng.standard_normal(n_tmp)
        n_acc = int(dur_min * 60 * wrist_fs["ACC"])
        w_acc = 0.1 * rng.standard_normal((n_acc, 3)) + np.array([0.0, 1.0, 0.0])
        wrist_segments["BVP"].append(bvp[:, None])
        wrist_segments["EDA"].append(w_eda[:, None])
        wrist_segments["TEMP"].append(w_tmp[:, None])
        wrist_segments["ACC"].append(w_acc)
        order.append(task)
        starts.append(cursor_min)
        ends.append(cursor_min + dur_min)
        cursor_min += dur_min

    chest = {
        k.encode(): np.concatenate(v, axis=0).astype(np.float64)
        for k, v in segments.items()
    }
    wrist = {
        k.encode(): np.concatenate(v, axis=0).astype(np.float64)
        for k, v in wrist_segments.items()
    }
    data = {
        b"signal": {b"chest": chest, b"wrist": wrist},
        b"subject": subject_id.encode(),
    }
    fmt = lambda xs: ";".join(str(v) for v in xs)
    quest_csv = (
        f"# ORDER;{fmt(order)}\n"
        f"# START;{fmt(starts)}\n"
        f"# END;{fmt(ends)}\n"
    )
    return data, quest_csv


def write_synthetic_wesad(
    root: Path | str,
    subjects: list[str],
    tasks=DEFAULT_TASKS,
    fs: int = 700,
    seed: int = 0,
    subject_variability: float = 1.0,
    noise: float = 1.0,
) -> Path:
    """Write a synthetic WESAD tree: root/S*/S*.pkl + root/S*/S*_quest.csv."""
    root = Path(root)
    for i, sid in enumerate(subjects):
        data, quest = synthesize_subject(
            sid, tasks=tasks, fs=fs, seed=seed + i,
            subject_variability=subject_variability, noise=noise,
        )
        subj_dir = root / sid
        subj_dir.mkdir(parents=True, exist_ok=True)
        with open(subj_dir / f"{sid}.pkl", "wb") as f:
            pickle.dump(data, f)
        (subj_dir / f"{sid}_quest.csv").write_text(quest)
    return root
