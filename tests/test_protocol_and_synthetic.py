"""Quest-CSV parsing (incl. S2/S6 Base halving) and synthetic fixture layout."""

import numpy as np
import pytest

from multimodalsignal_tpu.data.protocol import parse_quest_csv
from multimodalsignal_tpu.data.synthetic import write_synthetic_wesad
from multimodalsignal_tpu.data.wesad_io import chest_signals, load_subject_pkl


def test_parse_quest_rows(wesad_root):
    rows = parse_quest_csv("S3", wesad_root)
    assert [r.task for r in rows] == ["Base", "TSST", "Medi 1", "Fun", "Medi 2"]
    assert rows[0].start_min == 0.0 and rows[0].end_min == 3.0


def test_s2_base_start_halved(wesad_root):
    """Reference preprocess.py:53-57 moves Base start to the midpoint for S2/S6."""
    rows = parse_quest_csv("S2", wesad_root)
    base = next(r for r in rows if r.task == "Base")
    assert base.start_min == (0.0 + 3.0) / 2
    s3_base = next(r for r in parse_quest_csv("S3", wesad_root) if r.task == "Base")
    assert s3_base.start_min == 0.0


def test_pkl_layout(wesad_root):
    data = load_subject_pkl("S2", wesad_root)
    chest = chest_signals(data)
    assert set(chest) == {"ACC", "ECG", "EDA", "EMG", "Resp", "Temp"}
    assert chest["ACC"].ndim == 2 and chest["ACC"].shape[1] == 3
    assert chest["ECG"].shape[1] == 1
    n = chest["ECG"].shape[0]
    assert all(v.shape[0] == n for v in chest.values())
    assert n == int(10.0 * 60 * 700)  # 10 task-minutes at 700 Hz (TASKS_SMALL)


def test_missing_subject_returns_none(wesad_root):
    assert load_subject_pkl("S99", wesad_root) is None


def test_signals_are_condition_separable(wesad_root):
    """TSST segments should have visibly higher EDA than Base so models can learn."""
    data = load_subject_pkl("S4", wesad_root)
    chest = chest_signals(data)
    fs = 700
    base = chest["EDA"][: 3 * 60 * fs].mean()
    tsst = chest["EDA"][3 * 60 * fs : 5 * 60 * fs].mean()
    assert tsst > base


# --- calibrated-hard generator (benchmarks/BENCHMARK.md corpus) -----------

HARD_TASKS = (("Base", 1.0), ("TSST", 0.5), ("Fun", 0.5))


def test_hard_generator_layout_and_determinism():
    from multimodalsignal_tpu.data.synthetic import synthesize_subject_hard

    d1, q1 = synthesize_subject_hard("S2", tasks=HARD_TASKS, seed=5)
    d2, q2 = synthesize_subject_hard("S2", tasks=HARD_TASKS, seed=5)
    n = int(2.0 * 60 * 700)
    chest = d1[b"signal"][b"chest"]
    assert chest[b"ACC"].shape == (n, 3)
    for key in (b"ECG", b"EDA", b"EMG", b"Resp", b"Temp"):
        assert chest[key].shape == (n, 1)
    # EDA must stay log1p-safe even through artifacts/dropout.
    assert (chest[b"EDA"] > 0).all()
    wrist = d1[b"signal"][b"wrist"]
    assert wrist[b"BVP"].shape == (2 * 60 * 64, 1)
    assert wrist[b"EDA"].shape == (2 * 60 * 4, 1)
    assert wrist[b"ACC"].shape == (2 * 60 * 32, 3)
    assert (wrist[b"EDA"] > 0).all()
    # Deterministic per (subject, seed).
    np.testing.assert_array_equal(chest[b"ECG"], d2[b"signal"][b"chest"][b"ECG"])
    assert q1 == q2
    assert q1.startswith("# ORDER;Base;TSST;Fun\n")
    # Different seeds give different subjects (responder profiles et al).
    d3, _ = synthesize_subject_hard("S2", tasks=HARD_TASKS, seed=6)
    assert not np.array_equal(chest[b"ECG"], d3[b"signal"][b"chest"][b"ECG"])


def test_laughter_knob_isolated_to_fun_emg_resp():
    """fun_laughter_rate_per_min adds PHASIC amusement signal during Fun
    only, touching only EMG and Resp; every other stream must stay
    bit-identical (child-RNG guarantee, synthetic.py), so existing benchmark
    calibrations survive the knob."""
    from multimodalsignal_tpu.data.synthetic import (
        Hardness, synthesize_subject_hard,
    )

    base = Hardness(artifact_rate_per_min=0.0, channel_dropout_prob=0.0)
    loud = Hardness(artifact_rate_per_min=0.0, channel_dropout_prob=0.0,
                    fun_laughter_rate_per_min=8.0, fun_laughter_strength=1.5)
    d0, _ = synthesize_subject_hard("S2", tasks=HARD_TASKS, seed=5,
                                    hardness=base)
    d1, _ = synthesize_subject_hard("S2", tasks=HARD_TASKS, seed=5,
                                    hardness=loud)
    c0, c1 = d0[b"signal"][b"chest"], d1[b"signal"][b"chest"]
    for key in (b"ECG", b"EDA", b"Temp", b"ACC"):
        np.testing.assert_array_equal(c0[key], c1[key])
    for key in (b"BVP", b"EDA", b"ACC"):
        np.testing.assert_array_equal(
            d0[b"signal"][b"wrist"][key], d1[b"signal"][b"wrist"][key])

    # Fun is the last 0.5 min (HARD_TASKS); Base/TSST spans are untouched.
    fs = 700
    fun_start = int(1.5 * 60 * fs)
    np.testing.assert_array_equal(c0[b"EMG"][:fun_start], c1[b"EMG"][:fun_start])
    np.testing.assert_array_equal(c0[b"Resp"][:fun_start], c1[b"Resp"][:fun_start])
    # And the Fun span carries extra phasic energy in both channels.
    emg0, emg1 = c0[b"EMG"][fun_start:], c1[b"EMG"][fun_start:]
    resp0, resp1 = c0[b"Resp"][fun_start:], c1[b"Resp"][fun_start:]
    assert emg1.std() > 1.2 * emg0.std()
    assert np.abs(resp1 - resp0).max() > 0.2
    # Phasic, not tonic: the Fun-segment mean barely moves.
    assert abs(float(resp1.mean() - resp0.mean())) < 0.05


def test_hard_corpus_preprocessable(tmp_path):
    """End-to-end loadability: hard pickles flow through the real
    preprocessing (wrist included) and yield both stress and non-stress
    windows."""
    from multimodalsignal_tpu.config import PreprocessConfig
    from multimodalsignal_tpu.data.preprocess import preprocess_subject
    from multimodalsignal_tpu.data.synthetic import Hardness

    root = write_synthetic_wesad(
        tmp_path / "WESAD", ["S2"], tasks=(("Base", 2.0), ("TSST", 1.5)),
        seed=11, hardness=Hardness(),
    )
    cfg = PreprocessConfig(wesad_root=str(root), targets=("raw",),
                           include_wrist=True, subjects=("S2",))
    X, y = preprocess_subject("S2", cfg)["raw"]
    assert X.shape[1] == 60 * 128 and X.shape[2] == 14  # 8 chest + 6 wrist
    assert set(np.unique(y)) == {1, 2}
    assert np.isfinite(X).all()


@pytest.mark.slow
def test_hard_corpus_fusion_beats_single_channels(tmp_path):
    """Regression guard for the benchmark corpus's headline structure
    (reference README.md:13: multimodal fusion > single-modality): on the
    calibrated-hard corpus, a LOSO gradient-boosting probe over per-channel
    window statistics must score higher with the fusion6 channel set than
    with any single channel. Uses the same probe as
    benchmarks/probe_difficulty.py (the TPU ablation grid in
    benchmarks/BENCHMARK.md is the full-model version of this assertion);
    one corpus build serves all channel sets because the stat columns are
    per-channel."""
    from sklearn.ensemble import HistGradientBoostingClassifier

    from multimodalsignal_tpu.config import (
        ALL_CHANNEL_NAMES,
        PreprocessConfig,
        WRIST_CHANNEL_NAMES,
    )
    from multimodalsignal_tpu.data.dataset import map_labels, normalize_subject
    from multimodalsignal_tpu.data.preprocess import preprocess_subject
    from multimodalsignal_tpu.data.synthetic import (
        BENCHMARK_TASKS,
        Hardness,
        write_synthetic_wesad,
    )

    fusion6 = ["chest_ECG", "chest_EDA", "chest_EMG", "chest_Resp",
               "wrist_BVP", "wrist_EDA"]
    all_names = list(ALL_CHANNEL_NAMES) + list(WRIST_CHANNEL_NAMES)
    ch_idx = [all_names.index(c) for c in fusion6]
    subjects = [f"S{i}" for i in range(2, 12)]  # 10 subjects
    tasks = tuple((t, d * 0.35) for t, d in BENCHMARK_TASKS)

    def window_stats(x):  # [N, T, C] -> [N, C*6], feature-major blocks
        return np.concatenate([
            x.mean(axis=1), x.std(axis=1),
            np.percentile(x, 10, axis=1), np.percentile(x, 90, axis=1),
            np.abs(np.diff(x, axis=1)).mean(axis=1),
            np.percentile(x, 50, axis=1),
        ], axis=1)

    per_subject = {}
    root = tmp_path / "WESAD"
    for i, sid in enumerate(subjects):
        write_synthetic_wesad(root, [sid], tasks=tasks, seed=3 + i,
                              hardness=Hardness())
        cfg = PreprocessConfig(wesad_root=str(root), targets=("raw",),
                               include_wrist=True, subjects=(sid,))
        X, y_raw = preprocess_subject(sid, cfg)["raw"]
        Xn = normalize_subject(X[:, :, ch_idx], y_raw, fusion6, scheme="all")
        y, keep = map_labels(y_raw, "stress_binary")
        per_subject[sid] = (window_stats(Xn[keep]), y[keep])

    n_ch = len(fusion6)

    def probe(cols):
        accs = []
        for test_sid in subjects:
            xtr = np.concatenate([per_subject[s][0] for s in subjects
                                  if s != test_sid])[:, cols]
            ytr = np.concatenate([per_subject[s][1] for s in subjects
                                  if s != test_sid])
            xte, yte = per_subject[test_sid]
            clf = HistGradientBoostingClassifier(max_iter=100, random_state=0)
            clf.fit(xtr, ytr)
            accs.append(float((clf.predict(xte[:, cols]) == yte).mean()))
        return float(np.mean(accs))

    fusion_acc = probe(list(range(6 * n_ch)))
    singles = {}
    for c, name in enumerate(fusion6):
        cols = [f * n_ch + c for f in range(6)]
        singles[name] = probe(cols)
    best_single = max(singles.values())
    assert fusion_acc > best_single + 0.01, (
        f"fusion6 probe acc {fusion_acc:.4f} does not beat best single "
        f"channel {best_single:.4f} ({singles})"
    )
