"""Quest-CSV parsing (incl. S2/S6 Base halving) and synthetic fixture layout."""

import numpy as np

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
