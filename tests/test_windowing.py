"""Windowing math vs the reference's python-loop semantics
(preprocess.py:160-200)."""

import numpy as np

from multimodalsignal_tpu.config import TASK_TO_LABEL_MAP
from multimodalsignal_tpu.data.protocol import ProtocolRow
from multimodalsignal_tpu.data.windowing import (
    segment_protocol,
    sliding_windows,
    window_starts,
)


def _reference_starts(start, end, window, stride):
    return list(range(start, end - window + 1, stride))


def test_window_starts_matches_reference_range():
    for start, end in [(0, 1000), (128, 5000), (0, 59), (10, 10)]:
        got = window_starts(start, end, 60, 10).tolist()
        assert got == _reference_starts(start, end, 60, 10)


def test_sliding_windows_gather(rng):
    sig = rng.standard_normal((500, 2))
    starts = window_starts(0, 500, 100, 50)
    wins = sliding_windows(sig, starts, 100)
    assert wins.shape == (9, 100, 2)
    for i, s in enumerate(starts):
        np.testing.assert_array_equal(wins[i], sig[s : s + 100])


def test_sliding_windows_empty():
    sig = np.zeros((30, 2))
    wins = sliding_windows(sig, window_starts(0, 30, 60, 10), 60)
    assert wins.shape == (0, 60, 2)


def test_segment_protocol_index_math():
    """Reference: start_idx_orig = int(min*60*700); start = int(orig*128/700)."""
    rows = [
        ProtocolRow("Base", 0.0, 3.0),
        ProtocolRow("TSST", 3.0, 5.0),
        ProtocolRow("sRead", 5.0, 5.5),  # unmapped task -> skipped
        ProtocolRow("Medi 1", 5.5, 7.0),
    ]
    starts, labels = segment_protocol(rows, TASK_TO_LABEL_MAP, 700, 128, 60, 10)
    # Base: [0, 180s) at 128 Hz -> starts 0..(180-60)s step 10 -> 13 windows
    base_expect = _reference_starts(0, int(int(3 * 60 * 700) * 128 / 700), 60 * 128, 10 * 128)
    tsst_expect = _reference_starts(
        int(int(3 * 60 * 700) * 128 / 700), int(int(5 * 60 * 700) * 128 / 700), 7680, 1280
    )
    medi_expect = _reference_starts(
        int(int(5.5 * 60 * 700) * 128 / 700), int(int(7 * 60 * 700) * 128 / 700), 7680, 1280
    )
    assert starts.tolist() == base_expect + tsst_expect + medi_expect
    assert labels.tolist() == [1] * len(base_expect) + [2] * len(tsst_expect) + [4] * len(medi_expect)


def test_task_name_stripping():
    rows = [ProtocolRow("Medi 2", 0.0, 2.0)]
    starts, labels = segment_protocol(rows, TASK_TO_LABEL_MAP, 700, 128, 60, 10)
    assert (labels == 4).all() and len(starts) == 7
