"""Real-WESAD file-quirk hardening (VERDICT r3 item #7).

The real dataset is a manual download (reference README.md:27-31) and is not
available in CI, so the loaders are exercised against DELIBERATELY MANGLED
synthetic pickles/CSVs reproducing the quirks real files are known for:

  * quest CSVs padded with trailing ';' separators and/or literal NaN cells
    (the reference parses them with pandas + .dropna(),
    reference preprocess.py:47-49);
  * protocol rows whose task is not in the label map (sRead/fRead/bRead
    questionnaire rows) — must be skipped, not crash;
  * duplicated protocol conditions (double-labeled rows) — both spans get
    windowed;
  * per-channel dtype variants (float32 / int16 instead of float64);
  * missing wrist device under --include-wrist (zero-filled, warned).

The pipeline contract under every quirk: same windows/labels as the clean
run (where values are unchanged), the usual float32 storage dtype (the
resample itself stays float64), no NaN/Inf.
"""

import pickle

import numpy as np
import pytest

from multimodalsignal_tpu.config import PreprocessConfig
from multimodalsignal_tpu.data.preprocess import preprocess_subject
from multimodalsignal_tpu.data.protocol import parse_quest_csv
from multimodalsignal_tpu.data.synthetic import write_synthetic_wesad

TASKS = (("Base", 2.0), ("TSST", 1.5), ("Fun", 1.5))


@pytest.fixture()
def quirk_root(tmp_path):
    root = tmp_path / "WESAD"
    write_synthetic_wesad(root, ["S9"], tasks=TASKS, seed=5)
    return root


def _cfg(root, **kw):
    return PreprocessConfig(wesad_root=str(root), output_path=str(root),
                            subjects=("S9",), targets=("raw",), **kw)


def _baseline(root):
    out = preprocess_subject("S9", _cfg(root))
    assert out is not None
    return out["raw"]


def test_quest_trailing_separators_and_nan_cells(quirk_root):
    """Rows padded with ';;;' and literal 'NaN' cells parse identically."""
    want = parse_quest_csv("S9", quirk_root)
    x_want, y_want = _baseline(quirk_root)

    quest = quirk_root / "S9" / "S9_quest.csv"
    lines = quest.read_text().splitlines()
    mangled = []
    for line in lines:
        if line.startswith("# ORDER"):
            mangled.append(line + ";;;")
        elif line.startswith("# START"):
            mangled.append(line + ";NaN;nan")
        elif line.startswith("# END"):
            mangled.append(line + ";NAN;;")
        else:
            mangled.append(line)
    quest.write_text("\n".join(mangled) + "\n")

    got = parse_quest_csv("S9", quirk_root)
    assert got == want
    x_got, y_got = preprocess_subject("S9", _cfg(quirk_root))["raw"]
    np.testing.assert_array_equal(x_got, x_want)
    np.testing.assert_array_equal(y_got, y_want)


def test_quest_unknown_questionnaire_rows_skipped(quirk_root):
    """Extra non-protocol rows (sRead/fRead) must window to nothing —
    exactly the reference's task_to_label.get() skip (preprocess.py:162)."""
    x_want, y_want = _baseline(quirk_root)
    quest = quirk_root / "S9" / "S9_quest.csv"
    lines = quest.read_text().splitlines()
    out = []
    for line in lines:
        if line.startswith("# ORDER"):
            out.append(line + ";sRead;fRead")
        elif line.startswith("# START"):
            out.append(line + ";5.0;5.5")
        elif line.startswith("# END"):
            out.append(line + ";5.4;5.9")
        else:
            out.append(line)
    quest.write_text("\n".join(out) + "\n")

    rows = parse_quest_csv("S9", quirk_root)
    assert [r.task for r in rows][-2:] == ["sRead", "fRead"]
    x_got, y_got = preprocess_subject("S9", _cfg(quirk_root))["raw"]
    np.testing.assert_array_equal(x_got, x_want)
    np.testing.assert_array_equal(y_got, y_want)


def test_quest_double_labeled_rows_window_both_spans(quirk_root):
    """A condition appearing twice (split protocol) yields windows from BOTH
    spans, in protocol order."""
    x_want, y_want = _baseline(quirk_root)
    quest = quirk_root / "S9" / "S9_quest.csv"
    lines = quest.read_text().splitlines()
    out = []
    for line in lines:
        if line.startswith("# ORDER"):
            out.append(line + ";TSST")
        elif line.startswith("# START"):
            out.append(line + ";3.5")
        elif line.startswith("# END"):
            out.append(line + ";5.0")
        else:
            out.append(line)
    quest.write_text("\n".join(out) + "\n")

    x_got, y_got = preprocess_subject("S9", _cfg(quirk_root))["raw"]
    assert len(y_got) > len(y_want)
    # The original windows come first, unchanged.
    np.testing.assert_array_equal(x_got[: len(y_want)], x_want)
    np.testing.assert_array_equal(y_got[: len(y_want)], y_want)
    # The extra span is all-TSST (label 2).
    assert (y_got[len(y_want):] == 2).all()


def test_pickle_channel_dtype_variants(quirk_root):
    """float32 / int16 channel payloads must load and window: outputs stay
    float64, labels identical, values within cast round-off of the clean
    run."""
    x_want, y_want = _baseline(quirk_root)

    pkl_path = quirk_root / "S9" / "S9.pkl"
    with open(pkl_path, "rb") as f:
        data = pickle.load(f, encoding="bytes")
    chest = data[b"signal"][b"chest"]
    chest[b"ECG"] = np.asarray(chest[b"ECG"], np.float64).astype(np.float32)
    chest[b"EMG"] = np.asarray(chest[b"EMG"], np.float64).astype(np.float32)
    # int16 in raw ADC-count style (scaled so the cast keeps information).
    chest[b"ACC"] = (np.asarray(chest[b"ACC"], np.float64) * 1000.0).astype(
        np.int16)
    with open(pkl_path, "wb") as f:
        pickle.dump(data, f)

    x_got, y_got = preprocess_subject("S9", _cfg(quirk_root))["raw"]
    assert x_got.dtype == x_want.dtype  # storage dtype (float32) unchanged
    np.testing.assert_array_equal(y_got, y_want)
    assert np.isfinite(x_got).all()
    # float32-cast channels agree to cast precision; ACC is rescaled by 1000
    # so only shape/finiteness is contractual there.
    names = ["chest_ACC_x", "chest_ACC_y", "chest_ACC_z", "chest_ECG",
             "chest_EDA", "chest_EMG", "chest_Resp", "chest_Temp"]
    for ci, name in enumerate(names):
        if name in ("chest_ECG", "chest_EMG"):
            np.testing.assert_allclose(
                x_got[:, :, ci], x_want[:, :, ci], atol=1e-5,
                err_msg=f"{name} diverged beyond float32 cast error")
        elif name in ("chest_EDA", "chest_Resp", "chest_Temp"):
            np.testing.assert_array_equal(x_got[:, :, ci], x_want[:, :, ci])


def test_missing_wrist_device_zero_fills(quirk_root, capsys):
    """include_wrist over a chest-only pickle: wrist block zero-filled with
    a warning, chest block identical to the clean run."""
    x_want, y_want = _baseline(quirk_root)

    pkl_path = quirk_root / "S9" / "S9.pkl"
    with open(pkl_path, "rb") as f:
        data = pickle.load(f, encoding="bytes")
    del data[b"signal"][b"wrist"]
    with open(pkl_path, "wb") as f:
        pickle.dump(data, f)

    out = preprocess_subject("S9", _cfg(quirk_root, include_wrist=True))
    assert "no wrist data" in capsys.readouterr().out
    x_got, y_got = out["raw"]
    assert x_got.shape[2] == x_want.shape[2] + 6  # 8 chest + 6 wrist
    np.testing.assert_array_equal(x_got[:, :, :8], x_want)
    np.testing.assert_array_equal(y_got, y_want)
    assert (x_got[:, :, 8:] == 0).all()
