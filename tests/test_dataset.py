"""Dataset layer: label mapping, normalization schemes, packing — checked
against hand-written replicas of the reference's numpy math
(dataset.py:29-48, void/dataset.py:30-55)."""

import numpy as np
import pytest

from multimodalsignal_tpu.data.dataset import (
    build_dataset,
    map_labels,
    normalize_features,
    normalize_subject,
    pack_corpus,
    read_channel_names,
)

from tests.test_preprocess import preprocessed  # noqa: F401  (fixture reuse)
from tests.conftest import SUBJECTS_SMALL


def test_map_labels_stress_binary():
    y_raw = np.array([1, 2, 3, 4, 2, 1])
    y, keep = map_labels(y_raw, "stress_binary")
    assert y.tolist() == [0, 1, 0, 0, 1, 0]
    assert keep.all()


def test_map_labels_ternary():
    y_raw = np.array([1, 2, 3, 4])
    y, keep = map_labels(y_raw, "ternary")
    assert y.tolist() == [0, 2, 1, 0]  # Base=0, Fun=1, TSST=2, Medi=0
    assert keep.all()


def test_map_labels_amusement_binary():
    """The mode the reference's hierarchical path needs but never implemented
    (main.py:195 vs dataset.py:34)."""
    y_raw = np.array([1, 2, 3, 4, 3])
    y, keep = map_labels(y_raw, "amusement_binary")
    assert keep.tolist() == [True, False, True, False, True]
    assert y[keep].tolist() == [0, 1, 1]


def test_map_labels_unknown_mode_raises():
    with pytest.raises(ValueError, match="classification_mode"):
        map_labels(np.array([1]), "nope")


def _reference_normalize_all(x_selected, channel_names):
    """Direct replica of reference dataset.py:37-48."""
    x = x_selected.copy().astype(np.float64)
    mean_all = np.mean(x, axis=(0, 1))
    std_all = np.std(x, axis=(0, 1)) + 1e-8
    for ch, name in enumerate(channel_names):
        if name == "chest_EDA":
            log_data = np.log1p(x[:, :, ch])
            x[:, :, ch] = (log_data - np.mean(log_data)) / (np.std(log_data) + 1e-8)
        else:
            x[:, :, ch] = (x[:, :, ch] - mean_all[ch]) / std_all[ch]
    return x


def test_normalize_all_matches_reference_math(rng):
    x = np.abs(rng.standard_normal((10, 50, 3))) + 0.5  # positive for log1p
    y_raw = rng.integers(1, 5, 10)
    names = ["chest_ECG", "chest_EDA", "chest_Resp"]
    got = normalize_subject(x, y_raw, names, "all")
    expected = _reference_normalize_all(x, names)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_normalize_baseline_uses_base_windows_only(rng):
    x = rng.standard_normal((8, 20, 2)) + 5.0
    y_raw = np.array([1, 1, 1, 2, 2, 3, 3, 4])
    names = ["chest_ECG", "chest_Resp"]
    got = normalize_subject(x, y_raw, names, "baseline")
    base = x[y_raw == 1]
    for c in range(2):
        expected = (x[:, :, c] - base[:, :, c].mean()) / (base[:, :, c].std() + 1e-8)
        np.testing.assert_allclose(got[:, :, c], expected, rtol=1e-5, atol=1e-6)
    # Baseline windows should be ~zero-mean; stress windows need not be.
    assert abs(got[y_raw == 1].mean()) < 1e-5


def test_normalize_baseline_fallback_no_base(rng):
    x = rng.standard_normal((4, 20, 1))
    y_raw = np.array([2, 2, 3, 3])
    got = normalize_subject(x, y_raw, ["chest_ECG"], "baseline")
    expected = (x[:, :, 0] - x[:, :, 0].mean()) / (x[:, :, 0].std() + 1e-8)
    np.testing.assert_allclose(got[:, :, 0], expected, rtol=1e-5, atol=1e-6)


def test_normalize_features_eps_and_baseline(rng):
    x = rng.standard_normal((6, 4)) * 3
    y_raw = np.array([1, 1, 2, 2, 3, 4])
    got = normalize_features(x, y_raw, "baseline")
    base = x[:2]
    expected = (x - base.mean(axis=0)) / (base.std(axis=0) + 1e-3)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_build_dataset_shapes_and_layout(preprocessed):  # noqa: F811
    names = read_channel_names(preprocessed / "chest_raw")
    ds = build_dataset(
        preprocessed / "chest_raw",
        SUBJECTS_SMALL,
        ["chest_ECG", "chest_EDA", "chest_Resp"],
        names,
    )
    assert ds.x.ndim == 3 and ds.x.shape[1] == 3 and ds.x.shape[2] == 7680
    assert ds.x.dtype == np.float32
    assert len(ds.x) == len(ds.y)
    assert set(np.unique(ds.y)) <= {0, 1}
    # Per-subject z-score: overall distribution roughly standardized.
    assert abs(float(ds.x[:, 0].mean())) < 0.1
    assert 0.5 < float(ds.x[:, 0].std()) < 2.0


def test_build_dataset_missing_subject_skipped(preprocessed):  # noqa: F811
    names = read_channel_names(preprocessed / "chest_raw")
    ds = build_dataset(
        preprocessed / "chest_raw", ["S2", "S99"], ["chest_ECG"], names
    )
    assert ds.subjects == ("S2",)
    with pytest.raises(ValueError, match="No data loaded"):
        build_dataset(preprocessed / "chest_raw", ["S98", "S99"], ["chest_ECG"], names)


def test_multi_subject_build_is_concat_of_singles(preprocessed):  # noqa: F811
    """Per-subject normalization means a multi-subject dataset is exactly the
    concatenation of single-subject datasets in order — the invariant behind
    the serial orchestrator's per-subject staging cache (experiments/loso.py),
    which loads each subject once instead of ~15x across folds."""
    names = read_channel_names(preprocessed / "chest_raw")
    chans = ["chest_ECG", "chest_EDA"]
    multi = build_dataset(preprocessed / "chest_raw", ["S2", "S3", "S4"],
                          chans, names)
    singles = [build_dataset(preprocessed / "chest_raw", [s], chans, names)
               for s in ("S2", "S3", "S4")]
    np.testing.assert_array_equal(
        multi.x, np.concatenate([p.x for p in singles]))
    np.testing.assert_array_equal(
        multi.y, np.concatenate([p.y for p in singles]))
    assert multi.subjects == ("S2", "S3", "S4")


def test_pack_corpus_padding_and_flat(preprocessed):  # noqa: F811
    names = read_channel_names(preprocessed / "chest_raw")
    packed = pack_corpus(
        preprocessed / "chest_raw",
        SUBJECTS_SMALL,
        ["chest_ECG", "chest_EDA"],
        names,
    )
    s, wmax, c, t = packed.x.shape
    assert s == len(SUBJECTS_SMALL) and c == 2 and t == 7680
    assert packed.mask.sum(axis=1).max() == wmax  # at least one subject full
    # Padded rows are zero.
    assert packed.x[~packed.mask].sum() == 0
    xf, yf, mf = packed.flat()
    assert xf.shape == (s * wmax, c, t) and yf.shape == mf.shape == (s * wmax,)
    # Flat view agrees with per-subject build_dataset on the first subject.
    ds = build_dataset(
        preprocessed / "chest_raw", ["S2"], ["chest_ECG", "chest_EDA"], names
    )
    n = len(ds.y)
    np.testing.assert_allclose(packed.x[0, :n], ds.x, rtol=1e-6)
    np.testing.assert_array_equal(packed.y[0, :n], ds.y)


def test_pack_corpus_amusement_filters(preprocessed):  # noqa: F811
    names = read_channel_names(preprocessed / "chest_raw")
    packed = pack_corpus(
        preprocessed / "chest_raw", SUBJECTS_SMALL, ["chest_ECG"], names,
        classification_mode="amusement_binary",
    )
    # Only Base/Fun windows kept; labels binary.
    assert set(np.unique(packed.y[packed.mask])) <= {0, 1}
    full = pack_corpus(
        preprocessed / "chest_raw", SUBJECTS_SMALL, ["chest_ECG"], names
    )
    assert packed.mask.sum() < full.mask.sum()
