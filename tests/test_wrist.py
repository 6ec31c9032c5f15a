"""Wrist-device extension: multi-rate resampling onto the common grid,
channel-name contract, end-to-end training on a wrist channel (an extension
beyond the chest-only reference code — SURVEY.md §7 quirk e)."""

import numpy as np
import pytest

from multimodalsignal_tpu.config import (
    ALL_CHANNEL_NAMES,
    EarlyStoppingConfig,
    ExperimentConfig,
    ModelConfig,
    PreprocessConfig,
    TrainerConfig,
    WRIST_CHANNEL_NAMES,
)
from multimodalsignal_tpu.data.preprocess import run_preprocessing
from multimodalsignal_tpu.data.dataset import build_dataset, read_channel_names
from multimodalsignal_tpu.data.wesad_io import load_subject_pkl, wrist_signals

from tests.conftest import SUBJECTS_SMALL, TASKS_SMALL


@pytest.fixture(scope="module")
def wrist_preprocessed(wesad_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("wrist_data")
    cfg = PreprocessConfig(
        wesad_root=str(wesad_root), output_path=str(out),
        subjects=tuple(SUBJECTS_SMALL), targets=("raw",), include_wrist=True,
    )
    run_preprocessing(cfg)
    return out


def test_synthetic_has_wrist(wesad_root):
    data = load_subject_pkl("S2", wesad_root)
    wrist = wrist_signals(data)
    assert wrist is not None
    assert set(wrist) == {"ACC", "BVP", "EDA", "TEMP"}
    # Native rates: BVP twice ACC's length, EDA/TEMP at 4 Hz.
    assert wrist["BVP"].shape[0] == 2 * wrist["ACC"].shape[0]
    assert wrist["EDA"].shape[0] == wrist["TEMP"].shape[0]


def test_wrist_channel_contract(wrist_preprocessed):
    names = read_channel_names(wrist_preprocessed / "chest_raw")
    assert names == list(ALL_CHANNEL_NAMES) + list(WRIST_CHANNEL_NAMES)
    x = np.load(wrist_preprocessed / "chest_raw" / "S2_X.npy")
    assert x.shape[2] == 14  # 8 chest + 6 wrist
    assert np.isfinite(x).all()
    # Wrist BVP column varies (not a zero-fill)
    bvp = x[:, :, names.index("wrist_BVP")]
    assert bvp.std() > 0.1


@pytest.mark.slow
def test_train_on_wrist_channels(wrist_preprocessed, tmp_path):
    """6-channel early fusion incl. wrist (BASELINE.json config 2 style)."""
    from multimodalsignal_tpu.experiments.loso import run_simple_experiment

    names = read_channel_names(wrist_preprocessed / "chest_raw")
    cfg = ExperimentConfig(
        data_path=str(wrist_preprocessed / "chest_raw"),
        subjects=tuple(SUBJECTS_SMALL[:3]),
        channels_to_use=("chest_ECG", "chest_EDA", "chest_EMG", "chest_Resp",
                         "wrist_BVP", "wrist_EDA"),
        model=ModelConfig(cnn_out_channels=8, gru_hidden_size=8, gru_num_layers=1),
        trainer=TrainerConfig(epochs=2, batch_size=16,
                              early_stopping=EarlyStoppingConfig(patience=3)),
    )
    results, summary = run_simple_experiment(cfg, tmp_path, names)
    assert summary["num_folds"] == 3
    assert all(0.0 <= r.accuracy <= 1.0 for r in results)
