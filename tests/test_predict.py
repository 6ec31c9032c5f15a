"""Inference path: train one fold, reload its checkpoint through Predictor,
classify a raw held-out recording end-to-end (the serving surface the
reference lacks)."""

import json

import numpy as np
import pytest

from multimodalsignal_tpu.config import (
    EarlyStoppingConfig,
    ExperimentConfig,
    ModelConfig,
    TrainerConfig,
)
from multimodalsignal_tpu.experiments.loso import run_simple_experiment
from multimodalsignal_tpu.experiments.predict import Predictor, main as predict_main

from tests.test_preprocess import preprocessed  # noqa: F401  (fixture reuse)
from tests.conftest import SUBJECTS_SMALL


@pytest.fixture(scope="module")
def trained_run(preprocessed, tmp_path_factory):  # noqa: F811
    run_dir = tmp_path_factory.mktemp("predict_run")
    cfg = ExperimentConfig(
        data_path=str(preprocessed / "chest_raw"),
        subjects=tuple(SUBJECTS_SMALL[:3]),
        channels_to_use=("chest_ECG", "chest_EDA", "chest_Resp"),
        model=ModelConfig(cnn_out_channels=8, gru_hidden_size=8, gru_num_layers=1),
        trainer=TrainerConfig(epochs=3, batch_size=16, learning_rate=3e-3,
                              early_stopping=EarlyStoppingConfig(patience=5)),
    )
    run_simple_experiment(cfg, run_dir)
    return run_dir


@pytest.mark.slow
def test_predict_recording(trained_run, wesad_root):
    predictor = Predictor.from_run(trained_run, fold="S2")
    result = predictor.predict_recording(wesad_root / "S5" / "S5.pkl")
    assert len(result.labels) > 0
    assert result.probs.shape == (len(result.labels), 2)
    np.testing.assert_allclose(result.probs.sum(axis=1), 1.0, rtol=1e-5)
    assert result.class_names == ("non_stress", "stress")
    # Window starts advance by the stride.
    assert result.starts_sec[1] - result.starts_sec[0] == pytest.approx(10.0)
    payload = json.loads(result.to_json())
    assert payload["windows"][0]["label"] in payload["class_names"]


@pytest.mark.slow
def test_predict_cli(trained_run, wesad_root, tmp_path):
    out = tmp_path / "preds.json"
    predict_main([
        "--checkpoint", str(trained_run / "fold_test_on_S2" / "best_model.msgpack"),
        "--config", str(trained_run / "config.json"),
        "--pkl", str(wesad_root / "S4" / "S4.pkl"),
        "--out", str(out),
    ])
    payload = json.loads(out.read_text())
    assert len(payload["windows"]) > 0


def test_predict_wrist_channels(wesad_root):
    """A wrist-channel checkpoint (data preprocessed with --include-wrist)
    must serve: the Predictor assembles the wrist block on the chest grid
    exactly like preprocessing (multi-rate resample, zero-fill fallback)."""
    import jax
    import jax.numpy as jnp

    from multimodalsignal_tpu.models import build_model
    from multimodalsignal_tpu.train.optim import make_optimizer
    from multimodalsignal_tpu.train.trainer import init_train_state

    cfg = ExperimentConfig(
        channels_to_use=("chest_ECG", "wrist_BVP", "wrist_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4,
                          gru_num_layers=1),
    )
    model = build_model(cfg.model, cfg.num_classes)
    tx = make_optimizer(1e-3, 0.0)
    sample = jnp.zeros((1, 3, 128 * 60), jnp.float32)
    state = init_train_state(model, jax.random.PRNGKey(0), sample, tx)
    predictor = Predictor(cfg, state)
    x, starts = predictor.windows_from_recording(wesad_root / "S2" / "S2.pkl")
    assert x.shape[1] == 3 and x.shape[2] == 128 * 60
    assert np.isfinite(x).all()
    probs = predictor.predict_windows(x[:4])
    assert probs.shape == (4, 2)
