"""Model export: checkpoint -> StableHLO artifact -> parity with the live
Predictor, symbolic batch, and the CLI round trip (the deployment story the
reference lacks — its torch state_dicts need the model source to load)."""

import json
import zipfile

import jax
import numpy as np
import pytest

from multimodalsignal_tpu.config import ExperimentConfig, ModelConfig
from multimodalsignal_tpu.experiments.export import (
    ExportedPredictor,
    export_predictor,
    main as export_main,
)
from multimodalsignal_tpu.experiments.predict import Predictor
from multimodalsignal_tpu.models import build_model
from multimodalsignal_tpu.train.optim import make_optimizer
from multimodalsignal_tpu.train.trainer import init_train_state

C, T = 2, 7680


@pytest.fixture(scope="module")
def predictor():
    cfg = ExperimentConfig(
        channels_to_use=("chest_ECG", "chest_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4,
                          gru_num_layers=1),
    )
    model = build_model(cfg.model, cfg.num_classes)
    tx = make_optimizer(1e-3, 0.0)
    sample = np.zeros((1, C, T), np.float32)
    state = init_train_state(model, jax.random.PRNGKey(7), sample, tx)
    return Predictor(cfg, state)


@pytest.fixture(scope="module")
def artifact(predictor, tmp_path_factory):
    out = tmp_path_factory.mktemp("export") / "model.mms"
    # CPU-only in tests: the tpu lowering path needs the libtpu compiler.
    meta = export_predictor(predictor, out, platforms=("cpu",))
    return out, meta


def test_artifact_contents(artifact):
    out, meta = artifact
    with zipfile.ZipFile(out) as zf:
        assert set(zf.namelist()) == {"model.stablehlo", "meta.json"}
        stored = json.loads(zf.read("meta.json"))
    assert stored == meta
    assert meta["window_shape"] == [C, T]
    assert meta["class_names"] == ["non_stress", "stress"]
    assert meta["platforms"] == ["cpu"]


def test_roundtrip_parity_with_live_predictor(artifact, predictor):
    out, _ = artifact
    ep = ExportedPredictor.load(out)
    x = np.random.default_rng(0).standard_normal((5, C, T)).astype(np.float32)
    got = ep.predict_windows(x)
    want = predictor.predict_windows(x)
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-5)


def test_symbolic_batch_any_size(artifact):
    out, _ = artifact
    ep = ExportedPredictor.load(out)
    rng = np.random.default_rng(1)
    for n in (1, 3, 17):
        probs = ep.predict_windows(
            rng.standard_normal((n, C, T)).astype(np.float32))
        assert probs.shape == (n, 2)


def test_input_validation(artifact):
    out, _ = artifact
    ep = ExportedPredictor.load(out)
    with pytest.raises(ValueError, match="expected windows"):
        ep.predict_windows(np.zeros((1, C + 1, T), np.float32))


def test_version_gate(artifact, tmp_path):
    out, _ = artifact
    with zipfile.ZipFile(out) as zf:
        blob = zf.read("model.stablehlo")
        meta = json.loads(zf.read("meta.json"))
    meta["artifact_version"] = 999
    bad = tmp_path / "bad.mms"
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr("model.stablehlo", blob)
        zf.writestr("meta.json", json.dumps(meta))
    with pytest.raises(ValueError, match="artifact version"):
        ExportedPredictor.load(bad)


def test_export_cli(predictor, tmp_path, monkeypatch):
    """CLI round trip against a real checkpoint+config written by the
    checkpointing layer (Predictor.from_files contract)."""
    from multimodalsignal_tpu.config import save_config
    from multimodalsignal_tpu.train.checkpoints import save_state

    ckpt = tmp_path / "best_model.msgpack"
    cfg_path = tmp_path / "config.json"
    save_state(ckpt, predictor.state)
    save_config(predictor.cfg, cfg_path)
    out = tmp_path / "model.mms"
    export_main(["--checkpoint", str(ckpt), "--config", str(cfg_path),
                 "--out", str(out), "--platforms", "cpu"])
    ep = ExportedPredictor.load(out)
    x = np.random.default_rng(2).standard_normal((2, C, T)).astype(np.float32)
    np.testing.assert_allclose(
        ep.predict_windows(x), predictor.predict_windows(x), atol=1e-5)
