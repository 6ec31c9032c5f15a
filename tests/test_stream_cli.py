"""mms-stream CLI: replay a raw recording (native-rate or resampled feed)
or a stdin text feed through the streaming classifier, emitting JSONL
events. The CLI is plumbing over StreamingClassifier (whose batch-parity
and chunking-invariance guarantees are pinned in test_streaming.py); these
tests pin the plumbing: feed construction, channel ordering, event
serialization, and source validation."""

import io
import json

import jax
import numpy as np
import pytest

from multimodalsignal_tpu.config import (
    ExperimentConfig,
    ModelConfig,
    save_config,
)
from multimodalsignal_tpu.experiments.predict import Predictor
from multimodalsignal_tpu.experiments.streaming import (
    StreamingClassifier,
    _pkl_feed,
    main as stream_main,
)
from multimodalsignal_tpu.models import build_model
from multimodalsignal_tpu.train.checkpoints import save_state
from multimodalsignal_tpu.train.optim import make_optimizer
from multimodalsignal_tpu.train.trainer import init_train_state

CHANNELS = ("chest_ECG", "chest_EDA")


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """An (untrained) checkpoint + config pair — the CLI only needs valid
    artifacts, not a converged model."""
    d = tmp_path_factory.mktemp("stream_cli")
    cfg = ExperimentConfig(
        channels_to_use=CHANNELS,
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4,
                          gru_num_layers=1),
    )
    model = build_model(cfg.model, cfg.num_classes)
    tx = make_optimizer(1e-3, 0.0)
    state = init_train_state(model, jax.random.PRNGKey(0),
                             np.zeros((1, len(CHANNELS), 128 * 60),
                                      np.float32), tx)
    save_state(d / "best_model.msgpack", state)
    save_config(cfg, d / "config.json")
    return d


def _events(path) -> list[dict]:
    return [json.loads(line) for line in path.read_text().splitlines()]


def test_stream_cli_native_replay(ckpt_dir, wesad_root, tmp_path):
    """Default path: raw 700 Hz chest grid through the causal resampler."""
    out = tmp_path / "events.jsonl"
    stream_main([
        "--checkpoint", str(ckpt_dir / "best_model.msgpack"),
        "--config", str(ckpt_dir / "config.json"),
        "--pkl", str(wesad_root / "S2" / "S2.pkl"),
        "--calib-sec", "70", "--chunk-sec", "5",
        "--out", str(out),
    ])
    events = _events(out)
    assert len(events) > 3
    assert [e["index"] for e in events] == list(range(len(events)))
    assert all(e["t_end_sec"] - e["t_start_sec"] == pytest.approx(60.0)
               for e in events)
    assert events[1]["t_start_sec"] == pytest.approx(10.0)
    for e in events:
        assert e["label"] in ("non_stress", "stress")
        assert len(e["probs"]) == 2
        assert sum(e["probs"]) == pytest.approx(1.0, abs=1e-4)


def test_stream_cli_resampled_matches_library(ckpt_dir, wesad_root, tmp_path):
    """--feed resampled events must equal a StreamingClassifier fed the
    same batch-resampled grid directly (same frozen calibration stats)."""
    out = tmp_path / "events.jsonl"
    pkl = wesad_root / "S3" / "S3.pkl"
    stream_main([
        "--checkpoint", str(ckpt_dir / "best_model.msgpack"),
        "--config", str(ckpt_dir / "config.json"),
        "--pkl", str(pkl), "--feed", "resampled",
        "--calib-sec", "70", "--chunk-sec", "7",
        "--out", str(out),
    ])
    events = _events(out)

    predictor = Predictor.from_files(ckpt_dir / "best_model.msgpack",
                                     ckpt_dir / "config.json")
    sc = StreamingClassifier.for_predictor(predictor, calib_sec=70)
    feed, feed_fs = _pkl_feed(pkl, sc, "resampled", 700)
    assert feed_fs == sc.target_fs
    want = sc.push(feed) + sc.flush()

    assert len(events) == len(want) > 0
    np.testing.assert_allclose(
        np.array([e["probs"] for e in events]),
        np.stack([w.probs for w in want]), atol=1e-5)
    assert [e["label"] for e in events] == [w.label for w in want]


def test_stream_cli_stdin(ckpt_dir, tmp_path, monkeypatch):
    """stdin text feed: one sample per line in feed-channel order."""
    rng = np.random.default_rng(7)
    n = 85 * 128  # 85 s at the model rate -> calib 60 s + 3 windows
    ecg = rng.standard_normal(n)
    eda = 2.0 + 0.1 * rng.standard_normal(n)
    lines = "\n".join(f"{a:.5f},{b:.5f}" for a, b in zip(ecg, eda))
    monkeypatch.setattr("sys.stdin", io.StringIO(lines + "\n"))
    out = tmp_path / "events.jsonl"
    stream_main([
        "--checkpoint", str(ckpt_dir / "best_model.msgpack"),
        "--config", str(ckpt_dir / "config.json"),
        "--stdin", "--calib-sec", "60",
        "--out", str(out),
    ])
    events = _events(out)
    assert [e["index"] for e in events] == [0, 1, 2]


def test_stream_cli_artifact_backend(ckpt_dir, wesad_root, tmp_path):
    """--artifact streams an exported .mms through the same CLI and agrees
    with the checkpoint backend on the same replay (export parity 1e-5)."""
    from multimodalsignal_tpu.experiments.export import export_predictor

    predictor = Predictor.from_files(ckpt_dir / "best_model.msgpack",
                                     ckpt_dir / "config.json")
    mms = tmp_path / "model.mms"
    export_predictor(predictor, mms, platforms=("cpu",))

    pkl = str(wesad_root / "S4" / "S4.pkl")
    common = ["--pkl", pkl, "--calib-sec", "70", "--chunk-sec", "10"]
    out_a = tmp_path / "artifact.jsonl"
    stream_main(["--artifact", str(mms), "--out", str(out_a)] + common)
    out_c = tmp_path / "checkpoint.jsonl"
    stream_main(["--checkpoint", str(ckpt_dir / "best_model.msgpack"),
                 "--config", str(ckpt_dir / "config.json"),
                 "--out", str(out_c)] + common)
    ev_a, ev_c = _events(out_a), _events(out_c)
    assert len(ev_a) == len(ev_c) > 0
    np.testing.assert_allclose(np.array([e["probs"] for e in ev_a]),
                               np.array([e["probs"] for e in ev_c]),
                               atol=1e-4)


def test_stream_cli_hybrid_native_replay(tmp_path, wesad_root):
    """A hybrid checkpoint streams through the CLI: the native chest grid
    carries the feature sensors the model needs beyond its own channels,
    and per-window features are extracted live."""
    from multimodalsignal_tpu.data.features import (
        FEATURE_EXTRACTOR_VERSION,
        FEATURE_NAMES,
    )

    cfg = ExperimentConfig(
        channels_to_use=CHANNELS,
        model=ModelConfig(name="hybrid_cnn_gru", cnn_out_channels=4,
                          gru_hidden_size=4, gru_num_layers=1),
    )
    model = build_model(cfg.model, cfg.num_classes)
    sample = (np.zeros((1, len(CHANNELS), 128 * 60), np.float32),
              np.zeros((1, len(FEATURE_NAMES)), np.float32))
    state = init_train_state(model, jax.random.PRNGKey(5), sample,
                             make_optimizer(1e-3, 0.0))
    save_state(tmp_path / "best_model.msgpack", state)
    save_config(cfg, tmp_path / "config.json",
                extra={"preprocess_meta": {
                    "feature_extractor_version": FEATURE_EXTRACTOR_VERSION}})
    out = tmp_path / "events.jsonl"
    stream_main([
        "--checkpoint", str(tmp_path / "best_model.msgpack"),
        "--config", str(tmp_path / "config.json"),
        "--pkl", str(wesad_root / "S2" / "S2.pkl"),
        "--calib-sec", "70", "--chunk-sec", "20",
        "--out", str(out),
    ])
    events = _events(out)
    assert len(events) > 3
    assert [e["index"] for e in events] == list(range(len(events)))
    assert all(len(e["probs"]) == 2 for e in events)


def test_stream_cli_source_validation(ckpt_dir, wesad_root):
    with pytest.raises(SystemExit):
        stream_main([
            "--checkpoint", str(ckpt_dir / "best_model.msgpack"),
            "--config", str(ckpt_dir / "config.json"),
        ])  # no feed source
    with pytest.raises(SystemExit):
        stream_main([
            "--checkpoint", str(ckpt_dir / "best_model.msgpack"),
            "--config", str(ckpt_dir / "config.json"),
            "--pkl", str(wesad_root / "S2" / "S2.pkl"), "--stdin",
        ])  # both feed sources
