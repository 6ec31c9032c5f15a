"""Hybrid (raw + handcrafted feature) DEPLOYMENT tier: predict, export,
serving, and streaming for `hybrid_cnn_gru` checkpoints — the reference's
tuple-batch machinery (void/dataset.py:191-198, trainer.py:130-146) carried
through every inference surface, not just cross-validation.

Feature extraction is per-window and causal (each window reads only its own
60 s of signal, reference preprocess.py:77-123), so all four surfaces share
one contract: raw windows normalized with recording/calibration statistics,
features extracted from the UNNORMALIZED sensors, zero-filled on failure
(preprocess.py:211), and z-scored with the 1e-3 epsilon
(void/dataset.py:161-171)."""

import json
import threading
import urllib.request
from urllib.error import HTTPError

import jax
import numpy as np
import pytest

from multimodalsignal_tpu.config import (
    EarlyStoppingConfig,
    ExperimentConfig,
    ModelConfig,
    TrainerConfig,
)
from multimodalsignal_tpu.data.dataset import (
    apply_channel_norm,
    channel_norm_stats,
)
from multimodalsignal_tpu.data.features import (
    FEATURE_NAMES,
    FEATURE_SENSOR_CHANNELS,
    extract_features_batch,
)
from multimodalsignal_tpu.experiments.predict import (
    Predictor,
    recording_to_hybrid_windows,
    recording_to_windows,
)
from multimodalsignal_tpu.experiments.streaming import StreamingClassifier
from multimodalsignal_tpu.models import build_model
from multimodalsignal_tpu.train.optim import make_optimizer
from multimodalsignal_tpu.train.trainer import init_train_state

from tests.test_preprocess import preprocessed  # noqa: F401  (fixture reuse)
from tests.conftest import SUBJECTS_SMALL

FS, WIN_S, STRIDE_S = 128, 60, 10
CHANNELS = ("chest_ECG", "chest_EDA")
C, T = len(CHANNELS), WIN_S * FS
NF = len(FEATURE_NAMES)


@pytest.fixture(scope="module")
def hybrid_predictor():
    """Untrained hybrid predictor (init weights) — the deployment surfaces
    are weight-agnostic; training end-to-end is covered by the slow tier."""
    cfg = ExperimentConfig(
        channels_to_use=CHANNELS,
        model=ModelConfig(name="hybrid_cnn_gru", cnn_out_channels=4,
                          gru_hidden_size=4, gru_num_layers=1),
    )
    model = build_model(cfg.model, cfg.num_classes)
    tx = make_optimizer(1e-3, 0.0)
    sample = (np.zeros((1, C, T), np.float32), np.zeros((1, NF), np.float32))
    state = init_train_state(model, jax.random.PRNGKey(5), sample, tx)
    return Predictor(cfg, state)


# ---------------------------------------------------------------------------
# recording -> hybrid windows
# ---------------------------------------------------------------------------

def test_recording_to_hybrid_windows_contract(wesad_root):
    (x_raw, x_feat), starts = recording_to_hybrid_windows(
        wesad_root / "S2" / "S2.pkl", list(CHANNELS), "all")
    n = len(starts)
    assert x_raw.shape == (n, C, T)
    assert x_feat.shape == (n, NF)
    assert np.isfinite(x_raw).all() and np.isfinite(x_feat).all()
    # The raw stream is bit-identical to the raw-model pipeline (shared grid
    # + shared normalization).
    x_only, starts2 = recording_to_windows(
        wesad_root / "S2" / "S2.pkl", list(CHANNELS), "all")
    np.testing.assert_array_equal(starts, starts2)
    np.testing.assert_array_equal(x_raw, x_only)


def test_recording_to_hybrid_windows_feature_subset(wesad_root):
    sub = list(FEATURE_NAMES[:3])
    (x_raw, x_feat), _ = recording_to_hybrid_windows(
        wesad_root / "S2" / "S2.pkl", list(CHANNELS), "all",
        features_to_use=sub)
    assert x_feat.shape[1] == 3


def test_hybrid_predictor_windows_and_padding(hybrid_predictor, wesad_root):
    x, starts = hybrid_predictor.windows_from_recording(
        wesad_root / "S2" / "S2.pkl")
    assert isinstance(x, tuple) and len(x) == 2
    # batch_size that does NOT divide N exercises the pytree pad path.
    probs = hybrid_predictor.predict_windows(x, batch_size=7)
    assert probs.shape == (len(starts), 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    # Identical to one whole-batch pass (padding is inert).
    probs_big = hybrid_predictor.predict_windows(x, batch_size=256)
    np.testing.assert_allclose(probs, probs_big, atol=1e-6)


def test_hybrid_predict_recording(hybrid_predictor, wesad_root):
    result = hybrid_predictor.predict_recording(wesad_root / "S3" / "S3.pkl")
    assert len(result.labels) > 0
    assert result.probs.shape == (len(result.labels), 2)
    assert result.class_names == ("non_stress", "stress")


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def test_hybrid_export_roundtrip(hybrid_predictor, wesad_root, tmp_path):
    from multimodalsignal_tpu.experiments.export import (
        ExportedPredictor,
        export_predictor,
    )

    from multimodalsignal_tpu.data.features import FEATURE_EXTRACTOR_VERSION
    from multimodalsignal_tpu.experiments.export import (
        HYBRID_ARTIFACT_VERSION,
    )

    out = tmp_path / "hybrid.mms"
    meta = export_predictor(hybrid_predictor, out, platforms=("cpu",))
    assert meta["model"] == "hybrid_cnn_gru"
    assert meta["feature_names"] == list(FEATURE_NAMES)
    # A hybrid artifact's input contract is a (raw, feat) pytree, not the
    # version-1 single array: it must stamp the bumped version (a v1-only
    # loader then rejects it cleanly at load()) and carry the feature
    # extractor version (train/serve skew guard).
    assert meta["artifact_version"] == HYBRID_ARTIFACT_VERSION
    assert meta["feature_extractor_version"] == FEATURE_EXTRACTOR_VERSION

    ep = ExportedPredictor.load(out)
    assert ep.is_hybrid
    x, _ = ep.windows_from_recording(wesad_root / "S2" / "S2.pkl")
    assert isinstance(x, tuple)
    want = hybrid_predictor.predict_windows(x)
    got = ep.predict_windows(x)
    np.testing.assert_allclose(got, want, atol=1e-5)

    with pytest.raises(ValueError, match="hybrid artifact expects"):
        ep.predict_windows(x[0])
    with pytest.raises(ValueError, match="expected features"):
        ep.predict_windows((x[0], x[1][:, :3]))


# ---------------------------------------------------------------------------
# serving
# ---------------------------------------------------------------------------

def _post(port, path, payload):
    body = json.dumps(payload).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body,
        headers={"Content-Type": "application/json"})
    return json.load(urllib.request.urlopen(req))


def test_hybrid_serving(hybrid_predictor, wesad_root):
    from multimodalsignal_tpu.serving import PredictionService, make_server

    svc = PredictionService(hybrid_predictor, batch_size=8, micro_batch_ms=2.0)
    server = make_server(svc, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        card = json.load(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz"))
        assert card["model"] == "hybrid_cnn_gru"
        assert card["feature_names"] == list(FEATURE_NAMES)

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, C, T)).astype(np.float32)
        f = rng.standard_normal((2, NF)).astype(np.float32)
        r = _post(port, "/v1/predict",
                  {"windows": x.tolist(), "features": f.tolist()})
        assert r["num_windows"] == 2 and len(r["probs"]) == 2
        want = hybrid_predictor.predict_windows((x, f), 8)
        np.testing.assert_allclose(np.asarray(r["probs"]), want, atol=1e-5)

        # Missing / misshapen feature stream -> 400 before any device work.
        with pytest.raises(HTTPError) as err:
            _post(port, "/v1/predict", {"windows": x.tolist()})
        assert err.value.code == 400
        assert "features" in json.load(err.value)["error"]
        with pytest.raises(HTTPError) as err:
            _post(port, "/v1/predict",
                  {"windows": x.tolist(), "features": f[:, :4].tolist()})
        assert err.value.code == 400

        # Server-side pipeline: both streams computed from the pkl.
        r = _post(port, "/v1/predict_recording",
                  {"pkl_path": str(wesad_root / "S2" / "S2.pkl")})
        assert len(r["windows"]) > 0
        assert svc.windows_served > 2
    finally:
        server.shutdown()
        server.server_close()
        svc.close()


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------

def _hybrid_feed(total_sec=380, seed=0):
    """[n, 4] feed in hybrid feed_channels order (ECG, EDA, EMG, Resp):
    plausible-ish physiology so the feature extractors return real numbers."""
    rng = np.random.default_rng(seed)
    n = total_sec * FS
    t = np.arange(n) / FS
    ecg = np.sin(2 * np.pi * 1.1 * t) ** 63 + 0.05 * rng.standard_normal(n)
    eda = 2.0 + 0.5 * np.sin(t / 40) + 0.05 * rng.standard_normal(n)
    emg = 0.2 * rng.standard_normal(n)
    resp = np.sin(2 * np.pi * 0.25 * t) + 0.05 * rng.standard_normal(n)
    return np.stack([ecg, eda, emg, resp], axis=1).astype(np.float32)


def test_hybrid_feed_channels(hybrid_predictor):
    sc = StreamingClassifier.for_predictor(hybrid_predictor, calib_sec=70)
    assert sc.feed_channels == ["chest_ECG", "chest_EDA", "chest_EMG",
                                "chest_Resp"]
    with pytest.raises(ValueError, match="channels"):
        sc.push(np.zeros((10, 2), np.float32))


def test_hybrid_stream_requires_calibration_window(hybrid_predictor):
    with pytest.raises(ValueError, match="calib_sec >= window_sec"):
        StreamingClassifier.for_predictor(hybrid_predictor, calib_sec=30)
    # Exactly one window (calib == window_sec) must ALSO be rejected: its
    # frozen feature std would be identically zero -> 1e-3 epsilon division
    # inflating every post-calibration feature z-score ~1000x.
    with pytest.raises(ValueError, match="two complete windows"):
        StreamingClassifier.for_predictor(hybrid_predictor, calib_sec=60)


def test_hybrid_stream_matches_batch_with_same_stats(hybrid_predictor):
    feed = _hybrid_feed()
    calib_sec = 120
    sc = StreamingClassifier.for_predictor(hybrid_predictor,
                                           calib_sec=calib_sec)
    events = []
    rng = np.random.default_rng(2)
    i = 0
    while i < len(feed):  # ragged chunks
        n = int(rng.uniform(0.4, 37) * FS)
        events += sc.push(feed[i : i + n])
        i += n
    events += sc.flush()

    # Batch reference, recomputed independently of the stream's internals:
    # raw stats from the calibration samples (model channels only), feature
    # stats from the windows fully contained in the calibration span.
    calib = feed[: calib_sec * FS]
    mean, std = channel_norm_stats(calib[:, :C], list(CHANNELS))

    def batch_features(wins):
        cw = {s: wins[:, :, j].astype(np.float64)
              for j, s in enumerate(FEATURE_SENSOR_CHANNELS)}
        f = extract_features_batch(cw, FS)
        return np.nan_to_num(f, nan=0.0, posinf=0.0, neginf=0.0)

    c_starts = np.arange(0, len(calib) - WIN_S * FS + 1, STRIDE_S * FS)
    calib_wins = np.stack([calib[s : s + WIN_S * FS] for s in c_starts])
    cf = batch_features(calib_wins).astype(np.float64)
    f_mean, f_std = cf.mean(axis=0), cf.std(axis=0) + 1e-3

    n_win = (len(feed) - WIN_S * FS) // (STRIDE_S * FS) + 1
    wins = np.stack([feed[k * STRIDE_S * FS : k * STRIDE_S * FS + WIN_S * FS]
                     for k in range(n_win)])
    x = np.ascontiguousarray(
        apply_channel_norm(wins[:, :, :C], list(CHANNELS), mean,
                           std).transpose(0, 2, 1))
    feat = ((batch_features(wins) - f_mean) / f_std).astype(np.float32)
    want = hybrid_predictor.predict_windows((x, feat))

    assert [e.index for e in events] == list(range(n_win))
    np.testing.assert_allclose(np.stack([e.probs for e in events]), want,
                               atol=1e-5)


def test_hybrid_stream_chunking_invariance(hybrid_predictor):
    feed = _hybrid_feed(total_sec=200, seed=3)
    one = StreamingClassifier.for_predictor(hybrid_predictor, calib_sec=70)
    ev_one = one.push(feed) + one.flush()

    dribble = StreamingClassifier.for_predictor(hybrid_predictor, calib_sec=70)
    ev_dots = []
    for i in range(0, len(feed), 1111):
        ev_dots += dribble.push(feed[i : i + 1111])
    ev_dots += dribble.flush()

    assert len(ev_one) == len(ev_dots) > 0
    np.testing.assert_allclose(np.stack([e.probs for e in ev_one]),
                               np.stack([e.probs for e in ev_dots]), atol=0)


# ---------------------------------------------------------------------------
# end-to-end from a trained hybrid run dir (slow tier)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hybrid_run(preprocessed, tmp_path_factory):  # noqa: F811
    from multimodalsignal_tpu.experiments.loso import run_simple_experiment

    run_dir = tmp_path_factory.mktemp("hybrid_run")
    cfg = ExperimentConfig(
        data_path=str(preprocessed / "chest_raw"),
        raw_align_path=str(preprocessed / "chest_raw_align"),
        feature_path=str(preprocessed / "chest_feature"),
        subjects=tuple(SUBJECTS_SMALL[:3]),
        channels_to_use=CHANNELS,
        model=ModelConfig(name="hybrid_cnn_gru", cnn_out_channels=8,
                          gru_hidden_size=8, gru_num_layers=1),
        trainer=TrainerConfig(epochs=2, batch_size=16,
                              early_stopping=EarlyStoppingConfig(patience=5)),
        fold_execution="serial",
        normalization="baseline",
    )
    run_simple_experiment(cfg, run_dir)
    return run_dir


@pytest.mark.slow
def test_hybrid_run_predict_cli(hybrid_run, wesad_root, tmp_path):
    """predict --run-dir on a trained hybrid run classifies a raw pkl
    end-to-end (fold and ensemble routes)."""
    from multimodalsignal_tpu.experiments.predict import main as predict_main

    out = tmp_path / "preds.json"
    predict_main([
        "--run-dir", str(hybrid_run), "--fold", "S2",
        "--pkl", str(wesad_root / "S4" / "S4.pkl"), "--out", str(out),
    ])
    payload = json.loads(out.read_text())
    assert len(payload["windows"]) > 0

    out2 = tmp_path / "preds_ens.json"
    predict_main([
        "--run-dir", str(hybrid_run),  # fold ensemble (all folds vmapped)
        "--pkl", str(wesad_root / "S4" / "S4.pkl"), "--out", str(out2),
    ])
    payload2 = json.loads(out2.read_text())
    assert len(payload2["windows"]) == len(payload["windows"])


@pytest.mark.slow
def test_hybrid_run_ensemble_matches_fold_mean(hybrid_run, wesad_root):
    """The hybrid fold ensemble is the mean of the per-fold probabilities
    (the same parity contract the raw ensemble pins)."""
    from multimodalsignal_tpu.experiments.predict import EnsemblePredictor

    ens = EnsemblePredictor.from_run(hybrid_run, "all")
    assert ens.is_hybrid
    x, _ = ens.windows_from_recording(wesad_root / "S4" / "S4.pkl")
    got = ens.predict_windows(x)
    per_fold = [
        Predictor.from_run(hybrid_run, f).predict_windows(x)
        for f in ens.fold_names
    ]
    np.testing.assert_allclose(got, np.mean(per_fold, axis=0), atol=1e-5)


@pytest.mark.slow
def test_hybrid_run_stream_matches_batch_predictor(hybrid_run, wesad_root):
    """A trained hybrid checkpoint streams: feed the raw recording at the
    model rate and compare against the batch Predictor under the stream's
    frozen stats (the same-stats contract of test_streaming.py)."""
    from multimodalsignal_tpu.experiments.predict import _recording_grid

    predictor = Predictor.from_run(hybrid_run, "S2")
    assert predictor.is_hybrid
    sc = StreamingClassifier.for_predictor(predictor, calib_sec=90)
    grid, names = _recording_grid(wesad_root / "S4" / "S4.pkl",
                                  list(CHANNELS), 700, FS)
    feed = grid[:, [names.index(ch) for ch in sc.feed_channels]].astype(
        np.float32)
    events = []
    for i in range(0, len(feed), 4096):
        events += sc.push(feed[i : i + 4096])
    events += sc.flush()
    assert len(events) > 0

    calib = feed[: sc.calib_samples]
    mean, std = channel_norm_stats(calib[:, :C], list(CHANNELS))
    n_win = len(events)
    wins = np.stack([feed[k * STRIDE_S * FS : k * STRIDE_S * FS + WIN_S * FS]
                     for k in range(n_win)])
    x = np.ascontiguousarray(
        apply_channel_norm(wins[:, :, :C], list(CHANNELS), mean,
                           std).transpose(0, 2, 1))
    cw_full = {s: wins[:, :, sc.feed_channels.index(s)].astype(np.float64)
               for s in FEATURE_SENSOR_CHANNELS}
    feats = np.nan_to_num(extract_features_batch(cw_full, FS),
                          nan=0.0, posinf=0.0, neginf=0.0)
    c_starts = np.arange(0, len(calib) - WIN_S * FS + 1, STRIDE_S * FS)
    calib_wins = np.stack([calib[s : s + WIN_S * FS] for s in c_starts])
    cwc = {s: calib_wins[:, :, sc.feed_channels.index(s)].astype(np.float64)
           for s in FEATURE_SENSOR_CHANNELS}
    cf = np.nan_to_num(extract_features_batch(cwc, FS),
                       nan=0.0, posinf=0.0, neginf=0.0).astype(np.float64)
    f_mean, f_std = cf.mean(axis=0), cf.std(axis=0) + 1e-3
    feat = ((feats - f_mean) / f_std).astype(np.float32)

    want = predictor.predict_windows((x, feat))
    np.testing.assert_allclose(np.stack([e.probs for e in events]), want,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# feature-extractor version guard (train/serve skew)
# ---------------------------------------------------------------------------

def test_feature_extractor_version_guard():
    """Hybrid checkpoints record which extractor produced their training
    features; serving with a different live extractor must refuse (the
    round-5 linear->PCHIP change shifts HF power ~24% — silent skew)."""
    from multimodalsignal_tpu.data.features import FEATURE_EXTRACTOR_VERSION
    from multimodalsignal_tpu.experiments.predict import (
        _check_feature_extractor_version,
    )

    _check_feature_extractor_version(
        {"feature_extractor_version": FEATURE_EXTRACTOR_VERSION})  # matches
    with pytest.raises(ValueError, match="feature extractor"):
        _check_feature_extractor_version(
            {"feature_extractor_version": FEATURE_EXTRACTOR_VERSION - 1})
    with pytest.warns(UserWarning, match="feature_extractor_version"):
        _check_feature_extractor_version({})  # pre-stamp run: warn only


def test_preprocess_meta_stamps_feature_version(preprocessed):
    """The offline feature target carries the extractor stamp, and hybrid
    run configs embed it (the chain Predictor.from_files verifies)."""
    import json as _json

    from multimodalsignal_tpu.data.dataset import experiment_preprocess_meta
    from multimodalsignal_tpu.data.features import FEATURE_EXTRACTOR_VERSION

    meta = _json.loads(
        (preprocessed / "chest_feature" / "_preprocess_meta.json").read_text())
    assert meta["feature_extractor_version"] == FEATURE_EXTRACTOR_VERSION

    cfg = ExperimentConfig(
        channels_to_use=CHANNELS,
        model=ModelConfig(name="hybrid_cnn_gru"),
        raw_align_path=str(preprocessed / "chest_raw_align"),
        feature_path=str(preprocessed / "chest_feature"),
    )
    merged = experiment_preprocess_meta(cfg)
    assert merged["feature_extractor_version"] == FEATURE_EXTRACTOR_VERSION
