"""HTTP serving layer: request/response contract over a live (localhost)
ThreadingHTTPServer around one Predictor (the deployment surface the
reference lacks — SURVEY.md §1: no serving/API layer)."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from multimodalsignal_tpu.config import ExperimentConfig, ModelConfig
from multimodalsignal_tpu.experiments.predict import Predictor
from multimodalsignal_tpu.models import build_model
from multimodalsignal_tpu.serving import (
    PredictionService,
    ServingError,
    make_server,
)
from multimodalsignal_tpu.train.optim import make_optimizer
from multimodalsignal_tpu.train.trainer import init_train_state

from tests.conftest import SUBJECTS_SMALL  # noqa: F401

C, T = 2, 7680


@pytest.fixture(scope="module")
def service():
    cfg = ExperimentConfig(
        channels_to_use=("chest_ECG", "chest_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4,
                          gru_num_layers=1),
    )
    model = build_model(cfg.model, cfg.num_classes)
    tx = make_optimizer(1e-3, 0.0)
    sample = np.zeros((1, C, T), np.float32)
    state = init_train_state(model, jax.random.PRNGKey(0), sample, tx)
    return PredictionService(Predictor(cfg, state), batch_size=8)


@pytest.fixture(scope="module")
def server_url(service):
    server = make_server(service, host="127.0.0.1", port=0)  # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()
    thread.join()
    service.close()  # release the micro-batcher worker thread


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def _post_err(url, payload):
    try:
        return _post(url, payload)
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read())


def test_healthz_model_card(server_url, service):
    with urllib.request.urlopen(server_url + "/healthz") as resp:
        card = json.loads(resp.read())
    assert card["status"] == "ok"
    assert card["window_shape"] == [C, T]
    assert card["class_names"] == ["non_stress", "stress"]
    assert card["channels"] == ["chest_ECG", "chest_EDA"]


def test_predict_nested_lists(server_url):
    x = np.random.default_rng(0).standard_normal((3, C, T)).astype(np.float32)
    status, out = _post(server_url + "/v1/predict", {"windows": x.tolist()})
    assert status == 200
    assert out["num_windows"] == 3
    assert len(out["labels"]) == 3 and len(out["probs"]) == 3
    assert all(l in out["class_names"] for l in out["labels"])
    np.testing.assert_allclose(np.sum(out["probs"], axis=1), 1.0, rtol=1e-4)


def test_predict_npy_b64_matches_lists_and_single_window(server_url):
    x = np.random.default_rng(1).standard_normal((2, C, T)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, x)
    b64 = base64.b64encode(buf.getvalue()).decode()
    _, out_b64 = _post(server_url + "/v1/predict", {"windows_b64": b64})
    _, out_lists = _post(server_url + "/v1/predict", {"windows": x.tolist()})
    np.testing.assert_allclose(out_b64["probs"], out_lists["probs"], atol=1e-6)
    # [C, T] single-window convenience form.
    _, out_one = _post(server_url + "/v1/predict", {"windows": x[0].tolist()})
    assert out_one["num_windows"] == 1
    np.testing.assert_allclose(out_one["probs"][0], out_lists["probs"][0],
                               atol=1e-6)


def test_predict_batch_padding_consistency(server_url):
    """11 windows through batch_size=8 (one full + one padded batch) must
    equal per-window results: padding never leaks into real outputs."""
    x = np.random.default_rng(2).standard_normal((11, C, T)).astype(np.float32)
    _, full = _post(server_url + "/v1/predict", {"windows": x.tolist()})
    _, head = _post(server_url + "/v1/predict", {"windows": x[:1].tolist()})
    _, tail = _post(server_url + "/v1/predict", {"windows": x[10:].tolist()})
    np.testing.assert_allclose(full["probs"][0], head["probs"][0], atol=1e-5)
    np.testing.assert_allclose(full["probs"][10], tail["probs"][0], atol=1e-5)


def test_error_contract(server_url):
    # Wrong shape -> 400 with the expected-shape message.
    bad = np.zeros((1, C + 1, T), np.float32)
    status, out = _post_err(server_url + "/v1/predict", {"windows": bad.tolist()})
    assert status == 400 and f"[N, {C}, {T}]" in out["error"]
    # NaN windows -> 400.
    nan = np.full((1, C, T), np.nan, np.float32)
    status, out = _post_err(server_url + "/v1/predict", {"windows": nan.tolist()})
    assert status == 400 and "NaN" in out["error"]
    # Missing keys -> 400.
    status, out = _post_err(server_url + "/v1/predict", {})
    assert status == 400
    # Unknown route -> 404.
    status, out = _post_err(server_url + "/v1/nope", {})
    assert status == 404
    # Unreadable recording path -> 400.
    status, out = _post_err(server_url + "/v1/predict_recording",
                            {"pkl_path": "/does/not/exist.pkl"})
    assert status == 400


def test_concurrent_requests_single_flight(server_url):
    """Parallel clients all get correct answers through the device lock."""
    x = np.random.default_rng(3).standard_normal((2, C, T)).astype(np.float32)
    results, errors = [], []

    def hit():
        try:
            results.append(_post(server_url + "/v1/predict",
                                 {"windows": x.tolist()})[1])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=hit) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors and len(results) == 6
    for r in results[1:]:
        np.testing.assert_allclose(r["probs"], results[0]["probs"], atol=1e-6)


def test_predict_recording_endpoint(server_url, wesad_root):
    status, out = _post(server_url + "/v1/predict_recording",
                        {"pkl_path": str(wesad_root / "S2" / "S2.pkl")})
    assert status == 200
    assert len(out["windows"]) > 0
    assert out["windows"][1]["start_sec"] - out["windows"][0]["start_sec"] == 10.0
    assert sum(out["class_counts"].values()) == len(out["windows"])


def test_service_decode_errors_direct(service):
    with pytest.raises(ServingError):
        service._decode_windows({"windows_b64": "not base64 npy"})
    with pytest.raises(ServingError):
        service._decode_windows({"windows": [[["a"]]]})


def test_artifact_backend_parity(service, tmp_path):
    """The same server contract from a single exported .mms artifact (no
    checkpoint/config/model code) — probs must match the live backend."""
    from multimodalsignal_tpu.experiments.export import (
        ExportedPredictor,
        export_predictor,
    )

    out = tmp_path / "model.mms"
    export_predictor(service.predictor, out, platforms=("cpu",))
    art_service = PredictionService(ExportedPredictor.load(out))
    assert art_service.backend == "artifact"
    card = art_service.health()
    assert card["window_shape"] == [C, T] and card["backend"] == "artifact"

    server = make_server(art_service, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        x = np.random.default_rng(5).standard_normal((3, C, T)).astype(np.float32)
        _, art = _post(url + "/v1/predict", {"windows": x.tolist()})
        live = service.predict_windows({"windows": x.tolist()})
        np.testing.assert_allclose(art["probs"], live["probs"], atol=1e-5)
    finally:
        server.shutdown()
        server.server_close()
        thread.join()
        art_service.close()


def test_artifact_backend_recording(service, tmp_path, wesad_root):
    """predict_recording through the artifact's recorded pipeline params."""
    from multimodalsignal_tpu.experiments.export import (
        ExportedPredictor,
        export_predictor,
    )

    out = tmp_path / "model.mms"
    export_predictor(service.predictor, out, platforms=("cpu",))
    art_service = PredictionService(ExportedPredictor.load(out))
    res = art_service.predict_recording(
        {"pkl_path": str(wesad_root / "S3" / "S3.pkl")})
    live = service.predict_recording(
        {"pkl_path": str(wesad_root / "S3" / "S3.pkl")})
    np.testing.assert_allclose(
        [w["probs"] for w in res["windows"]],
        [w["probs"] for w in live["windows"]], atol=1e-5)


def test_micro_batching_coalesces_and_matches(service):
    """Concurrent single-window requests arriving inside the micro-batch
    window are served by FEWER device forwards than requests, and every
    caller gets exactly the probs of the equivalent lone request."""
    svc = PredictionService(service.predictor, batch_size=8,
                            micro_batch_ms=150.0)
    x = np.random.default_rng(7).standard_normal((6, C, T)).astype(np.float32)
    want = [svc.predict_windows({"windows": x[i : i + 1].tolist()})["probs"]
            for i in range(3)]  # sequential warm + references

    results: dict[int, list] = {}
    errors: list = []
    start = threading.Barrier(6)

    def hit(i):
        try:
            start.wait()
            results[i] = svc.predict_windows(
                {"windows": x[i % 3 : i % 3 + 1].tolist()})["probs"]
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    before = svc._batcher.batches_run
    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors and len(results) == 6
    for i, probs in results.items():
        np.testing.assert_allclose(probs, want[i % 3], atol=1e-5)
    coalesced = svc._batcher.batches_run - before
    # 6 requests released together inside a 150 ms window: strictly fewer
    # batches than requests (typically 1-2).
    assert 1 <= coalesced < 6, f"no coalescing happened ({coalesced} batches)"
    assert svc.requests_served == 3 + 6
    svc.close()


def test_micro_batching_disabled_is_pure_single_flight(service):
    svc = PredictionService(service.predictor, batch_size=8,
                            micro_batch_ms=0.0)
    assert svc._batcher is None
    x = np.random.default_rng(8).standard_normal((2, C, T)).astype(np.float32)
    out = svc.predict_windows({"windows": x.tolist()})
    ref = service.predict_windows({"windows": x.tolist()})
    np.testing.assert_allclose(out["probs"], ref["probs"], atol=1e-6)
    assert svc.health()["batches_run"] == svc.requests_served == 1


def test_micro_batching_error_isolation(service):
    """A failing batch must not wedge the worker: subsequent requests are
    still served."""
    svc = PredictionService(service.predictor, batch_size=8,
                            micro_batch_ms=5.0)
    bad = np.zeros((1, C, T), np.float32)

    orig = svc.predictor.predict_windows
    calls = {"n": 0}

    def flaky(x, batch_size):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected device failure")
        return orig(x, batch_size)

    svc.predictor = type("P", (), {})()  # shell with just predict_windows
    svc.predictor.predict_windows = flaky
    with pytest.raises(RuntimeError, match="injected"):
        svc._batcher.submit(bad)
    probs = svc._batcher.submit(bad)
    assert probs.shape == (1, 2)
    svc.close()


def test_micro_batching_close_releases_worker(service):
    """close() joins the worker thread (no leak), is idempotent, and later
    submits fail loudly instead of blocking forever."""
    svc = PredictionService(service.predictor, batch_size=8,
                            micro_batch_ms=5.0)
    batcher = svc._batcher
    assert batcher._worker.is_alive()
    svc.close()
    assert not batcher._worker.is_alive()
    assert svc._batcher is None
    with pytest.raises(RuntimeError, match="closed"):
        batcher.submit(np.zeros((1, C, T), np.float32))
    svc.close()  # idempotent
    # The service itself still serves via the single-flight path.
    out = svc.predict_windows(
        {"windows": np.zeros((1, C, T), np.float32).tolist()})
    assert len(out["probs"]) == 1


def test_request_window_bound_413(service):
    """Oversized /v1/predict requests are refused with 413 — from
    Content-Length alone for verbose bodies (never read into memory), and
    from the decoded window count for compact b64 payloads."""
    svc = PredictionService(service.predictor, batch_size=8,
                            micro_batch_ms=0.0, max_request_windows=1)
    server = make_server(svc, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        rng = np.random.default_rng(0)
        x4 = rng.standard_normal((4, C, T)).astype(np.float32)
        # Verbose JSON body for 4 random-float windows exceeds
        # max_body_bytes: the handler answers 413 off the header without
        # reading the body.
        assert len(json.dumps({"windows": x4.tolist()})) > svc.max_body_bytes
        code, body = _post_err(url + "/v1/predict", {"windows": x4.tolist()})
        assert code == 413 and "bytes" in body["error"]

        # Compact b64 body passes the header gate but carries 2 windows:
        # rejected on the decoded count.
        buf = io.BytesIO()
        np.save(buf, x4[:2])
        payload = {"windows_b64": base64.b64encode(buf.getvalue()).decode()}
        assert len(json.dumps(payload)) <= svc.max_body_bytes
        code, body = _post_err(url + "/v1/predict", payload)
        assert code == 413 and "max-request-windows" in body["error"]

        # At the limit still serves.
        code, body = _post(url + "/v1/predict",
                           {"windows": x4[:1].tolist()})
        assert code == 200 and body["num_windows"] == 1
    finally:
        server.shutdown()
        server.server_close()
        thread.join()
        svc.close()
