"""Serving-path benchmark: windowed inference throughput and latency.

The reference has no inference surface at all (SURVEY.md §1); this measures
ours (`experiments/predict.py`) the way a deployment would see it:

  * host pipeline: raw pkl -> resample -> window -> normalize (CPU-bound)
  * batched throughput: windows/sec through the jitted forward at batch B
  * single-window latency: p50/p95 of one-window round trips
  * HTTP load test (--load-clients N): N request threads hammering a live
    serving.py instance with single-window POSTs, p50/p99 + coalescing
    stats, micro-batched vs single-flight (--load-micro-batch-ms).

Usage (run on an otherwise-idle host; TPU by default):

    python benchmarks/bench_serving.py \
        --run-dir output/e2e_r3f/run_.../ --fold S2 \
        --pkl WESAD/S16/S16.pkl [--batch 256] [--iters 30] \
        [--load-clients 8 --load-requests 40]

Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

# Results must land even when stdout is a redirected log (block-buffered).
print = functools.partial(print, flush=True)

import jax
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", required=True)
    p.add_argument("--fold", required=True,
                   help="subject id, or 'all' for the vmapped fold ensemble")
    p.add_argument("--pkl", required=True)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--latency-iters", type=int, default=50)
    p.add_argument("--load-clients", type=int, default=8,
                   help="HTTP load-test client threads (0 disables)")
    p.add_argument("--load-requests", type=int, default=40,
                   help="single-window requests per client")
    p.add_argument("--load-micro-batch-ms", type=float, default=2.0)
    args = p.parse_args()

    from multimodalsignal_tpu.experiments.predict import EnsemblePredictor

    predictor = EnsemblePredictor.from_run(Path(args.run_dir), fold=args.fold)
    n_folds = len(getattr(predictor, "fold_names", ())) or 1
    if n_folds > 1:
        print(json.dumps({"metric": "serving backend",
                          "value": n_folds, "unit": "folds (vmapped ensemble)"}))

    # --- host pipeline -----------------------------------------------------
    t0 = time.perf_counter()
    win, starts = predictor.windows_from_recording(args.pkl)
    host_s = time.perf_counter() - t0
    n, c, t = win.shape
    rec_minutes = (starts[-1] + predictor.window_sec) / 60.0
    print(json.dumps({
        "metric": "serving host pipeline (resample+window+normalize)",
        "value": round(host_s, 3), "unit": "s",
        "windows": n, "recording_min": round(float(rec_minutes), 1),
    }))

    # --- batched throughput --------------------------------------------------
    # One device execution scanning over the batches (bench.py methodology).
    # Two traps on the tunneled runtime, both hit by naive versions and both
    # verified by experiment (iters=30 vs 300 scaling probe):
    #   * every timed call must depend on the previous call's OUTPUT, or the
    #     relay overlaps/dedupes repeated dispatches;
    #   * `block_until_ready` can return EARLY here — the only trustworthy
    #     barrier is a host transfer of the result (float()/device_get), so
    #     all timing below materializes the accumulator.
    import jax.numpy as jnp
    from jax import lax

    b = args.batch
    reps = int(np.ceil(b / n)) if n < b else 1
    batch = np.tile(win, (reps, 1, 1))[:b]
    x = jax.device_put(batch)
    fn = predictor._predict_fn

    @jax.jit
    def scan_probs(params, batch_stats, x, acc0):
        def body(acc, i):
            # Fold the running accumulator (and step index) into one input
            # element: serializes iterations and defeats dedup; costs one
            # scalar add.
            xi = x.at[0, 0, 0].add(acc * 1e-20 + jnp.float32(i) * 1e-12)
            return acc + fn(params, batch_stats, xi).sum(), None

        acc, _ = lax.scan(body, acc0, jnp.arange(args.iters))
        return acc

    acc = scan_probs(predictor.state.params, predictor.state.batch_stats,
                     x, jnp.float32(0.0))
    float(acc)  # compile + warm; host transfer is the real barrier
    outer = 3
    t0 = time.perf_counter()
    for _ in range(outer):
        acc = scan_probs(predictor.state.params, predictor.state.batch_stats,
                         x, acc)
    float(acc)
    dt = time.perf_counter() - t0
    wps = outer * args.iters * b / dt
    print(json.dumps({
        "metric": f"serving batched inference (B={b}, C={c}, T={t})",
        "value": round(wps, 1), "unit": "windows/sec",
        "recording_hours_per_sec": round(
            wps * predictor.stride_sec / 3600.0, 1),
    }))

    # --- single-window latency ----------------------------------------------
    # The JITTED forward, one request per call, each with fresh host data
    # (device_put included: a real request pays the transfer) and a distinct
    # payload so the relay cannot dedupe. This measures what a deployment
    # sees per round trip, relay RTT included.
    jfn = predictor._predict
    x1 = jax.device_put(batch[:1])
    np.asarray(jfn(predictor.state.params, predictor.state.batch_stats,
                   x1))  # compile B=1
    lat = []
    for it in range(args.latency_iters):
        req = batch[:1] + np.float32(it) * np.float32(1e-9)
        t0 = time.perf_counter()
        x1 = jax.device_put(req)
        out = np.asarray(jfn(predictor.state.params,
                             predictor.state.batch_stats, x1))
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    print(json.dumps({
        "metric": "serving single-window latency",
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
        "unit": "ms",
    }))

    # --- HTTP load test (micro-batching A/B) ---------------------------------
    if args.load_clients > 0:
        # A/B coalescing vs single-flight; collapse to one arm when the
        # requested setting IS single-flight (0 would just run twice).
        arms = (args.load_micro_batch_ms, 0.0)
        if args.load_micro_batch_ms == 0.0:
            arms = (0.0,)
        for mb_ms in arms:
            stats = _http_load(predictor, batch[:1], args.load_clients,
                               args.load_requests, mb_ms)
            print(json.dumps({
                "metric": (f"serving HTTP load ({args.load_clients} clients x "
                           f"{args.load_requests} single-window reqs)"),
                "micro_batch_ms": mb_ms, **stats, "unit": "ms",
            }))


def _http_load(predictor, window, clients: int, requests: int,
               micro_batch_ms: float) -> dict:
    """Spin a real serving.py server on an ephemeral port and hammer it."""
    import threading
    import urllib.request

    from multimodalsignal_tpu.serving import (
        PredictionService,
        make_server,
    )

    service = PredictionService(predictor, batch_size=64,
                                micro_batch_ms=micro_batch_ms)
    service.predict_windows({"windows": window.tolist()})  # warm compile
    service.requests_served = service.windows_served = 0
    if service._batcher is not None:
        service._batcher.batches_run = 0
    server = make_server(service, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}/v1/predict"

    lat: list[float] = []
    lat_lock = threading.Lock()
    errors: list[Exception] = []
    start = threading.Barrier(clients)

    def client(cid: int):
        try:
            start.wait()
            for r in range(requests):
                payload = json.dumps(
                    {"windows": (window + np.float32((cid * requests + r)
                                                     * 1e-9)).tolist()}
                ).encode()
                req = urllib.request.Request(
                    url, data=payload,
                    headers={"Content-Type": "application/json"},
                    method="POST")
                t0 = time.perf_counter()
                with urllib.request.urlopen(req) as resp:
                    resp.read()
                    assert resp.status == 200
                with lat_lock:
                    lat.append(time.perf_counter() - t0)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0
    server.shutdown()
    server.server_close()  # shutdown() stops the loop but leaks the socket
    thread.join()
    # Capture before close(): close() drops _batcher, which would silently
    # fall back to requests_served and report one batch per request.
    device_batches = (service._batcher.batches_run
                      if service._batcher else service.requests_served)
    service.close()  # release the micro-batcher worker thread
    if errors:
        raise errors[0]
    lat_ms = np.asarray(lat) * 1e3
    total = clients * requests
    return {
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "throughput_rps": round(total / wall, 1),
        "device_batches": device_batches,
        "requests": total,
    }


if __name__ == "__main__":
    main()
