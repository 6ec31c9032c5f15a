"""Serving-path benchmark: windowed inference throughput and latency.

The reference has no inference surface at all (SURVEY.md §1); this measures
ours (`experiments/predict.py`) the way a deployment would see it:

  * host pipeline: raw pkl -> resample -> window -> normalize (CPU-bound)
  * batched throughput: windows/sec through the jitted forward at batch B
  * single-window latency: p50/p95 of one-window round trips

Usage (run on an otherwise-idle host; TPU by default):

    python benchmarks/bench_serving.py \
        --run-dir output/e2e_r3f/run_.../ --fold S2 \
        --pkl WESAD/S16/S16.pkl [--batch 256] [--iters 30]

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


if __name__ == "__main__":
    main()
