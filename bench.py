"""Benchmark: train steps/sec/chip on the flagship CnnGruAttention config.

Measures the jitted JAX training step (forward + backward + Adam update,
batch-norm state update included) at the reference's headline workload shape:
batch 64, 3 input channels, 7680 timesteps (reference main.py:47,62,
preprocess.py:21-23). Baseline is the same-architecture PyTorch training step
(the reference is pure PyTorch with no TPU path, SURVEY.md §2), measured once
on this host and cached in .bench_baseline.json.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

BASELINE_CACHE = Path(__file__).parent / ".bench_baseline.json"


def bench_jax(batch: int, channels: int, seq: int, steps: int, warmup: int,
              gru_impl: str = "pallas", dtype: str = "float32",
              dropout_rng: str = "auto", last_prune: bool = True) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from multimodalsignal_tpu.models import CnnGruAttentionModel
    from multimodalsignal_tpu.train.optim import make_optimizer
    from multimodalsignal_tpu.train.trainer import cross_entropy
    from multimodalsignal_tpu.utils.rng import (
        as_dropout_key,
        resolve_dropout_rng_impl,
    )

    if jax.default_backend() != "tpu":
        gru_impl = "scan"  # pallas interpret mode is not a perf path
    rng_impl = resolve_dropout_rng_impl(dropout_rng)
    model = CnnGruAttentionModel(num_classes=2, gru_impl=gru_impl,
                                 gru_last_prune=last_prune,
                                 dtype=jnp.dtype(dtype))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, channels, seq), jnp.float32)
    y = jax.random.randint(rng, (batch,), 0, 2)
    w = jnp.ones((batch,), jnp.float32)
    variables = model.init(rng, x, train=False)
    tx = make_optimizer(1e-3, 1e-4)
    opt_state = tx.init(variables["params"])

    def train_step(carry, i):
        params, batch_stats, opt_state = carry

        def loss_fn(params):
            (logits, new_bs) = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=True,
                rngs={"dropout": as_dropout_key(
                    jax.random.fold_in(rng, i), rng_impl)},
                mutable=["batch_stats"],
            )
            loss, _ = cross_entropy(logits, y, w)
            return loss, new_bs["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return (new_params, new_bs, new_opt), loss

    # Device-side step loop: one dispatch per `steps`-long scan, so remote
    # per-call dispatch latency (large on tunneled runtimes) never pollutes
    # the steps/sec measurement.
    @jax.jit
    def train_many(carry, offset):
        return jax.lax.scan(train_step, carry,
                            offset + jnp.arange(steps, dtype=jnp.int32))

    carry = (variables["params"], variables.get("batch_stats", {}), opt_state)
    carry, loss = train_many(carry, jnp.asarray(0, jnp.int32))  # compile+warm
    jax.block_until_ready(loss)
    reps = 3
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        carry, loss = train_many(carry, jnp.asarray(r * steps, jnp.int32))
    jax.block_until_ready(loss)
    return reps * steps / (time.perf_counter() - t0)


def bench_torch_baseline(batch: int, channels: int, seq: int, steps: int) -> float:
    """Reference-architecture PyTorch training step on this host (the
    reference has no TPU backend; torch here is CPU). Cached across runs."""
    import torch
    import torch.nn as nn

    class TorchChannelAttention(nn.Module):
        def __init__(self, c, r=4):
            super().__init__()
            self.pool = nn.AdaptiveAvgPool1d(1)
            self.fc = nn.Sequential(
                nn.Linear(c, c // r, bias=False), nn.ReLU(),
                nn.Linear(c // r, c, bias=False), nn.Sigmoid(),
            )

        def forward(self, x):
            y = self.fc(self.pool(x).squeeze(-1))
            return x * y.unsqueeze(-1)

    class TorchCnnGruAttention(nn.Module):
        def __init__(self, c_in, num_classes=2, cnn_out=32, hidden=64, layers=2):
            super().__init__()
            self.att = TorchChannelAttention(c_in) if c_in >= 4 else None
            self.cnn = nn.Sequential(
                nn.Conv1d(c_in, 16, 7, stride=2, padding=3, bias=False),
                nn.BatchNorm1d(16), nn.ReLU(), nn.MaxPool1d(3, 2, padding=1),
                nn.Conv1d(16, cnn_out, 5, stride=2, padding=2, bias=False),
                nn.BatchNorm1d(cnn_out), nn.ReLU(), nn.MaxPool1d(3, 2, padding=1),
            )
            self.gru = nn.GRU(cnn_out, hidden, layers, batch_first=True,
                              bidirectional=True, dropout=0.5)
            self.head = nn.Sequential(
                nn.Linear(2 * hidden, 64), nn.ReLU(), nn.Dropout(0.5),
                nn.Linear(64, num_classes),
            )

        def forward(self, x):
            if self.att is not None:
                x = self.att(x)
            else:
                x = x * 0.5  # reference's degenerate C<4 gate (models.py:12-21)
            x = self.cnn(x).permute(0, 2, 1)
            out, _ = self.gru(x)
            return self.head(out[:, -1, :])

    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = TorchCnnGruAttention(channels).to(device)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)
    loss_fn = nn.CrossEntropyLoss()
    x = torch.randn(batch, channels, seq, device=device)
    y = torch.randint(0, 2, (batch,), device=device)
    model.train()
    for _ in range(2):  # warmup
        opt.zero_grad()
        loss_fn(model(x), y).backward()
        opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss_fn(model(x), y).backward()
        opt.step()
    return steps / (time.perf_counter() - t0)


def get_baseline(batch: int, channels: int, seq: int) -> float:
    key = f"torch_b{batch}_c{channels}_t{seq}"
    cache = {}
    if BASELINE_CACHE.exists():
        try:
            cache = json.loads(BASELINE_CACHE.read_text())
        except json.JSONDecodeError:
            cache = {}
    if key not in cache:
        try:
            cache[key] = bench_torch_baseline(batch, channels, seq, steps=10)
            BASELINE_CACHE.write_text(json.dumps(cache))
        except Exception:
            return float("nan")
    return cache[key]


def main() -> None:
    from multimodalsignal_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--channels", type=int, default=3)
    p.add_argument("--seq", type=int, default=7680)
    # 500 steps per dispatch: one jitted call over the tunneled runtime costs
    # ~7 ms of host/transport latency, so 100-step dispatches under-report
    # device throughput by ~4% (483 vs the 500-2000-step plateau of ~503
    # steps/s, measured round 3). 500 is within 0.6% of the plateau.
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--gru-impl",
                   choices=("scan", "pallas", "pallas_db", "pallas_fused"),
                   default="pallas_db",
                   help="direction-batched fused Pallas GRU (default; both "
                        "directions as F=2 lanes of one fold-batched kernel "
                        "walk, +19% steps/s bf16 over per-direction kernels), "
                        "per-direction kernels (pallas), or lax.scan")
    # bf16 is the TPU-idiomatic default: +7% steps/s over f32 with measured
    # LOSO accuracy parity on the benchmark corpus (benchmarks/RESULTS.md
    # round 2; 81.52 +- 5.05 bf16 vs 81.64 +- 4.49 f32).
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default="bfloat16")
    # "auto" mirrors the trainer default: TPU hardware PRNG for dropout masks
    # (rbg; -154 us/step vs threefry at this shape), threefry elsewhere.
    p.add_argument("--no-last-prune", action="store_true",
                   help="disable the final-layer backward-walk pruning "
                        "(A/B the pre-round-3 GRU schedule)")
    p.add_argument("--dropout-rng", choices=("auto", "threefry", "rbg"),
                   default="auto")
    args = p.parse_args()

    value = bench_jax(args.batch, args.channels, args.seq, args.steps,
                      args.warmup, args.gru_impl, args.dtype,
                      args.dropout_rng, last_prune=not args.no_last_prune)
    baseline = get_baseline(args.batch, args.channels, args.seq)
    vs = value / baseline if np.isfinite(baseline) and baseline > 0 else None
    # vs_baseline compares this dtype's JAX run to the float32 torch-CPU
    # reference step (the reference has no bf16 path); the dtype is named in
    # the metric string so the ratio is never read as an f32-vs-f32 claim.
    print(json.dumps({
        "metric": "cnn_gru_attention train steps/sec/chip "
                  f"(B={args.batch}, C={args.channels}, T={args.seq}, "
                  f"{args.dtype}; baseline torch-CPU float32)",
        "value": round(value, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
