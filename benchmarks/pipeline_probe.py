"""Cross-layer GRU pipelining probe (VERDICT r3 item #8).

Question: layer 2's forward walk serializes behind layer 1 — could a fused
two-layer kernel that feeds layer-2 chunks as layer-1 chunks complete hide
part of the remaining recurrence (~25%)?

Answer: NO, structurally, for a BIDIRECTIONAL stack — proven by dependency
analysis, then confirmed by measurement (the walks already account for the
whole step; there is no overlap window to exploit):

  Layer-2's input at time t is the CONCAT [l1_fwd[t]; l1_bwd[t]].
    * l2_fwd walks t = 0..T-1 and needs l1_bwd[0] first — but the backward
      walk produces l1_bwd[0] LAST. So l2_fwd cannot issue its first step
      until layer 1's backward walk has fully completed.
    * l2_bwd (symmetrically) needs l1_fwd[T-1] first — the LAST output of
      the forward walk.
  Any chunk-level pipelining schedule therefore degenerates to "wait for
  layer 1 to finish", which is exactly the shipped schedule. The one
  exploitable skew — running l1_bwd and l2_bwd in a single direction-
  batched walk offset by one step (both consume DEcreasing t) — requires
  splitting layer 1's directions into two sequential walks (l1_fwd, then
  skewed l1_bwd+l2_bwd, then l2_fwd) = 3T sequential steps, strictly worse
  than the shipped 2T (direction-batched l1, then l2_fwd with the pruned
  l2_bwd cell). The adjoint mirrors the same dependencies.

  The non-recurrent parts CAN overlap in principle (l2's input projection
  splits as l1f@Wf + l1b@Wb, each incrementally computable) — but XLA
  already schedules those MXU-parallel ops into the walks' shadow: the
  measurement below shows walk walls ~= the whole forward wall.

Measurement (run on the TPU when idle):

    python benchmarks/pipeline_probe.py

times (a) the direction-batched layer-1 walk, (b) the layer-2 forward walk,
(c) the full model forward, and (d) the full train step, and reports how
much wall is NOT inside the two walks — the theoretical maximum a perfect
two-layer fusion could recover.
"""

from __future__ import annotations

import functools
import json
import time

print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp
import numpy as np

B, C, T, H = 64, 3, 7680, 64
T2 = 480  # post-conv GRU length


def _time(fn, *args, iters=200) -> float:
    """Median-of-3 wall per call, device-synchronized. Calls are
    independent repeats of the SAME dispatch (no dedup-defeating fold) —
    fine for the relative comparisons this probe makes, but absolute
    numbers can flatter on runtimes that overlap identical dispatches;
    bench.py's scan-chained harness is the authoritative absolute timer."""
    out = fn(*args)
    jax.block_until_ready(out)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        walls.append((time.perf_counter() - t0) / iters)
    return float(np.median(walls))


def main() -> None:
    from multimodalsignal_tpu.models import CnnGruAttentionModel
    from multimodalsignal_tpu.ops.gru_pallas import (
        gru_bidirectional_dirbatch,
        gru_sequence_pallas,
    )

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32).astype(dt)

    # (a) layer-1 walk: both directions as one direction-batched kernel.
    xg_f, xg_b = mk(B, T2, 3 * H), mk(B, T2, 3 * H)
    whh_f, whh_b = mk(3 * H, H), mk(3 * H, H)
    bhh_f, bhh_b = mk(3 * H), mk(3 * H)
    h0 = jnp.zeros((B, H), jnp.float32)
    l1 = jax.jit(lambda *a: gru_bidirectional_dirbatch(*a))
    t_l1 = _time(l1, xg_f, xg_b, whh_f, whh_b, bhh_f, bhh_b, h0)

    # (b) layer-2 forward-direction walk (the pruned schedule's second walk).
    l2 = jax.jit(lambda a, w, c, d: gru_sequence_pallas(a, w, c, d))
    t_l2 = _time(l2, xg_f, whh_f, bhh_f, h0)

    # (c) full model forward / (d) train step.
    model = CnnGruAttentionModel(num_classes=2, gru_impl="pallas_db",
                                 dtype=dt)
    x = jnp.asarray(rng.standard_normal((B, C, T)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    t_fwd = _time(fwd, variables, x)

    import optax

    from multimodalsignal_tpu.train.optim import make_optimizer
    from multimodalsignal_tpu.train.trainer import cross_entropy

    y = jnp.zeros((B,), jnp.int32)
    w = jnp.ones((B,), jnp.float32)
    tx = make_optimizer(1e-3, 1e-4)
    opt_state = tx.init(variables["params"])
    key = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            logits, new_bs = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            return cross_entropy(logits, y, w)[0], new_bs["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, new_opt, loss

    t_step = _time(step, variables["params"],
                   variables.get("batch_stats", {}), opt_state, iters=100)

    walks_fwd = t_l1 + t_l2
    slack_fwd = t_fwd - walks_fwd
    print(json.dumps({
        "l1_dirbatch_walk_us": round(t_l1 * 1e6, 1),
        "l2_fwd_walk_us": round(t_l2 * 1e6, 1),
        "model_forward_us": round(t_fwd * 1e6, 1),
        "train_step_us": round(t_step * 1e6, 1),
        "fwd_wall_outside_walks_us": round(slack_fwd * 1e6, 1),
        "fwd_wall_outside_walks_pct": round(100 * slack_fwd / t_fwd, 1),
        "verdict": ("a perfect two-layer fusion could at MOST recover the "
                    "outside-walks slack; the bidirectional dependency "
                    "forbids overlapping the walks themselves"),
    }))


if __name__ == "__main__":
    main()
