"""Bidirectional multi-layer GRU built on lax.scan.

Parity target: reference models.py:56-63 (torch.nn.GRU, batch_first,
bidirectional, inter-layer dropout). Gate equations follow torch's convention
(reset gate scales W_hn @ h + b_hn *before* the tanh input sum):

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh   (x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

TPU mapping: the input projection for ALL timesteps is one [B*T, in] x
[in, 3H] matmul (MXU-shaped), so the sequential scan carries only the [B, H] x
[H, 3H] recurrent product per step. Both directions run as lax.scan with
reverse=False/True over the same fused projections. An optional fused Pallas
kernel (ops/gru_pallas.py) keeps the recurrent weights resident in VMEM; the
scan path is the correctness reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def gru_cell(xg: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
             h: jnp.ndarray) -> jnp.ndarray:
    """One GRU step: precomputed input gates xg [B, 3H] + state h [B, H]."""
    hg = h @ w_hh.T + b_hh
    xr, xz, xn = jnp.split(xg, 3, axis=-1)
    hr, hz, hn = jnp.split(hg, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_sequence(x_gates: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
                 h0: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """Run one GRU direction given precomputed input gates.

    x_gates: [B, T, 3H] = x @ W_ih^T + b_ih (already computed, MXU-batched)
    w_hh:    [3H, H] torch-layout recurrent weights (rows = r, z, n blocks)
    b_hh:    [3H]
    Returns outputs [B, T, H] (aligned to original time order for both
    directions, like torch's bidirectional output).
    """
    def step(h, xg):
        h_new = gru_cell(xg, w_hh, b_hh, h)
        return h_new, h_new

    xs = jnp.swapaxes(x_gates, 0, 1)  # [T, B, 3H] scan-major
    _, ys = jax.lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # [B, T, H]


class BiGRU(nn.Module):
    """Multi-layer bidirectional GRU; input [B, T, F] -> output [B, T, 2H]
    (or [B, 2H] when last_only=True).

    last_only=True returns only the last timestep [B, 2H] — and PRUNES the
    final layer's backward-direction walk down to a single cell step. The
    backward output at the last original position is produced by the FIRST
    step of the reversed walk (h0 -> GRUCell(x[T-1], h0)); every later step
    of that walk feeds earlier positions, which a last-timestep readout
    (reference models.py:79) never consumes. Classification models read
    exactly that slice, so one of the final layer's two T-step recurrences
    (and its whole adjoint walk under grad) is dead work. Earlier layers
    still need both full directions: layer l+1 consumes layer l's outputs at
    every timestep.
    """

    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    impl: str = "scan"  # "scan" | "pallas" | "pallas_db" | "pallas_fused"
    #                     | "auto" (best kernel on TPU, scan elsewhere)
    last_only: bool = False
    dtype: jnp.dtype = jnp.float32  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        impl = self.impl
        if impl == "auto":
            # Fused kernels where they pay off; lax.scan elsewhere
            # (interpret-mode Pallas is debug-only). pallas_db batches both
            # directions into ONE fold-batched kernel walk per layer
            # (478 vs 400 bf16 train steps/s on v5e vs per-direction
            # kernels) — the right default for SINGLE-fold contexts (serial
            # trainer, bench, one-checkpoint serving). Callers that vmap the
            # model over a fold axis resolve "auto" to the per-direction
            # kernels instead via build_model(fold_parallel=True): dirbatch's
            # pre-flipped gate streams measured ~2x slower per sweep epoch at
            # 15 folds (benchmarks/RESULTS.md round 3).
            impl = "pallas_db" if jax.default_backend() == "tpu" else "scan"
        h = self.hidden_size
        bound = 1.0 / h**0.5  # torch GRU init: U(-1/sqrt(H), 1/sqrt(H))
        batch = x.shape[0]
        out = x.astype(self.dtype)
        for layer in range(self.num_layers):
            in_dim = out.shape[-1]
            params = {}
            for direction in ("fwd", "bwd"):
                pfx = f"l{layer}_{direction}"
                params[direction] = tuple(
                    self.param(f"{pfx}_{name}", _uniform_init(bound), shape).astype(
                        self.dtype
                    )
                    for name, shape in (
                        ("w_ih", (3 * h, in_dim)),
                        ("w_hh", (3 * h, h)),
                        ("b_ih", (3 * h,)),
                        ("b_hh", (3 * h,)),
                    )
                )
            h0 = jnp.zeros((batch, h), dtype=out.dtype)
            (wif, whf, bif, bhf), (wib, whb, bib, bhb) = (
                params["fwd"], params["bwd"],
            )
            xg_f = out @ wif.T + bif  # [B, T, 3H] one big matmul per direction
            xg_b = out @ wib.T + bib
            if self.last_only and layer == self.num_layers - 1:
                # Final layer under a last-timestep readout: backward
                # direction = ONE cell step (see class docstring); forward
                # still needs the full walk for h at T-1. Keep the FULL-T
                # backward projection and slice its last step: projecting
                # only out[:, -1] looks cheaper but measures 1.3% slower
                # end-to-end (580.0 vs 587.5 steps/s, 12x500-step probes,
                # v5e) — the lone [B, in]x[in, 3H] matmul becomes its own
                # tiny MXU dispatch, while the full-T form shares the fwd
                # projection's operand stream and XLA DCEs the unused
                # timesteps through the slice (benchmarks/RESULTS.md
                # "The r03->r04 drift, explained").
                y_b_last = gru_cell(xg_b[:, -1, :], whb, bhb, h0)
                if impl in ("pallas", "pallas_db", "pallas_fused"):
                    from multimodalsignal_tpu.ops.gru_pallas import (
                        gru_sequence_pallas,
                    )

                    y_f = gru_sequence_pallas(xg_f, whf, bhf, h0,
                                              reverse=False)
                else:
                    y_f = gru_sequence(xg_f, whf, bhf, h0, reverse=False)
                return jnp.concatenate(
                    [y_f[:, -1, :].astype(self.dtype),
                     y_b_last.astype(self.dtype)], axis=-1)  # [B, 2H]
            if impl == "pallas":
                from multimodalsignal_tpu.ops.gru_pallas import gru_sequence_pallas

                # One kernel per direction. (A direction-fused variant exists
                # — gru_bidirectional_pallas, impl="pallas_fused" — but
                # measured SLOWER at the flagship shape: its backward's
                # working set forces tiny VMEM time-chunks; 151 vs 253
                # train steps/s on v5e.) bf16 compute dtype selects the
                # kernels' bf16 mode (bf16 streams + MXU operands, f32
                # carry/accumulators); f32 stays full f32.
                y_f = gru_sequence_pallas(xg_f, whf, bhf, h0, reverse=False)
                y_b = gru_sequence_pallas(xg_b, whb, bhb, h0, reverse=True)
                y_f, y_b = y_f.astype(self.dtype), y_b.astype(self.dtype)
            elif impl == "pallas_db":
                from multimodalsignal_tpu.ops.gru_pallas import (
                    gru_bidirectional_dirbatch,
                )

                # Direction-batched: both directions as F=2 lanes of ONE
                # fold-batched kernel walk — halves the sequential kernel
                # walks per layer (the recurrence is latency-bound, so the
                # doubled per-step matmul batch is nearly free).
                y_f, y_b = gru_bidirectional_dirbatch(
                    xg_f, xg_b, whf, whb, bhf, bhb, h0
                )
                y_f, y_b = y_f.astype(self.dtype), y_b.astype(self.dtype)
            elif impl == "pallas_fused":
                from multimodalsignal_tpu.ops.gru_pallas import (
                    gru_bidirectional_pallas,
                )

                y_f, y_b = gru_bidirectional_pallas(
                    xg_f, xg_b, whf, whb, bhf, bhb, h0
                )
                y_f, y_b = y_f.astype(self.dtype), y_b.astype(self.dtype)
            else:
                y_f = gru_sequence(xg_f, whf, bhf, h0, reverse=False)
                y_b = gru_sequence(xg_b, whb, bhb, h0, reverse=True)
            out = jnp.concatenate([y_f, y_b], axis=-1)  # [B, T, 2H]
            if self.dropout > 0 and layer < self.num_layers - 1:
                out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        return out
