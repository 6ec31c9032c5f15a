"""Fused Pallas GRU kernel (forward + custom-VJP backward).

Replaces the per-step lax.scan recurrence (models/gru.py:34-59, itself the
TPU equivalent of the reference's cuDNN GRU, reference models.py:56-63) with
one Pallas kernel per direction:

  * The input projection x @ W_ih^T + b_ih stays OUTSIDE the kernel — it is
    one big MXU-shaped [B*T, in] x [in, 3H] matmul XLA already does optimally.
  * The kernel walks time in VMEM-resident chunks: the [T, B, 3H] gate array
    is gridded over time, the hidden state lives in a VMEM scratch that
    persists across sequential grid steps, and every timestep is one small
    [B, H] x [H, 3H] MXU matmul plus VPU gate math — no HBM round-trip of
    the carry, no per-step kernel launch.
  * Backward is a second Pallas kernel running the adjoint recurrence in the
    opposite time order, recomputing the recurrent gate projection from the
    saved hidden states (cheaper than storing [T, B, 3H] activations) and
    accumulating dW_hh / db_hh in VMEM scratch.

Gate convention matches torch (r, z, n blocks; reset gate applied to the
recurrent term before tanh) so the kernel is a drop-in for the scan path.

On non-TPU backends the kernel runs in Pallas interpreter mode, so the same
code path is testable on the CPU mesh (SURVEY.md §4).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Maximum time-chunk length per grid step; the actual chunk is sized from a
# VMEM budget (time-blocked refs are double-buffered by the pipeline, and the
# whole working set must stay under the ~16 MB scoped-vmem limit).
T_BLK = 32
# Per buffer set; sized for the WORST CO-RESIDENCY: under jax.checkpoint the
# recomputed forward pallas_call and the backward pallas_call share one fused
# region, so BOTH kernels' double-buffered block sets live in scoped vmem at
# once (observed: 4 MB budgets OOM at 16.1 MB for H=32, where the forward
# chunk capped at 64 steps). 2.5 MB per kernel x2 double-buffering x2 kernels
# ~= 10 MB worst case, leaving headroom for scratch and vmap overhead.
_VMEM_BUDGET_BYTES = 2_621_440
# Time-steps unrolled per sequential-loop iteration inside the kernels
# (latency-bound loops). The largest power of two <= this that divides t_blk
# is used.
_UNROLL = 16


def _pick_unroll(t_blk: int) -> int:
    u = _UNROLL
    while t_blk % u:
        u //= 2
    return max(u, 1)


def _pick_t_blk(per_step_bytes: int, t_total: int) -> int:
    """Largest multiple-of-8 chunk (capped at T_BLK) whose double-buffered
    time-blocked working set fits the VMEM budget."""
    blk = min(T_BLK, max(8, (_VMEM_BUDGET_BYTES // max(per_step_bytes, 1)) // 8 * 8))
    return min(blk, max(8, -(-t_total // 8) * 8))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(xg_ref, whh_t_ref, bhh_ref, h0_ref, out_ref, h_scratch,
                *, t_total: int, t_blk: int, reverse: bool):
    """One time-chunk of the GRU recurrence.

    xg_ref  [T_BLK, B, 3H]  precomputed input gates for this chunk
    whh_t   [H, 3H]         transposed recurrent weights (h @ whh_t)
    bhh     [1, 3H]
    h0      [B, H]
    out_ref [T_BLK, B, H]   hidden states for this chunk
    h_scratch [B, H]        carry, persists across sequential grid steps
    """
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        h_scratch[:] = h0_ref[:].astype(jnp.float32)

    # Chunk index in TIME order: the grid walks the recurrence order, which
    # for the reverse direction is the last chunk first.
    chunk = (n_chunks - 1 - i) if reverse else i
    base = chunk * t_blk

    def one_step(t, h):
        valid = (base + t) < t_total
        xg = xg_ref[t]
        # In bf16 mode the carry stays f32 (accuracy over hundreds of steps)
        # but the MXU operands are bf16: one pass instead of f32's three.
        hg = (
            jnp.dot(h.astype(whh_t_ref.dtype), whh_t_ref[:],
                    preferred_element_type=jnp.float32)
            + bhh_ref[0]
        )
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h_new = jnp.where(valid, h_new, h)
        out_ref[t] = h_new.astype(out_ref.dtype)
        return h_new

    # Unrolled inside the sequential loop: the recurrence is latency-bound
    # (~1 us/step), so loop-control overhead is significant.
    unroll = _pick_unroll(t_blk)

    def step(k, h):
        base_k = k * unroll
        for u in range(unroll):
            kk = base_k + u
            t = (t_blk - 1 - kk) if reverse else kk
            h = one_step(t, h)
        return h

    h_scratch[:] = jax.lax.fori_loop(0, t_blk // unroll, step, h_scratch[:])


def _gru_forward(x_gates_tm, w_hh, b_hh, h0, reverse: bool):
    """x_gates_tm [T, B, 3H] time-major -> ys [T, B, H]."""
    t_total, batch, three_h = x_gates_tm.shape
    hidden = three_h // 3
    dt = x_gates_tm.dtype  # f32, or bf16 (halved pipeline traffic)
    # Working set per time step: xg block + out block (double-buffered).
    t_blk = _pick_t_blk(batch * (three_h + hidden) * dt.itemsize, t_total)
    n_chunks = pl.cdiv(t_total, t_blk)
    whh_t = w_hh.T  # [H, 3H]
    bhh2 = b_hh.reshape(1, three_h)

    def chunk_map(i):
        return ((n_chunks - 1 - i) if reverse else i, 0, 0)

    return pl.pallas_call(
        partial(_fwd_kernel, t_total=t_total, t_blk=t_blk, reverse=reverse),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((t_blk, batch, three_h), chunk_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, three_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_blk, batch, hidden), chunk_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_total, batch, hidden), dt),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=_interpret(),
    )(x_gates_tm, whh_t, bhh2, h0)


# ---------------------------------------------------------------------------
# Backward kernel (adjoint recurrence, opposite time order)
# ---------------------------------------------------------------------------

def _bwd_kernel(dy_ref, hprev_ref, xg_ref, whh_t_ref, bhh_ref,
                dxg_ref, dwhh_t_ref, dbhh_ref, dh0_ref,
                dh_scratch, dw_scratch, db_scratch,
                *, t_total: int, t_blk: int, reverse: bool):
    """Adjoint of one time-chunk.

    hprev_ref [T_BLK, B, H]: the hidden state ENTERING each step (ys shifted
    by one in recurrence order, with h0 at the recurrence start) — lets the
    kernel recompute the gates instead of storing them.
    Outputs: dxg (per-chunk), and at the final grid step the accumulated
    dwhh_t [H, 3H], dbhh [1, 3H], dh0 [B, H].
    """
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)
        dw_scratch[:] = jnp.zeros_like(dw_scratch)
        db_scratch[:] = jnp.zeros_like(db_scratch)

    # The adjoint walks chunks opposite to the recurrence order: for the
    # forward direction that is last chunk first.
    chunk = i if reverse else (n_chunks - 1 - i)
    base = chunk * t_blk

    def one_step(t, dh):
        valid = (base + t) < t_total
        # Mask the state itself: padded-block reads can be NaN/garbage and a
        # NaN times a zeroed dgates_h still poisons the dW accumulator.
        h_prev = jnp.where(valid, hprev_ref[t],
                           jnp.zeros((), hprev_ref.dtype))
        xg = xg_ref[t]
        hg = (
            jnp.dot(h_prev, whh_t_ref[:], preferred_element_type=jnp.float32)
            + bhh_ref[0]
        )
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)

        dht = dh + dy_ref[t]
        dz = dht * (h_prev - n)
        dn = dht * (1.0 - z)
        dn_pre = dn * (1.0 - n * n)
        dr = dn_pre * hn
        dr_pre = dr * r * (1.0 - r)
        dz_pre = dz * z * (1.0 - z)
        dhn = dn_pre * r
        dgates_h = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)  # [B, 3H]
        dgates_x = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)

        zero = jnp.zeros_like(dgates_x)
        dxg_ref[t] = jnp.where(valid, dgates_x, zero).astype(dxg_ref.dtype)
        dgates_h = jnp.where(valid, dgates_h, zero)

        # bf16 mode: bf16 MXU operands, f32 accumulators (dw/db scratch).
        dg_lo = dgates_h.astype(whh_t_ref.dtype)
        dw_scratch[:] += jax.lax.dot_general(
            h_prev, dg_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, 3H]
        db_scratch[:] += jnp.sum(dgates_h, axis=0, keepdims=True)

        dh_prev = dht * z + jax.lax.dot_general(
            dg_lo, whh_t_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, H] = dgates_h @ whh_t.T
        return jnp.where(valid, dh_prev, dh)

    unroll = _pick_unroll(t_blk)

    def step(k, dh):
        # Iterate steps inside the chunk opposite to recurrence order,
        # unrolled (latency-bound loop).
        base_k = k * unroll
        for u in range(unroll):
            kk = base_k + u
            t = kk if reverse else (t_blk - 1 - kk)
            dh = one_step(t, dh)
        return dh

    dh_scratch[:] = jax.lax.fori_loop(0, t_blk // unroll, step, dh_scratch[:])
    # Last write wins: on the final grid step these hold the full sums and
    # the gradient w.r.t. the initial state.
    dwhh_t_ref[:] = dw_scratch[:]
    dbhh_ref[:] = db_scratch[:]
    dh0_ref[:] = dh_scratch[:]


def _gru_backward(x_gates_tm, w_hh, b_hh, h0, ys, dy, reverse: bool):
    t_total, batch, three_h = x_gates_tm.shape
    hidden = three_h // 3
    dt = x_gates_tm.dtype
    # Working set per time step: dy + hprev + xg + dxg blocks.
    t_blk = _pick_t_blk(batch * (2 * hidden + 2 * three_h) * dt.itemsize,
                        t_total)
    n_chunks = pl.cdiv(t_total, t_blk)
    whh_t = w_hh.T
    bhh2 = b_hh.reshape(1, three_h)

    # State entering each step in recurrence order:
    #   forward: h_prev[t] = ys[t-1], h_prev[0]    = h0
    #   reverse: h_prev[t] = ys[t+1], h_prev[T-1]  = h0
    if reverse:
        h_prev = jnp.concatenate([ys[1:], h0[None].astype(dt)], axis=0)
    else:
        h_prev = jnp.concatenate([h0[None].astype(dt), ys[:-1]], axis=0)

    def adj_map(i):
        return (i if reverse else (n_chunks - 1 - i), 0, 0)

    def rep2(i):
        return (0, 0)

    dxg, dwhh_t, dbhh, dh0 = pl.pallas_call(
        partial(_bwd_kernel, t_total=t_total, t_blk=t_blk, reverse=reverse),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((t_blk, batch, hidden), adj_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, batch, hidden), adj_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, batch, three_h), adj_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, three_h), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h), rep2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_blk, batch, three_h), adj_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, three_h), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), rep2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, batch, three_h), dt),
            jax.ShapeDtypeStruct((hidden, three_h), jnp.float32),
            jax.ShapeDtypeStruct((1, three_h), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((hidden, three_h), jnp.float32),
            pltpu.VMEM((1, three_h), jnp.float32),
        ],
        interpret=_interpret(),
    )(dy, h_prev, x_gates_tm, whh_t, bhh2)
    return dxg, dwhh_t.T, dbhh.reshape(three_h), dh0


# ---------------------------------------------------------------------------
# Fold-batched kernels
#
# vmapping a pallas_call (the sharded LOSO sweep vmaps the whole train step
# over a `fold` axis, parallel/fold_sweep.py) batches it by PREPENDING A GRID
# DIMENSION — on a TPU core grid steps run sequentially, so 15 folds pay 15x
# the recurrence's latency-bound wall time. These kernels instead carry the
# fold axis as a leading BATCH dimension inside one grid walk: every time
# step issues one fold-batched [F,B,H]x[F,H,3H] MXU matmul, so all folds'
# recurrences advance in parallel and the sweep's per-step cost approaches a
# single fold's. jax.custom_batching.custom_vmap routes vmap onto them.
# ---------------------------------------------------------------------------

def _fb_t_blk(per_step_bytes: int, t_total: int) -> int:
    """Time-chunk for fold-batched kernels: the fold axis multiplies the
    per-step working set, so chunks go as low as one step (time is a plain
    leading dim; only the trailing [B-ish, lane] dims need tile alignment)."""
    blk = max(_VMEM_BUDGET_BYTES // max(per_step_bytes, 1), 1)
    return min(blk, T_BLK, t_total)


# Max folds per fb kernel invocation. Shrinking the time chunk cannot save a
# too-large fold axis: the NON-time-blocked buffers (recurrent weights, the
# [F, B, 3H] bias broadcast, the f32 dW/dh scratches) scale linearly with F
# and alone approach the ~16 MB scoped-VMEM limit near F≈48 (observed 16.97M
# at 45 seed-replicated lanes). Larger lane counts run as sequential
# even-sized fold groups — each group a proven-size kernel; per-step MXU work
# is unchanged (the fold-batched matmuls were F-parallel only in VMEM
# residency, not in the single MXU's issue order).
# MMS_GRU_FB_MAX_FOLDS overrides the cap (e.g. 32 lets a 15-fold
# direction-batched sweep run 30 lanes as ONE kernel walk per layer instead
# of two sequential 15-lane groups — worth it only if the F-scaled buffers
# still fit scoped VMEM; RESOURCE_EXHAUSTED at compile means they did not).
_FB_MAX_FOLDS = 16


def _fb_max_folds() -> int:
    return int(os.environ.get("MMS_GRU_FB_MAX_FOLDS", _FB_MAX_FOLDS))


def _fold_slices(f: int) -> list[slice]:
    """Even-sized fold groups of at most _FB_MAX_FOLDS (sizes differ by <=1,
    so at most two distinct kernel shapes compile)."""
    n = -(-f // _fb_max_folds())
    bounds = np.linspace(0, f, n + 1).astype(int)
    return [slice(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:])]


def _fb_fwd_kernel(xg_ref, whh_t_ref, bhh_ref, h0_ref, out_ref, h_scratch,
                   *, t_total: int, t_blk: int, reverse: bool):
    """Fold-batched forward chunk.

    xg_ref  [F, T_BLK, B, 3H]   whh_t [F, H, 3H]   bhh [F, B, 3H]
    (bias pre-broadcast over B outside the kernel: Mosaic rejects an
    in-kernel size-1 sublane broadcast on 3D operands)
    h0      [F, B, H]           out   [F, T_BLK, B, H]
    h_scratch [F, B, H] carry across sequential grid steps.
    """
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        h_scratch[:] = h0_ref[:].astype(jnp.float32)

    chunk = (n_chunks - 1 - i) if reverse else i
    base = chunk * t_blk

    def one_step(t, h):
        valid = (base + t) < t_total
        xg = xg_ref[:, t]  # [F, B, 3H]
        # bf16 mode: f32 carry, bf16 MXU operands (same as _fwd_kernel).
        hg = jax.lax.dot_general(
            h.astype(whh_t_ref.dtype), whh_t_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + bhh_ref[:]
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h_new = jnp.where(valid, h_new, h)
        out_ref[:, t] = h_new.astype(out_ref.dtype)
        return h_new

    # t_blk is tiny (the fold axis multiplies the VMEM working set), so the
    # chunk loop is fully unrolled with STATIC time indices — Mosaic does not
    # support dynamic indexing on the middle dim of a 4D ref.
    h = h_scratch[:]
    for k in range(t_blk):
        t = (t_blk - 1 - k) if reverse else k
        h = one_step(t, h)
    h_scratch[:] = h


def _gru_forward_fb(xg_fb, w_hh, b_hh, h0, reverse: bool):
    """xg_fb [F, T, B, 3H], w_hh [F, 3H, H], b_hh [F, 3H], h0 [F, B, H]
    -> ys [F, T, B, H]."""
    f = xg_fb.shape[0]
    if f > _fb_max_folds():
        return jnp.concatenate([
            _gru_forward_fb(xg_fb[s], w_hh[s], b_hh[s], h0[s], reverse)
            for s in _fold_slices(f)
        ], axis=0)
    f, t_total, batch, three_h = xg_fb.shape
    hidden = three_h // 3
    dt = xg_fb.dtype  # f32, or bf16 (halved pipeline traffic)
    t_blk = _fb_t_blk(f * batch * (three_h + hidden) * dt.itemsize, t_total)
    n_chunks = pl.cdiv(t_total, t_blk)
    whh_t = jnp.swapaxes(w_hh, 1, 2)  # [F, H, 3H]
    bhh = jnp.broadcast_to(b_hh[:, None, :], (f, batch, three_h))

    def cmap(i):
        return (0, (n_chunks - 1 - i) if reverse else i, 0, 0)

    def rep3(i):
        return (0, 0, 0)

    return pl.pallas_call(
        partial(_fb_fwd_kernel, t_total=t_total, t_blk=t_blk, reverse=reverse),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((f, t_blk, batch, three_h), cmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hidden, three_h), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, batch, three_h), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, batch, hidden), rep3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f, t_blk, batch, hidden), cmap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, t_total, batch, hidden), dt),
        scratch_shapes=[pltpu.VMEM((f, batch, hidden), jnp.float32)],
        interpret=_interpret(),
    )(xg_fb, whh_t, bhh, h0)


def _fb_bwd_kernel(dy_ref, hprev_ref, xg_ref, whh_t_ref, bhh_ref,
                   dxg_ref, dwhh_t_ref, dbhh_ref, dh0_ref,
                   dh_scratch, dw_scratch, db_scratch,
                   *, t_total: int, t_blk: int, reverse: bool):
    """Fold-batched adjoint chunk (same math as _bwd_kernel, F-leading)."""
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)
        dw_scratch[:] = jnp.zeros_like(dw_scratch)
        db_scratch[:] = jnp.zeros_like(db_scratch)

    chunk = i if reverse else (n_chunks - 1 - i)
    base = chunk * t_blk

    def one_step(t, dh):
        valid = (base + t) < t_total
        # Mask the state itself (NaN/garbage padded reads poison dW).
        h_prev = jnp.where(valid, hprev_ref[:, t],
                           jnp.zeros((), hprev_ref.dtype))  # [F, B, H]
        xg = xg_ref[:, t]
        hg = jax.lax.dot_general(
            h_prev, whh_t_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + bhh_ref[:]
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)

        dht = dh + dy_ref[:, t]
        dz = dht * (h_prev - n)
        dn = dht * (1.0 - z)
        dn_pre = dn * (1.0 - n * n)
        dr = dn_pre * hn
        dr_pre = dr * r * (1.0 - r)
        dz_pre = dz * z * (1.0 - z)
        dhn = dn_pre * r
        dgates_h = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)  # [F,B,3H]
        dgates_x = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)

        zero = jnp.zeros_like(dgates_x)
        dxg_ref[:, t] = jnp.where(valid, dgates_x, zero).astype(dxg_ref.dtype)
        dgates_h = jnp.where(valid, dgates_h, zero)

        # bf16 mode: bf16 MXU operands, f32 accumulators (dw/db scratch).
        dg_lo = dgates_h.astype(whh_t_ref.dtype)
        dw_scratch[:] += jax.lax.dot_general(
            h_prev, dg_lo, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [F, H, 3H]
        db_scratch[:] += jnp.sum(dgates_h, axis=1)
        dh_prev = dht * z + jax.lax.dot_general(
            dg_lo, whh_t_ref[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [F, B, H]
        return jnp.where(valid, dh_prev, dh)

    dh = dh_scratch[:]
    for k in range(t_blk):  # static unroll (see _fb_fwd_kernel)
        t = k if reverse else (t_blk - 1 - k)
        dh = one_step(t, dh)
    dh_scratch[:] = dh
    dwhh_t_ref[:] = dw_scratch[:]
    dbhh_ref[:] = db_scratch[:]
    dh0_ref[:] = dh_scratch[:]


def _gru_backward_fb(xg_fb, w_hh, b_hh, h0, ys, dy, reverse: bool):
    f = xg_fb.shape[0]
    if f > _fb_max_folds():
        parts = [
            _gru_backward_fb(xg_fb[s], w_hh[s], b_hh[s], h0[s], ys[s], dy[s],
                             reverse)
            for s in _fold_slices(f)
        ]
        return tuple(
            jnp.concatenate(cols, axis=0) for cols in zip(*parts)
        )
    f, t_total, batch, three_h = xg_fb.shape
    hidden = three_h // 3
    dt = xg_fb.dtype
    t_blk = _fb_t_blk(f * batch * (2 * hidden + 2 * three_h) * dt.itemsize,
                      t_total)
    n_chunks = pl.cdiv(t_total, t_blk)
    whh_t = jnp.swapaxes(w_hh, 1, 2)
    bhh = jnp.broadcast_to(b_hh[:, None, :], (f, batch, three_h))

    if reverse:
        h_prev = jnp.concatenate([ys[:, 1:], h0[:, None].astype(dt)], axis=1)
    else:
        h_prev = jnp.concatenate([h0[:, None].astype(dt), ys[:, :-1]], axis=1)

    def adj(i):
        return (0, i if reverse else (n_chunks - 1 - i), 0, 0)

    def rep3(i):
        return (0, 0, 0)

    dxg, dwhh_t, dbhh, dh0 = pl.pallas_call(
        partial(_fb_bwd_kernel, t_total=t_total, t_blk=t_blk, reverse=reverse),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((f, t_blk, batch, hidden), adj, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, t_blk, batch, hidden), adj, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, t_blk, batch, three_h), adj, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hidden, three_h), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, batch, three_h), rep3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((f, t_blk, batch, three_h), adj, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hidden, three_h), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, three_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, batch, hidden), rep3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, t_total, batch, three_h), dt),
            jax.ShapeDtypeStruct((f, hidden, three_h), jnp.float32),
            jax.ShapeDtypeStruct((f, three_h), jnp.float32),
            jax.ShapeDtypeStruct((f, batch, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f, batch, hidden), jnp.float32),
            pltpu.VMEM((f, hidden, three_h), jnp.float32),
            pltpu.VMEM((f, three_h), jnp.float32),
        ],
        interpret=_interpret(),
    )(dy, h_prev, xg_fb, whh_t, bhh)
    return dxg, jnp.swapaxes(dwhh_t, 1, 2), dbhh, dh0


def _broadcast_unbatched(args, in_batched, axis_size):
    return tuple(
        a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        for a, b in zip(args, in_batched)
    )


# --- fold grouping: G folds share one block-diagonal MXU matmul -------------
#
# The fold-batched dot_general issues F small [B,H]x[H,3H] matmuls per time
# step; grouping packs G folds into one [B,G*H]x[G*H,3*G*H] block-diagonal
# contraction (hidden states fold-major along features, weights with
# GATE-MAJOR output columns so the kernels' split-by-gate math is unchanged;
# zero off-diagonal blocks cancel cross-fold terms exactly).
#
# NEGATIVE RESULT — off by default (benchmarks/RESULTS.md round 2): measured
# end-to-end on the 15-fold fusion3 sweep, grouping is ~35% SLOWER per epoch
# (5.34 vs 3.96 s) than the ungrouped fold-batched kernels. The zero blocks
# triple the contraction FLOPs, and the gate-major regrouping transposes the
# [F,B,T,3H] gate streams (hundreds of MB) on every layer/direction — both
# cost more than the batched small matmuls they replace. Kept opt-in via
# MMS_GRU_FOLD_GROUP>=2 with full parity tests.

_GROUP = 1


def _pick_group(f: int) -> int:
    # MMS_GRU_FOLD_GROUP=1 (default) disables grouping; >=2 enables it with
    # that preferred group size.
    top = int(os.environ.get("MMS_GRU_FOLD_GROUP", _GROUP))
    if top <= 1:
        return 1
    for g in (top, 4, 3, 2):
        if g <= top and f % g == 0:
            return g
    return 1


def _group_cols(x, fg: int, g: int):
    """[F, *lead, 3H] -> [Fg, *lead, 3*G*H] with gate-major columns."""
    lead = x.shape[1:-1]
    h = x.shape[-1] // 3
    n = len(lead)
    y = x.reshape((fg, g) + lead + (3, h))
    perm = (0,) + tuple(range(2, 2 + n)) + (2 + n, 1, 3 + n)
    return y.transpose(perm).reshape((fg,) + lead + (3 * g * h,))


def _ungroup_cols(y, fg: int, g: int):
    """Inverse of _group_cols."""
    lead = y.shape[1:-1]
    h = y.shape[-1] // (3 * g)
    n = len(lead)
    z = y.reshape((fg,) + lead + (3, g, h))
    perm = (0, 2 + n) + tuple(range(1, 1 + n)) + (1 + n, 3 + n)
    return z.transpose(perm).reshape((fg * g,) + lead + (3 * h,))


def _group_h(x, fg: int, g: int):
    """[F, *lead, H] -> [Fg, *lead, G*H] (fold-major columns)."""
    lead = x.shape[1:-1]
    h = x.shape[-1]
    n = len(lead)
    y = x.reshape((fg, g) + lead + (h,))
    perm = (0,) + tuple(range(2, 2 + n)) + (1, 2 + n)
    return y.transpose(perm).reshape((fg,) + lead + (g * h,))


def _ungroup_h(y, fg: int, g: int):
    """Inverse of _group_h."""
    lead = y.shape[1:-1]
    h = y.shape[-1] // g
    n = len(lead)
    z = y.reshape((fg,) + lead + (g, h))
    perm = (0, 1 + n) + tuple(range(1, 1 + n)) + (2 + n,)
    return z.transpose(perm).reshape((fg * g,) + lead + (h,))


def _blockdiag_w(w_hh, fg: int, g: int):
    """Per-fold [F, 3H, H] recurrent weights -> grouped block-diagonal
    [Fg, 3*G*H, G*H] in the w_hh layout the fb wrapper transposes."""
    f, three_h, h = w_hh.shape
    w = w_hh.reshape(fg, g, 3, h, h)  # [Fg, G, gate, H_out, H_in]
    eye = jnp.eye(g, dtype=w_hh.dtype)
    # rows (gate, G, H_out) gate-major; cols (G', H_in) fold-major; diag G=G'.
    wbd = jnp.einsum("fgtoi,gk->ftgoki", w, eye)
    return wbd.reshape(fg, 3 * g * h, g * h)


def _diag_dw(dwbd, fg: int, g: int):
    """Extract the diagonal fold blocks of the grouped dW: [Fg, 3GH, GH]
    (w_hh layout) -> per-fold [F, 3H, H]."""
    h = dwbd.shape[-1] // g
    z = dwbd.reshape(fg, 3, g, h, g, h)
    idx = jnp.arange(g)
    d = z[:, :, idx, :, idx, :]  # [G, Fg, 3, H_out, H_in]
    return jnp.transpose(d, (1, 0, 2, 3, 4)).reshape(fg * g, 3 * h, h)


# --- nested-vmap collapse: extra batch axes fold into the F axis ------------
#
# The fold-batched kernels themselves are custom_vmap'd so that a SECOND vmap
# level (e.g. the fold sweep vmapping a model whose BiGRU already
# direction-batches via impl="pallas_db") reshapes [A, F, ...] -> [A*F, ...]
# and re-enters the same kernels, instead of falling into XLA's batched-grid
# lowering of the inner pallas_call (round 1's measured-slower path). Any
# vmap nesting depth collapses this way; _FB_MAX_FOLDS grouping still bounds
# the per-kernel lane count.

def _collapse2(a):
    return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])


def _make_fwd_fb_cv(reverse: bool):
    @custom_vmap
    def fwd_fb(xg_fb, w_hh, b_hh, h0):
        return _gru_forward_fb(xg_fb, w_hh, b_hh, h0, reverse)

    @fwd_fb.def_vmap
    def _rule(axis_size, in_batched, xg, w_hh, b_hh, h0):  # noqa: F811
        xg, w_hh, b_hh, h0 = _broadcast_unbatched(
            (xg, w_hh, b_hh, h0), in_batched, axis_size
        )
        a, f = xg.shape[0], xg.shape[1]
        ys = fwd_fb(*(map(_collapse2, (xg, w_hh, b_hh, h0))))
        return ys.reshape((a, f) + ys.shape[1:]), True

    return fwd_fb


def _make_bwd_fb_cv(reverse: bool):
    @custom_vmap
    def bwd_fb(xg_fb, w_hh, b_hh, h0, ys, dy):
        return _gru_backward_fb(xg_fb, w_hh, b_hh, h0, ys, dy, reverse)

    @bwd_fb.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: F811
        args = _broadcast_unbatched(args, in_batched, axis_size)
        a, f = args[0].shape[0], args[0].shape[1]
        grads = bwd_fb(*(map(_collapse2, args)))
        return (
            tuple(g.reshape((a, f) + g.shape[1:]) for g in grads),
            (True, True, True, True),
        )

    return bwd_fb


_FWD_FB_CV = {False: _make_fwd_fb_cv(False), True: _make_fwd_fb_cv(True)}
_BWD_FB_CV = {False: _make_bwd_fb_cv(False), True: _make_bwd_fb_cv(True)}


def _make_fwd_cv(reverse: bool):
    @custom_vmap
    def fwd(x_gates_tm, w_hh, b_hh, h0):
        return _gru_forward(x_gates_tm, w_hh, b_hh, h0, reverse)

    @fwd.def_vmap
    def _rule(axis_size, in_batched, xg, w_hh, b_hh, h0):  # noqa: F811
        xg, w_hh, b_hh, h0 = _broadcast_unbatched(
            (xg, w_hh, b_hh, h0), in_batched, axis_size
        )
        g = _pick_group(axis_size)
        if g == 1:
            # The fb kernels are dtype-generic: bf16 streams/MXU operands
            # with an f32 carry, same mode as the single-fold kernels.
            # Routed via the fb-level custom_vmap so deeper vmap nesting
            # collapses into the fold axis.
            return _FWD_FB_CV[reverse](xg, w_hh, b_hh, h0), True
        # The grouped path (opt-in, measured negative result) stays f32:
        # block-diagonal packing in bf16 is not worth a separate mode.
        dt = xg.dtype
        if dt != jnp.float32:
            xg, w_hh, b_hh, h0 = (a.astype(jnp.float32)
                                  for a in (xg, w_hh, b_hh, h0))
        fg = axis_size // g
        ys_g = _gru_forward_fb(
            _group_cols(xg, fg, g), _blockdiag_w(w_hh, fg, g),
            _group_cols(b_hh, fg, g), _group_h(h0, fg, g), reverse,
        )
        return _ungroup_h(ys_g, fg, g).astype(dt), True

    return fwd


def _make_bwd_cv(reverse: bool):
    @custom_vmap
    def bwd(x_gates_tm, w_hh, b_hh, h0, ys, dy):
        return _gru_backward(x_gates_tm, w_hh, b_hh, h0, ys, dy, reverse)

    @bwd.def_vmap
    def _rule(axis_size, in_batched, xg, w_hh, b_hh, h0, ys, dy):  # noqa: F811
        args = _broadcast_unbatched(
            (xg, w_hh, b_hh, h0, ys, dy), in_batched, axis_size
        )
        dts = tuple(a.dtype for a in args[:4])
        g = _pick_group(axis_size)
        if g == 1:
            # Dtype-generic fb kernel: bf16 streams/MXU operands, f32 dW/db
            # accumulators; cotangents cast back to the primal dtypes.
            # (fb-level custom_vmap: deeper vmap nesting collapses into F.)
            grads = _BWD_FB_CV[reverse](*args)
        else:
            # Grouped opt-in path stays f32 (see the fwd rule).
            if any(dt != jnp.float32 for dt in dts):
                args = tuple(a.astype(jnp.float32) for a in args)
            grads = _rule_grouped(axis_size, g, *args)
        grads = tuple(g_.astype(dt) for g_, dt in zip(grads, dts))
        return grads, (True, True, True, True)

    def _rule_grouped(axis_size, g, xg, w_hh, b_hh, h0, ys, dy):
        fg = axis_size // g
        dxg_g, dwbd, dbhh_g, dh0_g = _gru_backward_fb(
            _group_cols(xg, fg, g), _blockdiag_w(w_hh, fg, g),
            _group_cols(b_hh, fg, g), _group_h(h0, fg, g),
            _group_h(ys, fg, g), _group_h(dy, fg, g), reverse,
        )
        return (_ungroup_cols(dxg_g, fg, g), _diag_dw(dwbd, fg, g),
                _ungroup_cols(dbhh_g, fg, g), _ungroup_h(dh0_g, fg, g))

    return bwd


_FWD_CV = {False: _make_fwd_cv(False), True: _make_fwd_cv(True)}
_BWD_CV = {False: _make_bwd_cv(False), True: _make_bwd_cv(True)}


# ---------------------------------------------------------------------------
# custom_vjp wrapper (time-major core)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gru_tm(reverse: bool, x_gates_tm, w_hh, b_hh, h0):
    return _FWD_CV[reverse](x_gates_tm, w_hh, b_hh, h0)


def _gru_tm_fwd(reverse, x_gates_tm, w_hh, b_hh, h0):
    ys = _FWD_CV[reverse](x_gates_tm, w_hh, b_hh, h0)
    return ys, (x_gates_tm, w_hh, b_hh, h0, ys)


def _gru_tm_bwd(reverse, res, dy):
    x_gates_tm, w_hh, b_hh, h0, ys = res
    dxg, dw, db, dh0 = _BWD_CV[reverse](x_gates_tm, w_hh, b_hh, h0, ys, dy)
    # bf16 mode keeps f32 accumulators for dW/db inside the kernel; the
    # cotangents must still match the primal dtypes at the custom_vjp
    # boundary (the f32 master params recover precision at the optax update).
    return (dxg.astype(x_gates_tm.dtype), dw.astype(w_hh.dtype),
            db.astype(b_hh.dtype), dh0.astype(h0.dtype))


_gru_tm.defvjp(_gru_tm_fwd, _gru_tm_bwd)


def gru_sequence_pallas(x_gates, w_hh, b_hh, h0, reverse: bool = False):
    """Drop-in for models.gru.gru_sequence: [B, T, 3H] gates -> [B, T, H].

    bf16 inputs select the bf16 kernel mode: the big time-major arrays
    (gates, outputs, their cotangents) and the MXU operands are bf16 —
    halved VMEM pipeline traffic and 1-pass (vs f32's 3-pass) MXU matmuls
    — while the hidden-state carry and dW/db accumulators stay f32. The
    initial state is always carried f32."""
    dt = (jnp.bfloat16 if x_gates.dtype == jnp.bfloat16 else jnp.float32)
    x_tm = jnp.swapaxes(x_gates, 0, 1).astype(dt)
    ys = _gru_tm(bool(reverse), x_tm, w_hh.astype(dt),
                 b_hh.astype(dt), h0.astype(jnp.float32))
    return jnp.swapaxes(ys, 0, 1)


# ---------------------------------------------------------------------------
# Fused bidirectional kernel
#
# The two directions of a BiGRU layer are independent recurrences, but as
# separate pallas_calls they execute SEQUENTIALLY on a TPU core. Packing
# direction as a leading batched dim (with the backward direction's gates
# pre-flipped in time so BOTH run a forward recurrence) runs them truly in
# parallel: one kernel, one grid walk, batched [2,B,H]x[2,H,3H] MXU matmuls.
# ---------------------------------------------------------------------------

def _bifwd_kernel(xg_ref, whh_t_ref, bhh_ref, h0_ref, out_ref, h_scratch,
                  *, t_total: int, t_blk: int):
    """xg [T_BLK, 2, B, 3H], whh_t [2, H, 3H], bhh [2, 3H], h0 [2, B, H]
    -> out [T_BLK, 2, B, H]; recurrence is forward-only (direction 1 is
    pre-flipped in time by the wrapper)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_scratch[:] = h0_ref[:]

    base = i * t_blk

    def step(t, h):
        valid = (base + t) < t_total
        xg = xg_ref[t]  # [2, B, 3H]
        # Per-direction 2D matmuls on static slices (a batched dot_general
        # with a leading dim of 2 trips Mosaic's retiling at these tile
        # shapes); both feed the same VPU gate math below.
        hg = jnp.stack([
            jnp.dot(h[d], whh_t_ref[d], preferred_element_type=jnp.float32)
            + bhh_ref[d]
            for d in (0, 1)
        ])
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h_new = jnp.where(valid, h_new, h)
        out_ref[t] = h_new
        return h_new

    h_scratch[:] = jax.lax.fori_loop(0, t_blk, step, h_scratch[:])


def _bigru_forward(xg2, whh2, bhh2, h02):
    t_total, two, batch, three_h = xg2.shape
    hidden = three_h // 3
    t_blk = _pick_t_blk(2 * batch * (three_h + hidden) * 4, t_total)
    n_chunks = pl.cdiv(t_total, t_blk)
    whh2_t = jnp.swapaxes(whh2, 1, 2)  # [2, H, 3H]
    bhh2d = bhh2.reshape(2, three_h)

    def cmap(i):
        return (i, 0, 0, 0)

    def rep(i):
        return (0, 0, 0)

    def rep2(i):
        return (0, 0)

    return pl.pallas_call(
        partial(_bifwd_kernel, t_total=t_total, t_blk=t_blk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((t_blk, 2, batch, three_h), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, three_h), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, three_h), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, batch, hidden), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_blk, 2, batch, hidden), cmap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_total, 2, batch, hidden), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, batch, hidden), jnp.float32)],
        interpret=_interpret(),
    )(xg2, whh2_t, bhh2d, h02)


def _bibwd_kernel(dy_ref, hprev_ref, xg_ref, whh_t_ref, bhh_ref,
                  dxg_ref, dwhh_t_ref, dbhh_ref, dh0_ref,
                  dh_scratch, dw_scratch, db_scratch,
                  *, t_total: int, t_blk: int):
    """Adjoint of the fused bidirectional recurrence (walks time backward)."""
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)
        dw_scratch[:] = jnp.zeros_like(dw_scratch)
        db_scratch[:] = jnp.zeros_like(db_scratch)

    base = (n_chunks - 1 - i) * t_blk

    def step(k, dh):
        t = t_blk - 1 - k
        valid = (base + t) < t_total
        h_prev = jnp.where(valid, hprev_ref[t], 0.0)  # [2, B, H]
        xg = xg_ref[t]
        hg = jnp.stack([
            jnp.dot(h_prev[d], whh_t_ref[d], preferred_element_type=jnp.float32)
            + bhh_ref[d]
            for d in (0, 1)
        ])
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)

        dht = dh + dy_ref[t]
        dz = dht * (h_prev - n)
        dn = dht * (1.0 - z)
        dn_pre = dn * (1.0 - n * n)
        dr = dn_pre * hn
        dr_pre = dr * r * (1.0 - r)
        dz_pre = dz * z * (1.0 - z)
        dhn = dn_pre * r
        dgates_h = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)
        dgates_x = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)

        zero = jnp.zeros_like(dgates_x)
        dxg_ref[t] = jnp.where(valid, dgates_x, zero)
        dgates_h = jnp.where(valid, dgates_h, zero)

        dw_scratch[:] += jnp.stack([
            jax.lax.dot_general(
                h_prev[d], dgates_h[d], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for d in (0, 1)
        ])  # [2, H, 3H]
        db_scratch[:] += jnp.sum(dgates_h, axis=1)
        dh_prev = dht * z + jnp.stack([
            jax.lax.dot_general(
                dgates_h[d], whh_t_ref[d], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for d in (0, 1)
        ])  # [2, B, H]
        return jnp.where(valid, dh_prev, dh)

    dh_scratch[:] = jax.lax.fori_loop(0, t_blk, step, dh_scratch[:])
    dwhh_t_ref[:] = dw_scratch[:]
    dbhh_ref[:] = db_scratch[:]
    dh0_ref[:] = dh_scratch[:]


def _bigru_backward(xg2, whh2, bhh2, h02, ys2, dy2):
    t_total, two, batch, three_h = xg2.shape
    hidden = three_h // 3
    t_blk = _pick_t_blk(2 * batch * (2 * hidden + 2 * three_h) * 4, t_total)
    n_chunks = pl.cdiv(t_total, t_blk)
    whh2_t = jnp.swapaxes(whh2, 1, 2)
    bhh2d = bhh2.reshape(2, three_h)
    h_prev = jnp.concatenate([h02[None], ys2[:-1]], axis=0)

    def adj(i):
        return (n_chunks - 1 - i, 0, 0, 0)

    def rep(i):
        return (0, 0, 0)

    def rep2(i):
        return (0, 0)

    dxg, dwhh_t, dbhh, dh0 = pl.pallas_call(
        partial(_bibwd_kernel, t_total=t_total, t_blk=t_blk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((t_blk, 2, batch, hidden), adj, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, 2, batch, hidden), adj, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, 2, batch, three_h), adj, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, three_h), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, three_h), rep2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_blk, 2, batch, three_h), adj, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, three_h), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, three_h), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, batch, hidden), rep, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, 2, batch, three_h), jnp.float32),
            jax.ShapeDtypeStruct((2, hidden, three_h), jnp.float32),
            jax.ShapeDtypeStruct((2, three_h), jnp.float32),
            jax.ShapeDtypeStruct((2, batch, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, batch, hidden), jnp.float32),
            pltpu.VMEM((2, hidden, three_h), jnp.float32),
            pltpu.VMEM((2, three_h), jnp.float32),
        ],
        interpret=_interpret(),
    )(dy2, h_prev, xg2, whh2_t, bhh2d)
    return dxg, jnp.swapaxes(dwhh_t, 1, 2), dbhh, dh0


@jax.custom_vjp
def _bigru_tm(xg2, whh2, bhh2, h02):
    return _bigru_forward(xg2, whh2, bhh2, h02)


def _bigru_tm_fwd(xg2, whh2, bhh2, h02):
    ys2 = _bigru_forward(xg2, whh2, bhh2, h02)
    return ys2, (xg2, whh2, bhh2, h02, ys2)


def _bigru_tm_bwd(res, dy2):
    xg2, whh2, bhh2, h02, ys2 = res
    return _bigru_backward(xg2, whh2, bhh2, h02, ys2, dy2)


_bigru_tm.defvjp(_bigru_tm_fwd, _bigru_tm_bwd)


def gru_bidirectional_pallas(x_gates_f, x_gates_b, w_hh_f, w_hh_b,
                             b_hh_f, b_hh_b, h0):
    """Both directions of one BiGRU layer in a single fused kernel.

    x_gates_* [B, T, 3H] (per-direction input projections); returns
    (ys_fwd, ys_bwd) each [B, T, H], both aligned to the original time order
    (like torch's bidirectional output). The backward direction is pre-flipped
    in time outside the kernel, so the kernel runs one forward recurrence over
    a direction-batched state.
    """
    f32 = jnp.float32
    xf = jnp.swapaxes(x_gates_f, 0, 1)                     # [T, B, 3H]
    xb = jnp.flip(jnp.swapaxes(x_gates_b, 0, 1), axis=0)   # time-reversed
    xg2 = jnp.stack([xf, xb], axis=1).astype(f32)          # [T, 2, B, 3H]
    whh2 = jnp.stack([w_hh_f, w_hh_b]).astype(f32)         # [2, 3H, H]
    bhh2 = jnp.stack([b_hh_f, b_hh_b]).astype(f32)         # [2, 3H]
    h02 = jnp.stack([h0, h0]).astype(f32)                  # [2, B, H]
    ys2 = _bigru_tm(xg2, whh2, bhh2, h02)                  # [T, 2, B, H]
    ys_f = jnp.swapaxes(ys2[:, 0], 0, 1)
    ys_b = jnp.swapaxes(jnp.flip(ys2[:, 1], axis=0), 0, 1)
    return ys_f, ys_b


def gru_bidirectional_dirbatch(x_gates_f, x_gates_b, w_hh_f, w_hh_b,
                               b_hh_f, b_hh_b, h0):
    """Both directions of one BiGRU layer as F=2 lanes of ONE fold-batched
    kernel walk (the backward direction's gates pre-flipped in time so both
    lanes run a forward recurrence).

    Differs from gru_bidirectional_pallas (the earlier direction-fused
    attempt, a measured negative result) in layout and machinery: instead of
    bespoke [T, 2, B, ...] kernels with two sequential per-direction matmuls
    per step, this stacks direction as the F-leading axis and vmaps the
    standard custom-VJP core, so the custom_vmap rules route it onto the
    fold-batched kernels (_gru_forward_fb/_gru_backward_fb): one batched
    [2,B,H]x[2,H,3H] MXU contraction per step, dtype-generic bf16 mode, and
    the same VMEM chunking proven at F=15 in the sharded sweep. One kernel
    walk of T sequential steps per layer instead of two.

    x_gates_* [B, T, 3H]; returns (ys_fwd, ys_bwd) each [B, T, H], both in
    original time order (torch bidirectional layout, reference models.py:56-63).
    """
    dt = (jnp.bfloat16 if x_gates_f.dtype == jnp.bfloat16 else jnp.float32)
    xf = jnp.swapaxes(x_gates_f, 0, 1)                     # [T, B, 3H]
    xb = jnp.flip(jnp.swapaxes(x_gates_b, 0, 1), axis=0)   # time-reversed
    xg = jnp.stack([xf, xb]).astype(dt)                    # [2, T, B, 3H]
    whh = jnp.stack([w_hh_f, w_hh_b]).astype(dt)           # [2, 3H, H]
    bhh = jnp.stack([b_hh_f, b_hh_b]).astype(dt)           # [2, 3H]
    h02 = jnp.stack([h0, h0]).astype(jnp.float32)          # [2, B, H]
    ys = jax.vmap(partial(_gru_tm, False))(xg, whh, bhh, h02)  # [2, T, B, H]
    ys_f = jnp.swapaxes(ys[0], 0, 1)
    ys_b = jnp.swapaxes(jnp.flip(ys[1], axis=0), 0, 1)
    return ys_f, ys_b
