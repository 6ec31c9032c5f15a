"""Sharded LOSO fold sweep: all folds in lockstep SPMD over a `fold` mesh axis.

The reference trains its 15 LOSO folds serially (reference main.py:98-125).
Here the complete cross-validation — per-fold init, every training epoch with
shuffling/early-stopping/LR-plateau, best-state tracking, and the final test
evaluation — runs vmapped over a `fold` axis and sharded across devices with
jax.sharding.Mesh + NamedSharding, in one of two dispatch modes:
"per_epoch" (default; one jitted all-folds program per epoch, host loop with
early exit) or "segmented" (a lax.scan of cfg.sweep_segment_epochs epochs
per device execution — fewer host round-trips, bounded execution length).
Both are bit-identical. The whole-sweep-as-one-program "fused" mode was
retired: its multi-minute single execution crashed the tunneled runtime
(benchmarks/RESULTS.md 'Dispatch modes'). Device count does not need to
divide the fold count: folds are padded with inert replicas whose results
are dropped.

Key design points (SURVEY.md §7 "Hard parts"):
  * Ragged folds: subjects have different window counts, so per-fold index
    POOLS (packed valid-first, zero-padded) select windows from one flat,
    replicated corpus; every fold runs the same [epochs, steps, B] schedule
    with 0/1 sample weights.
  * In-graph shuffling: per-epoch batch order comes from jax.random inside
    the scan (sort of uniform scores with invalid positions pushed last) —
    no host round-trip per epoch.
  * Early stopping in a lockstep sweep: folds can't exit a sharded
    computation early, so every fold runs the fixed epoch horizon with
    updates MASKED once its patience fires; best (params, batch_stats) are
    tracked in-graph via whole-tree selects (the reference's checkpointing,
    trainer.py:38-39, becomes a select instead of a file write).
  * BatchNorm running stats and Adam moments live in the per-fold pytree —
    never shared across folds.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalsignal_tpu.config import ExperimentConfig, save_config
from multimodalsignal_tpu.data.dataset import (
    PackedCorpus,
    pack_corpus,
    pack_corpus_from_pickles,
    pack_hybrid_corpus,
    experiment_preprocess_meta,
    read_channel_names,
)
from multimodalsignal_tpu.experiments.loso import FoldResult, write_cv_summary
from multimodalsignal_tpu.experiments.splits import loso_folds
from multimodalsignal_tpu.models import build_model
from multimodalsignal_tpu.parallel import multihost
from multimodalsignal_tpu.train import metrics as M
from multimodalsignal_tpu.train.optim import (
    early_stopping_init,
    early_stopping_update,
    make_optimizer,
    plateau_init,
    plateau_update,
)
from multimodalsignal_tpu.train.trainer import TrainState, cross_entropy
from multimodalsignal_tpu.utils.rng import (
    as_dropout_key,
    resolve_dropout_rng_impl,
)


# ---------------------------------------------------------------------------
# Fold batch construction (host side)
# ---------------------------------------------------------------------------

@dataclass
class FoldBatch:
    """Per-fold index pools into the flat corpus, padded to common sizes.

    pools are packed valid-first: pool[f, :n[f]] are flat window indices
    (subject * Wmax + window) of real windows; the rest is zero padding.
    The fold axis may be padded beyond the real fold count (fold_valid=False)
    so it divides the device count.
    """

    train_pool: np.ndarray  # [F, Ptr] int32
    n_train: np.ndarray     # [F] int32
    val_pool: np.ndarray    # [F, Pva] int32
    n_val: np.ndarray       # [F] int32
    test_pool: np.ndarray   # [F, Pte] int32
    n_test: np.ndarray      # [F] int32
    fold_valid: np.ndarray  # [F] bool
    test_subjects: tuple[str, ...]  # real folds only


def _pack_pools(pools: list[np.ndarray], pad_to_folds: int) -> tuple[np.ndarray, np.ndarray]:
    size = max(max(len(p) for p in pools), 1)
    out = np.zeros((pad_to_folds, size), dtype=np.int32)
    n = np.zeros(pad_to_folds, dtype=np.int32)
    for i, p in enumerate(pools):
        out[i, : len(p)] = p
        # Pad with the fold's OWN first window, not global index 0: padded
        # (zero-weight) rows still enter train-mode BatchNorm batch statistics
        # in the boundary batch, and flat index 0 is subject row 0 — the
        # held-out test subject in one fold. Within-fold padding keeps BN
        # stats free of cross-fold/test-subject contamination.
        if len(p) > 0:
            out[i, len(p):] = p[0]
        n[i] = len(p)
    return out, n


def build_fold_batch(
    corpus: PackedCorpus,
    subjects: list[str],
    val_fraction: float = 0.2,
    seed: int = 42,
    pad_folds_to: int | None = None,
) -> FoldBatch:
    """Turn LOSO fold specs (reference main.py:98-103 splits) into index pools."""
    sid_to_row = {sid: i for i, sid in enumerate(corpus.subjects)}
    wmax = corpus.x.shape[1]
    folds = loso_folds(subjects, val_fraction, seed)
    folds = [f for f in folds if f.test_subject in sid_to_row]

    def pool_for(sids) -> np.ndarray:
        parts = []
        for sid in sids:
            if sid not in sid_to_row:
                continue
            row = sid_to_row[sid]
            w = np.nonzero(corpus.mask[row])[0]
            parts.append(row * wmax + w)
        return np.concatenate(parts) if parts else np.zeros(0, np.int64)

    num_real = len(folds)
    total = pad_folds_to or num_real
    train_pool, n_train = _pack_pools([pool_for(f.train_subjects) for f in folds], total)
    val_pool, n_val = _pack_pools([pool_for(f.val_subjects) for f in folds], total)
    test_pool, n_test = _pack_pools([pool_for([f.test_subject]) for f in folds], total)
    fold_valid = np.zeros(total, dtype=bool)
    fold_valid[:num_real] = True
    # Inert padded folds reuse fold 0's pools (same shapes, results dropped).
    for arr, n_arr in ((train_pool, n_train), (val_pool, n_val), (test_pool, n_test)):
        arr[num_real:] = arr[0]
        n_arr[num_real:] = n_arr[0]
    return FoldBatch(
        train_pool, n_train, val_pool, n_val, test_pool, n_test,
        fold_valid, tuple(f.test_subject for f in folds),
    )


def make_fold_mesh(num_folds: int, devices=None) -> tuple[Mesh, int]:
    """1-D `fold` mesh over available devices; returns (mesh, padded fold
    count divisible by the device count).

    After `multihost.initialize` (or `jax.distributed.initialize`),
    `jax.devices()` is the GLOBAL list across all processes, so the same
    call builds a mesh spanning every host in the job — the sweep program
    is unchanged; only host-side array movement differs (multihost.py)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    d = len(devices)
    padded = -(-num_folds // d) * d
    return Mesh(devices, axis_names=("fold",)), padded


# ---------------------------------------------------------------------------
# In-graph batch schedules
# ---------------------------------------------------------------------------

def _shuffled_grid(rng, pool, n_valid, steps: int, batch_size: int):
    """[steps, B] flat corpus indices + 0/1 weights, shuffled in-graph.

    Sorting uniform scores with invalid pool positions pushed last yields a
    uniform permutation of the n_valid real windows at the front.
    """
    p = pool.shape[0]
    total = steps * batch_size
    scores = jax.random.uniform(rng, (p,)) + 2.0 * (jnp.arange(p) >= n_valid)
    order = jnp.argsort(scores)
    take = jnp.arange(total) % p
    idx = pool[order[take]]
    w = (jnp.arange(total) < n_valid).astype(jnp.float32)
    return idx.reshape(steps, batch_size), w.reshape(steps, batch_size)


def _sequential_grid(pool, n_valid, steps: int, batch_size: int):
    """Deterministic eval grid (reference eval loaders never shuffle)."""
    p = pool.shape[0]
    total = steps * batch_size
    take = jnp.arange(total) % p
    idx = pool[take]
    w = (jnp.arange(total) < n_valid).astype(jnp.float32)
    return idx.reshape(steps, batch_size), w.reshape(steps, batch_size)


# ---------------------------------------------------------------------------
# Single-fold program (vmapped over folds)
# ---------------------------------------------------------------------------

class SweepHistory(NamedTuple):
    train_loss: jnp.ndarray  # [E]
    val_loss: jnp.ndarray    # [E]
    val_acc: jnp.ndarray     # [E]
    val_f1: jnp.ndarray      # [E]
    lr: jnp.ndarray          # [E]


class SweepResult(NamedTuple):
    history: SweepHistory
    best_epoch: jnp.ndarray     # [] int32
    stop_epoch: jnp.ndarray     # [] int32 (epochs actually "run" before mask)
    test_loss: jnp.ndarray      # []
    test_cm: jnp.ndarray        # [num_classes, num_classes]
    # Final (best-restored) inference state, stacked over folds — feeds
    # downstream composed inference (hierarchical path) and checkpoint export.
    final_params: Any = None
    final_batch_stats: Any = None
    # Per-window test softmax probabilities [steps_te*B, C] (wrap-padded
    # grid; trim to n_test per fold) — reference trainer.py:224-231.
    test_probs: Any = None


def _take(x, idx):
    """Gather batch `idx` from the flat corpus. `x` is a plain [N, C, T]
    array for raw-only sweeps or a pytree ((raw [N, C, T], feat [N, F]))
    for hybrid sweeps — index pools address both streams identically."""
    return jax.tree_util.tree_map(lambda a: a[idx], x)


def _make_fold_program(model, tx, cfg: ExperimentConfig, steps_tr: int,
                       steps_va: int, steps_te: int, num_classes: int):
    tcfg = cfg.trainer
    es_cfg = tcfg.early_stopping
    batch = tcfg.batch_size

    rng_impl = resolve_dropout_rng_impl(tcfg.dropout_rng)

    def apply_train(params, batch_stats, xb, dropout_rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            xb, train=True,
            rngs={"dropout": as_dropout_key(dropout_rng, rng_impl)},
            mutable=["batch_stats"],
        )

    if tcfg.remat:
        # All folds' activations are live at once in the vmapped step;
        # recompute them in the backward instead of storing them.
        apply_train = jax.checkpoint(apply_train)

    def loss_and_grads(state: TrainState, x, y, xb_idx, wb, dropout_rng, cw):
        def loss_fn(params):
            logits, new_bs = apply_train(
                params, state.batch_stats, _take(x, xb_idx), dropout_rng
            )
            loss, wsum = cross_entropy(logits, y[xb_idx], wb, cw)
            return loss, (new_bs["batch_stats"], wsum)

        (loss, (new_bs, wsum)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return loss, wsum, new_bs, grads

    def eval_pass(state: TrainState, x, y, idx, w, cw):
        """Returns (mean loss, confusion matrix, softmax probs [steps*B, C])
        — probs mirror the reference's eval-time collection
        (trainer.py:224-231); the epoch path discards them (dead-code
        eliminated by XLA), the test finalize exports them."""
        def step(carry, inp):
            loss_sum, w_sum, cm = carry
            bi, wb = inp
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                _take(x, bi), train=False,
            )
            loss, wsum = cross_entropy(logits, y[bi], wb, cw)
            preds = jnp.argmax(logits, axis=-1)
            cm = cm + M.confusion_matrix(y[bi], preds, num_classes, wb)
            return (loss_sum + loss * wsum, w_sum + wsum, cm), jax.nn.softmax(logits, axis=-1)

        init = (jnp.zeros(()), jnp.zeros(()), jnp.zeros((num_classes, num_classes)))
        (loss_sum, w_sum, cm), probs = jax.lax.scan(step, init, (idx, w))
        return (loss_sum / jnp.maximum(w_sum, 1e-12), cm,
                probs.reshape(-1, num_classes))

    def epoch_program(x, y, fb_train_pool, fb_n_train, fb_val_pool, fb_n_val,
                      fb_cw, carry, epoch):
        """One training epoch of ONE fold (vmapped over folds); masked to a
        no-op once the fold has early-stopped. fb_cw [num_classes] is the
        fold's per-class loss weighting (ones when
        trainer.use_class_weights is off — exact no-op)."""
        val_idx, val_w = _sequential_grid(fb_val_pool, fb_n_val, steps_va, batch)

        def epoch_body(carry, epoch):
            state, best, es, pl, rng, stopped = carry
            rng, shuffle_rng, drop_rng = jax.random.split(rng, 3)
            idx, w = _shuffled_grid(shuffle_rng, fb_train_pool, fb_n_train,
                                    steps_tr, batch)

            def train_step(scarry, inp):
                st, drng, loss_sum, w_sum = scarry
                bi, wb = inp
                drng, d = jax.random.split(drng)
                loss, wsum, new_bs, grads = loss_and_grads(st, x, y, bi, wb, d,
                                                           fb_cw)
                updates, new_opt = tx.update(grads, st.opt_state, st.params)
                new_params = optax.apply_updates(st.params, updates)
                valid = wb.sum() > 0
                new_st = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(valid, new, old),
                    TrainState(new_params, new_bs, new_opt), st,
                )
                return (new_st, drng, loss_sum + jnp.where(valid, loss * wsum, 0.0),
                        w_sum + wsum), None

            (new_state, _, loss_sum, w_sum), _ = jax.lax.scan(
                train_step, (state, drop_rng, jnp.zeros(()), jnp.zeros(())), (idx, w)
            )
            train_loss = loss_sum / jnp.maximum(w_sum, 1e-12)

            val_loss, val_cm, _ = eval_pass(new_state, x, y, val_idx, val_w,
                                            fb_cw)
            val_acc = M.accuracy_from_cm(val_cm)
            val_f1 = M.weighted_f1_from_cm(val_cm)

            new_pl = plateau_update(
                pl, val_loss, factor=tcfg.lr_plateau_factor,
                patience=tcfg.lr_plateau_patience, threshold=tcfg.lr_plateau_threshold,
            )
            new_state.opt_state.hyperparams["learning_rate"] = new_pl.lr
            new_es = early_stopping_update(
                es, val_loss, epoch, patience=es_cfg.patience, delta=es_cfg.delta,
                legacy_inverted=es_cfg.legacy_inverted,
            )
            new_best = jax.tree_util.tree_map(
                lambda b, s: jnp.where(
                    jnp.logical_and(new_es.improved, jnp.logical_not(stopped)), s, b
                ),
                best, (new_state.params, new_state.batch_stats),
            )
            # Once stopped, the fold coasts: state/schedules frozen.
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(stopped, b, a), new, old
            )
            state = keep(new_state, state)
            es = keep(new_es, es)
            pl = keep(new_pl, pl)
            new_stopped = jnp.logical_or(
                stopped, jnp.logical_and(es_cfg.enabled, es.should_stop)
            )
            log = (train_loss, val_loss, val_acc, val_f1, pl.lr,
                   jnp.logical_not(stopped))
            return (state, new_best, es, pl, rng, new_stopped), log

        return epoch_body(carry, epoch)

    def init_carry(init_state: TrainState, rng):
        es0 = early_stopping_init()
        pl0 = plateau_init(tcfg.learning_rate)
        best0 = (init_state.params, init_state.batch_stats)
        return (init_state, best0, es0, pl0, rng, jnp.asarray(False))

    def finalize_program(x, y, fb_test_pool, fb_n_test, fb_cw, carry):
        """Restore the best state and evaluate the held-out subject."""
        state, best, es, pl, _, _ = carry
        # Reference default here: always restore the best checkpoint
        # (fixed variant of reference trainer.py:185-187).
        best_params, best_bs = best
        restore = jnp.logical_not(
            jnp.asarray(tcfg.legacy_restore_only_on_early_stop)
        ) | es.should_stop
        final_state = jax.tree_util.tree_map(
            lambda b, s: jnp.where(jnp.logical_and(es_cfg.enabled, restore), b, s),
            TrainState(best_params, best_bs, state.opt_state), state,
        )
        test_idx, test_w = _sequential_grid(fb_test_pool, fb_n_test, steps_te, batch)
        test_loss, test_cm, test_probs = eval_pass(final_state, x, y,
                                                   test_idx, test_w, fb_cw)
        return (test_loss, test_cm, es.best_epoch,
                final_state.params, final_state.batch_stats, test_probs)

    def make_segment(seg_len: int):
        """Segmented dispatch: scan seg_len epochs of ONE fold in a single
        device execution. Bit-identical to seg_len calls of epoch_program
        (same body, sequential semantics); stopped folds coast inside the
        segment exactly as they do across per-epoch dispatches. This
        replaced the retired whole-sweep "fused" while_loop, whose single
        multi-minute execution crashed the tunneled runtime
        (benchmarks/RESULTS.md 'Dispatch modes')."""

        def segment_program(x, y, fb_train_pool, fb_n_train, fb_val_pool,
                            fb_n_val, fb_cw, carry, epoch0):
            def body(c, e):
                return epoch_program(x, y, fb_train_pool, fb_n_train,
                                     fb_val_pool, fb_n_val, fb_cw, c, e)

            return jax.lax.scan(body, carry,
                                epoch0 + jnp.arange(seg_len, dtype=jnp.int32))

        return segment_program

    return {
        "epoch": epoch_program,
        "init_carry": init_carry,
        "finalize": finalize_program,
        "make_segment": make_segment,
    }


# ---------------------------------------------------------------------------
# Sweep driver
# ---------------------------------------------------------------------------

class SweepAborted(RuntimeError):
    """Raised by run_fold_sweep's abort_after_epoch preemption drill."""


_RESUME_STATE = "sweep_resume.msgpack"
_RESUME_LOGS = "sweep_resume_logs.npz"
_RESUME_META = "sweep_resume_meta.json"


def _save_sweep_resume(run_dir: Path, carry, logs: list, next_epoch: int) -> None:
    """Persist the complete sweep carry + per-epoch logs. The carry holds
    every fold's params/BN stats/Adam moments/best state/early-stop &
    plateau machines/RNG/stop flag, so restoring it resumes training
    bit-exactly."""
    import json

    from multimodalsignal_tpu.train.checkpoints import save_state

    save_state(run_dir / _RESUME_STATE, carry)
    stacked = {f"c{j}": np.stack(col, axis=1) for j, col in enumerate(zip(*logs))}
    np.savez(run_dir / _RESUME_LOGS, **stacked)
    (run_dir / _RESUME_META).write_text(json.dumps({"next_epoch": next_epoch}))


def _load_sweep_resume(run_dir: Path, carry_template):
    """Restore (carry, logs, next_epoch) or None when no checkpoint exists."""
    import json

    from multimodalsignal_tpu.train.checkpoints import restore_state

    state_path = run_dir / _RESUME_STATE
    if not state_path.exists():
        return None
    next_epoch = int(json.loads((run_dir / _RESUME_META).read_text())["next_epoch"])
    template = jax.tree_util.tree_map(np.asarray, carry_template)
    carry = restore_state(state_path, template)
    with np.load(run_dir / _RESUME_LOGS) as data:
        cols = [data[f"c{j}"] for j in range(len(data.files))]
    logs = [tuple(c[:, e] for c in cols) for e in range(next_epoch)]
    return carry, logs, next_epoch


def run_fold_sweep(
    corpus: PackedCorpus,
    fb: FoldBatch,
    cfg: ExperimentConfig,
    mesh: Mesh | None = None,
    dispatch: str | None = None,
    run_dir: Path | str | None = None,
    abort_after_epoch: int | None = None,
    seeds: tuple[int, ...] | None = None,
) -> SweepResult:
    """Run every fold as one sharded, vmapped computation; returns per-fold
    stacked SweepResult (fold axis first, padded folds included).

    dispatch: "per_epoch" (default) jits one all-folds epoch program and
    loops epochs host-side; "segmented" scans cfg.sweep_segment_epochs
    epochs per device execution (bit-identical results, fewer host
    round-trips; early exit at segment granularity).

    Fault tolerance (per_epoch only; SURVEY.md §5 checkpoint/resume): with
    `run_dir` set and cfg.trainer.checkpoint_every > 0, the complete sweep
    carry (per-fold train state, best state, early-stop/plateau machines,
    RNG streams, stop flags) plus the epoch logs are persisted every N
    epochs; cfg.trainer.resume=True restores them and continues — the final
    metrics are bit-identical to an uninterrupted run because the carry IS
    the whole training state. `abort_after_epoch` simulates preemption
    (raises SweepAborted right after that epoch's checkpoint) for tests/ops
    drills."""
    num_folds = fb.train_pool.shape[0]
    if mesh is None:
        mesh, padded = make_fold_mesh(num_folds)
        assert padded == num_folds, (
            f"FoldBatch must be padded to the device count: {num_folds} vs {padded}"
        )

    model = build_model(cfg.model, cfg.num_classes, fold_parallel=True)
    tx = make_optimizer(cfg.trainer.learning_rate, cfg.trainer.weight_decay)
    batch = cfg.trainer.batch_size

    dispatch = dispatch or getattr(cfg, "sweep_dispatch", "per_epoch")
    x_flat, y_flat, _ = corpus.flat()
    # Keep the corpus as HOST numpy until put_global: in multi-process runs
    # put_global reads numpy per leaf, and an eager jnp.asarray here would
    # cost a redundant device->host->device round trip of the whole corpus.
    x = np.asarray(x_flat, np.float32)
    feat_flat = corpus.flat_feat()
    if feat_flat is not None:
        # Hybrid corpus: the model input pytree is (raw, feat); both streams
        # share the window index space, so every pool gather serves both.
        x = (x, np.asarray(feat_flat, np.float32))
    y = np.asarray(y_flat, np.int32)

    steps_tr = max(-(-int(fb.n_train.max()) // batch), 1)
    steps_va = max(-(-int(fb.n_val.max()) // batch), 1)
    steps_te = max(-(-int(fb.n_test.max()) // batch), 1)

    # Per-fold independent init (reference builds a fresh model per fold,
    # main.py:116-117); BN stats and Adam moments stay fold-local.
    if seeds is None:
        fold_rngs = jax.random.split(jax.random.PRNGKey(cfg.seed), num_folds)
    else:
        # Seed-replicated sweep (replicated_sweep.py): the fold axis holds
        # len(seeds) tiled copies of the fold batch. Each seed group gets
        # exactly the RNG streams a plain run with cfg.seed=s would get, so
        # group s of the replicated sweep is bit-identical to that run.
        per = num_folds // len(seeds)
        assert per * len(seeds) == num_folds, (num_folds, seeds)
        fold_rngs = jnp.concatenate([
            jax.random.split(jax.random.PRNGKey(s), per) for s in seeds
        ])
    sample = _take(x, jnp.arange(1))

    def init_fold(rng):
        init_rng, run_rng = jax.random.split(rng)
        variables = model.init(init_rng, sample, train=False)
        return TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        ), run_rng

    init_states, run_rngs = jax.vmap(init_fold)(fold_rngs)

    programs = _make_fold_program(
        model, tx, cfg, steps_tr, steps_va, steps_te, cfg.num_classes
    )

    fold_sharding = NamedSharding(mesh, P("fold"))
    repl = NamedSharding(mesh, P())

    # multihost.put_global == jax.device_put single-process; in a
    # multi-process job it scatters each process's identical host copy onto
    # the global sharding (corpus replicated, fold state fold-sharded).
    def put_folded(tree):
        return multihost.put_global(tree, fold_sharding)

    x_dev = multihost.put_global(x, repl)
    y_dev = multihost.put_global(y, repl)
    # fb.* are already host numpy — hand them to put_global as-is (same
    # rationale as the corpus comment above: an eager jnp.asarray would
    # bounce each pool device->host->device before the scatter).
    tr_pool = put_folded(fb.train_pool)
    n_tr = put_folded(fb.n_train)
    va_pool = put_folded(fb.val_pool)
    n_va = put_folded(fb.n_val)
    te_pool = put_folded(fb.test_pool)
    n_te = put_folded(fb.n_test)
    init_states = put_folded(init_states)
    run_rngs = put_folded(run_rngs)

    # Per-fold class weights (reference's intended-but-dead branch,
    # trainer.py:80-97; the serial path's balanced_class_weights). Ones when
    # disabled — an exact no-op in the loss, so one compiled program serves
    # both settings.
    if cfg.trainer.use_class_weights:
        from multimodalsignal_tpu.experiments.loso import balanced_class_weights

        cw_np = np.stack([
            balanced_class_weights(
                np.asarray(y_flat)[fb.train_pool[i, :int(fb.n_train[i])]],
                cfg.num_classes,
            )
            for i in range(num_folds)
        ])
    else:
        cw_np = np.ones((num_folds, cfg.num_classes), np.float32)
    fb_cw = put_folded(cw_np)

    if dispatch not in ("per_epoch", "segmented"):
        raise ValueError(
            f"unknown sweep dispatch {dispatch!r}: expected 'per_epoch' or "
            "'segmented' (the whole-sweep 'fused' mode was retired — its "
            "single multi-minute execution crashed the tunneled runtime; "
            "benchmarks/RESULTS.md 'Dispatch modes')"
        )

    # "per_epoch" (default): one short XLA execution per epoch, all folds in
    # lockstep — compiles one epoch program (minutes less compile time on
    # remote-compiled TPU runtimes), keeps device executions short, and
    # gives the host per-epoch progress + exit as soon as every fold has
    # stopped. "segmented": scans cfg.sweep_segment_epochs epochs per
    # execution — same math (bit-identity pinned by
    # tests/test_fold_sweep.py::test_dispatch_modes_equivalent), fewer host
    # round-trips, early exit at segment granularity.
    epoch_fn = jax.jit(
        jax.vmap(programs["epoch"],
                 in_axes=(None, None, 0, 0, 0, 0, 0, 0, None)),
    )
    finalize_fn = jax.jit(
        jax.vmap(programs["finalize"], in_axes=(None, None, 0, 0, 0, 0))
    )
    carry = jax.jit(jax.vmap(programs["init_carry"]),
                    out_shardings=fold_sharding)(init_states, run_rngs)

    epochs = cfg.trainer.epochs
    logs: list = []
    start_epoch = 0
    checkpoint_every = cfg.trainer.checkpoint_every if run_dir else 0
    # resume is only live when there is BOTH a run_dir and an existing
    # sweep_resume checkpoint in it (the restore below is gated the same
    # way); a config harmlessly carrying resume=True with no run_dir or a
    # fresh run dir must not reject segmented dispatch. The existence
    # check is a filesystem read, so multi-process it must AGREE before it
    # can gate a raise: with divergent (non-shared) run dirs one process
    # raising here while the rest proceed into the mesh collectives would
    # hang the job instead of failing loudly.
    resume_live = (cfg.trainer.resume and run_dir is not None
                   and (Path(run_dir) / _RESUME_STATE).exists())
    if dispatch == "segmented" and cfg.trainer.resume and run_dir is not None:
        # (per_epoch runs the same agreement check on `exists` below.)
        multihost.assert_agreement(int(resume_live),
                                   "segmented-guard resume existence")
    if dispatch == "segmented" and (checkpoint_every > 0
                                    or resume_live
                                    or abort_after_epoch is not None):
        # Raised BEFORE the resume-restore below: a stale per_epoch
        # sweep_resume.msgpack must never be silently restored into a mode
        # whose epoch schedule differs.
        raise ValueError(
            "checkpoint/resume and the preemption drill are per_epoch "
            "features (they need an epoch-granular host boundary); "
            "segmented dispatch does not support them"
        )
    if run_dir is not None and cfg.trainer.resume:
        # Check existence BEFORE gathering the carry template: the gather is
        # a full cross-host transfer of every fold's state and is wasted on
        # the (normal) first launch of a resumable job. Every process must
        # see the same checkpoint — a divergence (non-shared run dir) would
        # desynchronize the collective schedule, so fail loudly instead.
        exists = (Path(run_dir) / _RESUME_STATE).exists()
        multihost.assert_agreement(int(exists), "sweep_resume existence")
        restored = None
        if exists:
            # Template must be host-local (restore_state reads into numpy);
            # to_host gathers the (init-fresh, tiny) carry multi-process.
            restored = _load_sweep_resume(Path(run_dir),
                                          multihost.to_host(carry, mesh))
        if restored is not None:
            carry, logs, start_epoch = restored
            multihost.assert_agreement(start_epoch, "resume epoch")
            carry = multihost.put_global(carry, fold_sharding)
            if multihost.is_primary():
                print(f"  resumed sweep from epoch {start_epoch}", flush=True)

    epochs_ran = start_epoch
    t_train = time.time()
    with mesh:
        if dispatch == "segmented":
            seg = max(int(cfg.sweep_segment_epochs), 1)
            seg_fns: dict = {}

            def seg_fn(seg_len: int):
                # One compiled program per segment length: the full-length
                # program plus at most one remainder-length program.
                fn = seg_fns.get(seg_len)
                if fn is None:
                    fn = jax.jit(
                        jax.vmap(programs["make_segment"](seg_len),
                                 in_axes=(None, None, 0, 0, 0, 0, 0, 0,
                                          None)),
                        donate_argnums=(7,),  # carry reused across segments
                    )
                    seg_fns[seg_len] = fn
                return fn

            epoch = start_epoch
            while epoch < epochs:
                seg_len = min(seg, epochs - epoch)
                carry, seg_logs = seg_fn(seg_len)(
                    x_dev, y_dev, tr_pool, n_tr, va_pool, n_va, fb_cw,
                    carry, jnp.asarray(epoch, jnp.int32))
                # seg_logs leaves are [F, seg_len] (scan axis under vmap).
                host_logs = multihost.to_host(seg_logs, mesh)
                for e in range(seg_len):
                    logs.append(tuple(leaf[:, e] for leaf in host_logs))
                epoch += seg_len
                stopped = multihost.to_host(carry[5], mesh)
                if multihost.is_primary():
                    val_loss = np.asarray(logs[-1][1])
                    print(f"  epoch {epoch}/{epochs} (segment of {seg_len})"
                          f" | mean val loss {float(val_loss.mean()):.4f} | "
                          f"{int((~stopped).sum())} folds active | "
                          f"{time.time() - t_train:.1f}s", flush=True)
                if stopped.all():
                    break
            # Trim trailing all-coasting epochs (every fold stopped before
            # them) so logs end exactly where per_epoch dispatch — which
            # exits the moment stopped.all() — would have ended.
            while logs and not np.asarray(logs[-1][5]).any():
                logs.pop()
            epochs_ran = len(logs)
        else:
            for epoch in range(start_epoch, epochs):
                carry, log = epoch_fn(x_dev, y_dev, tr_pool, n_tr, va_pool,
                                      n_va, fb_cw, carry,
                                      jnp.asarray(epoch, jnp.int32))
                # The per-epoch log + stop-flag gather is the sweep's only
                # recurring cross-host traffic: a few KB over DCN per epoch.
                logs.append(multihost.to_host(log, mesh))
                epochs_ran = epoch + 1
                stopped = multihost.to_host(carry[5], mesh)
                if (epoch == start_epoch or (epoch + 1) % 10 == 0
                        or stopped.all()) and multihost.is_primary():
                    val_loss = np.asarray(logs[-1][1])
                    active = int((~stopped).sum())
                    print(f"  epoch {epoch + 1}/{epochs} | "
                          f"mean val loss {float(val_loss.mean()):.4f} | "
                          f"{active} folds active | "
                          f"{time.time() - t_train:.1f}s", flush=True)
                if checkpoint_every > 0 and (epoch + 1) % checkpoint_every == 0:
                    host_carry = multihost.to_host(carry, mesh)
                    if multihost.is_primary():
                        _save_sweep_resume(Path(run_dir), host_carry, logs,
                                           epoch + 1)
                if abort_after_epoch is not None and epoch + 1 >= abort_after_epoch:
                    raise SweepAborted(
                        f"aborted after epoch {epoch + 1} (drill)")
                if stopped.all():
                    if multihost.is_primary():
                        print(f"  all folds early-stopped at epoch {epoch + 1}")
                    break
        t_eval = time.time()
        test_loss, test_cm, best_epoch, fparams, fbs, test_probs = (
            multihost.to_host(
                finalize_fn(x_dev, y_dev, te_pool, n_te, fb_cw, carry), mesh
            )
        )
        # First run pays the composed test-eval program compile (~2 min over
        # the remote compile service); make that visible instead of letting
        # it hide between the epoch loop and the artifact phase.
        if multihost.is_primary():
            print(f"  test eval (compile + run): {time.time() - t_eval:.1f}s",
                  flush=True)

    # Stack per-epoch logs to [F, epochs] (zero-padded past the exit).
    stacked = [np.stack(column, axis=1) for column in zip(*logs)]
    padded_logs = []
    for arr in stacked:
        out = np.zeros((num_folds, epochs), dtype=arr.dtype)
        out[:, :epochs_ran] = arr
        padded_logs.append(out)
    train_loss, val_loss, val_acc, val_f1, lr, ran = padded_logs
    return SweepResult(
        history=SweepHistory(train_loss, val_loss, val_acc, val_f1, lr),
        best_epoch=np.asarray(best_epoch),
        stop_epoch=ran.astype(np.int32).sum(axis=1),
        test_loss=np.asarray(test_loss),
        test_cm=np.asarray(test_cm),
        final_params=jax.tree_util.tree_map(np.asarray, fparams),
        final_batch_stats=jax.tree_util.tree_map(np.asarray, fbs),
        test_probs=np.asarray(test_probs),
    )


def stage_corpus(cfg: ExperimentConfig, run_output_dir: Path,
                 all_channel_names: list[str] | None = None,
                 save_extra: dict | None = None) -> PackedCorpus:
    """Stage a sweep's corpus and write its config echo: from-pickles fused
    preprocess+pack, hybrid raw+feature pack, or the plain npy pack. Shared
    by the plain fold sweep and the seed-replicated sweep (the decision tree
    must not diverge between them)."""
    extra = dict(save_extra or {})
    if cfg.from_pickles:
        # Fused preprocess+pack straight from the raw pickles: no npy
        # round-trip (validate_experiment guarantees non-hybrid here).
        corpus, _, meta = pack_corpus_from_pickles(
            cfg.from_pickles, list(cfg.subjects), list(cfg.channels_to_use),
            cfg.classification_mode, cfg.normalization,
        )
        if multihost.is_primary():
            save_config(cfg, run_output_dir / "config.json",
                        extra={"preprocess_meta": meta, **extra})
        return corpus

    hybrid = cfg.model.name == "hybrid_cnn_gru"
    raw_path = cfg.raw_align_path if hybrid else cfg.data_path
    if multihost.is_primary():
        save_config(cfg, run_output_dir / "config.json",
                    extra={"preprocess_meta": experiment_preprocess_meta(cfg),
                           **extra})
    if all_channel_names is None:
        all_channel_names = read_channel_names(raw_path)
    if hybrid:
        return pack_hybrid_corpus(
            cfg.raw_align_path, cfg.feature_path, list(cfg.subjects),
            list(cfg.channels_to_use), all_channel_names,
            features_to_use=list(cfg.features_to_use) or None,
            classification_mode=cfg.classification_mode,
            normalization=cfg.normalization,
        )
    return pack_corpus(
        cfg.data_path, list(cfg.subjects), list(cfg.channels_to_use),
        all_channel_names, cfg.classification_mode, cfg.normalization,
    )


def run_sharded_experiment(
    cfg: ExperimentConfig,
    run_output_dir: Path | str,
    all_channel_names: list[str] | None = None,
    devices=None,
    profile_dir: str | Path | None = None,
) -> tuple[list[FoldResult], dict]:
    """End-to-end sharded LOSOCV: pack corpus -> sweep -> reference artifacts
    (per-fold training logs, cv_summary.txt). Drop-in replacement for
    experiments.loso.run_simple_experiment."""
    from multimodalsignal_tpu.config import validate_experiment

    t0 = time.time()
    validate_experiment(cfg, fold_execution="sharded")
    run_output_dir = Path(run_output_dir)
    run_output_dir.mkdir(parents=True, exist_ok=True)
    corpus = stage_corpus(cfg, run_output_dir, all_channel_names)
    mesh, padded = make_fold_mesh(len(corpus.subjects), devices)
    fb = build_fold_batch(corpus, list(cfg.subjects), cfg.val_fraction,
                          cfg.seed, pad_folds_to=padded)
    if multihost.is_primary():
        print("=" * 80)
        print(f"Sharded LOSO sweep: {len(fb.test_subjects)} folds "
              f"(padded to {padded}) over {mesh.devices.size} devices "
              f"[{mesh.devices.flat[0].platform}] "
              f"across {jax.process_count()} process(es)")
        print(f"  staging (pack + fold batch): {time.time() - t0:.1f}s")
        print("=" * 80)

    # Optional device trace of the whole sweep (the reference's only
    # observability was wall-clock prints — SURVEY.md §5 tracing).
    if profile_dir is not None:
        jax.profiler.start_trace(str(profile_dir))
    try:
        result = run_fold_sweep(corpus, fb, cfg, mesh, run_dir=run_output_dir)
    finally:
        if profile_dir is not None:
            jax.profiler.stop_trace()
            print(f"Profiler trace written to: {profile_dir}")

    # Finalize: ONE bulk device->host transfer of every stacked output
    # (per-fold slicing of device arrays costs a transfer per access — the
    # old per-fold loop was ~90 s of the 402 s single-chip wall,
    # benchmarks/RESULTS.md), then artifact writes fan out on a thread pool.
    t_finalize = time.time()
    host = jax.device_get({
        "cm": result.test_cm, "loss": result.test_loss,
        "stop": result.stop_epoch, "best": result.best_epoch,
        "hist": result.history,
        "params": result.final_params, "bs": result.final_batch_stats,
        "probs": result.test_probs,
    })

    results: list[FoldResult] = []
    for i, subject in enumerate(fb.test_subjects):
        cm = host["cm"][i]
        acc = float(M.accuracy_from_cm(cm))
        f1 = float(M.weighted_f1_from_cm(cm))
        results.append(FoldResult(
            subject=subject, accuracy=acc, f1_score=f1,
            test_loss=float(host["loss"][i]),
            best_epoch=int(host["best"][i]) + 1,
            epochs_run=int(host["stop"][i]),
        ))

    def write_fold_artifacts(i_subject):
        i, subject = i_subject
        r = results[i]
        fold_dir = run_output_dir / f"fold_test_on_{subject}"
        _write_fold_log(fold_dir, host["hist"], host["loss"], i,
                        r.epochs_run, r.best_epoch, r.accuracy, r.f1_score)
        _export_fold_checkpoint(fold_dir, host["params"], host["bs"], i, cfg)
        if host["probs"] is not None:
            np.save(fold_dir / "test_probs.npy",
                    host["probs"][i][: int(fb.n_test[i])])

    # Every process holds the full gathered results (to_host all-gathers),
    # but only the primary writes run-dir artifacts; all processes return
    # the same (results, summary).
    if multihost.is_primary():
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(write_fold_artifacts, enumerate(fb.test_subjects)))

        summary = write_cv_summary(run_output_dir / "cv_summary.txt", cfg,
                                   results)
    else:
        from multimodalsignal_tpu.experiments.loso import summarize_results

        summary = summarize_results(results)
    summary["sweep_wall_s"] = time.time() - t0
    if multihost.is_primary():
        print(f"  finalize (bulk transfer + artifacts): "
              f"{time.time() - t_finalize:.1f}s")
        print(f"\nSweep wall-clock: {summary['sweep_wall_s']:.2f}s "
              f"({len(results)} folds in parallel)")
        print(f"Mean accuracy: {summary['mean_accuracy']:.4f} "
              f"± {summary['std_accuracy']:.4f}")
        print(f"Mean weighted F1: {summary['mean_f1']:.4f} "
              f"± {summary['std_f1']:.4f}")
    return results, summary


def _export_fold_checkpoint(fold_dir: Path, host_params, host_batch_stats,
                            i: int, cfg: ExperimentConfig) -> None:
    """Write this fold's best-restored state as best_model.msgpack — the
    serial trainer's checkpoint contract (reference trainer.py:38-39), so
    Predictor.from_run works on sharded runs too. Takes HOST pytrees (the
    caller bulk-transfers the stacked states once for all folds)."""
    if host_params is None:
        return
    from multimodalsignal_tpu.train.checkpoints import save_state
    from multimodalsignal_tpu.train.optim import make_optimizer

    params = jax.tree_util.tree_map(lambda a: a[i], host_params)
    batch_stats = jax.tree_util.tree_map(lambda a: a[i], host_batch_stats)
    tx = make_optimizer(cfg.trainer.learning_rate, cfg.trainer.weight_decay)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=tx.init(params))
    save_state(fold_dir / "best_model.msgpack", state)


def _write_fold_log(fold_dir: Path, h: SweepHistory, test_loss, i: int,
                    epochs_run: int, best_epoch: int, acc: float,
                    f1: float) -> None:
    """Per-fold training_log.txt reconstructed from the sweep's stacked
    history (the artifact contract of reference trainer.py:113-117). Takes
    the HOST history (bulk-transferred once; per-scalar indexing of device
    arrays costs a transfer each)."""
    fold_dir.mkdir(parents=True, exist_ok=True)
    lines = [f"Training log (sharded sweep fold {i})", "=" * 50]
    for e in range(epochs_run):
        lines.append(
            f"Epoch {e + 1} | train loss: {h.train_loss[i, e]:.4f} | "
            f"val loss: {h.val_loss[i, e]:.4f} | "
            f"val acc: {h.val_acc[i, e]:.4f} | val F1: {h.val_f1[i, e]:.4f} | "
            f"lr: {h.lr[i, e]:.2e}"
        )
    lines.append(f"Best epoch: {best_epoch}")
    lines.append("--- Final test results ---")
    lines.append(
        f"test loss: {test_loss[i]:.4f} | test acc: {acc:.4f} | "
        f"test F1: {f1:.4f}"
    )
    (fold_dir / "training_log.txt").write_text("\n".join(lines) + "\n")
