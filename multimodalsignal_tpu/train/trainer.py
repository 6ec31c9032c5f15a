"""Trainer (L4): jitted train/eval steps + host-side schedule state machines.

Parity target: reference trainer.py:41-247 — Adam+weight-decay, CE loss,
ReduceLROnPlateau on val loss, early stopping with best-checkpointing,
file+stdout logging, accuracy/weighted-F1, confusion-matrix artifact.

TPU-native structure (not a port):
  * The whole fold's data lives on device as dense [N, C, T]/[N] arrays; an
    epoch is ONE jitted lax.scan over precomputed shuffled index batches —
    no DataLoader, no per-batch host->device copies (the reference pays one
    transfer per batch, trainer.py:137-142).
  * Batches are wrap-padded to a fixed [steps, B] grid with 0/1 sample
    weights, so every fold compiles to the same shapes; invalid steps are
    discarded with a whole-tree select, which keeps Adam moments and weight
    decay bit-exact with per-fold variable step counts.
  * The same pure epoch functions drive the serial trainer here and the
    vmapped multi-fold sweep (parallel/fold_sweep.py).

Epoch-level control (LR plateau, early stopping, best-param tracking) runs
host-side exactly like the reference's loop, as pure state machines
(train/optim.py) that also work in-graph for the sharded sweep.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from multimodalsignal_tpu.config import TrainerConfig
from multimodalsignal_tpu.train import metrics as M
from multimodalsignal_tpu.train.optim import (
    early_stopping_init,
    early_stopping_update,
    make_optimizer,
    plateau_init,
    plateau_update,
    set_learning_rate,
)
from multimodalsignal_tpu.utils.rng import (
    as_dropout_key,
    resolve_dropout_rng_impl,
)
from multimodalsignal_tpu.utils.run import TeeLogger


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any


def init_train_state(model, rng, sample_input, tx) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


def cross_entropy(logits, labels, weights, class_weights=None):
    """Weighted-mean CE matching torch.nn.CrossEntropyLoss semantics: with
    class weights the denominator is the sum of per-sample weights."""
    log_probs = jax.nn.log_softmax(logits)
    ce = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    w = weights
    if class_weights is not None:
        w = w * class_weights[labels]
    total_w = jnp.maximum(w.sum(), 1e-12)
    return (ce * w).sum() / total_w, w.sum()


# Cache of jitted (train_epoch, eval_dataset) closures. The serial LOSO loop
# builds a fresh Trainer per fold (reference main.py:116-123); without this,
# every fold re-traces and re-compiles identical programs. flax Modules are
# frozen dataclasses (hashable by value), so identical model configs share
# compiled executables across folds.
_EPOCH_FN_CACHE: dict = {}


def make_epoch_fns_cached(model, tx_key: tuple, tx, num_classes: int,
                          class_weights=None, dropout_rng: str = "auto"):
    cw_key = (
        None if class_weights is None
        else (class_weights.shape, tuple(np.asarray(class_weights).tolist()))
    )
    key = (model, tx_key, num_classes, cw_key,
           resolve_dropout_rng_impl(dropout_rng))
    if key not in _EPOCH_FN_CACHE:
        _EPOCH_FN_CACHE[key] = make_epoch_fns(
            model, tx, num_classes, class_weights, dropout_rng)
    return _EPOCH_FN_CACHE[key]


def make_epoch_fns(model, tx, num_classes: int, class_weights=None,
                   dropout_rng: str = "auto"):
    """Build (train_epoch, eval_dataset) pure functions for one model/optim.

    train_epoch(state, x, y, idx, w, rng) -> (state, mean_train_loss)
      idx [steps, B] wrap-padded indices, w [steps, B] 0/1 sample weights.
    eval_dataset(state, x, y, idx, w) -> (loss, cm, probs)
      cm [num_classes, num_classes]; probs [steps*B, num_classes] softmax
      (the per-window probabilities the reference collects at evaluation,
      trainer.py:224-231; predictions are their argmax).

    dropout_rng selects the dropout-mask bit generator (utils/rng.py): only
    the key handed to nn.Dropout changes; the epoch-level split stream that
    derives it stays threefry, so resume checkpoints are impl-agnostic.
    """
    rng_impl = resolve_dropout_rng_impl(dropout_rng)

    def loss_fn(params, batch_stats, xb, yb, wb, dropout_rng, train):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            xb,
            train=train,
            rngs={"dropout": as_dropout_key(dropout_rng, rng_impl)}
            if train else None,
            mutable=["batch_stats"] if train else False,
        )
        logits, new_bs = out if train else (out, {"batch_stats": batch_stats})
        loss, wsum = cross_entropy(logits, yb, wb, class_weights)
        return loss, (new_bs["batch_stats"], logits, wsum)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def train_epoch(state: TrainState, x, y, idx, w, rng):
        def step(carry, inp):
            state, rng, loss_sum, w_sum = carry
            batch_idx, wb = inp
            rng, dropout_rng = jax.random.split(rng)
            # x may be a pytree (e.g. (x_raw, x_feat) for the hybrid path —
            # the reference's tuple batches, trainer.py:130-146).
            xb = jax.tree_util.tree_map(lambda a: a[batch_idx], x)
            yb = y[batch_idx]
            (loss, (new_bs, _, wsum)), grads = grad_fn(
                state.params, state.batch_stats, xb, yb, wb, dropout_rng, True
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            valid = wb.sum() > 0
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(valid, new, old),
                TrainState(new_params, new_bs, new_opt),
                state,
            )
            loss_sum = loss_sum + jnp.where(valid, loss * wsum, 0.0)
            w_sum = w_sum + wsum
            return (new_state, rng, loss_sum, w_sum), None

        init = (state, rng, jnp.zeros(()), jnp.zeros(()))
        (state, _, loss_sum, w_sum), _ = jax.lax.scan(step, init, (idx, w))
        return state, loss_sum / jnp.maximum(w_sum, 1e-12)

    @jax.jit
    def eval_dataset(state: TrainState, x, y, idx, w):
        def step(carry, inp):
            loss_sum, w_sum, cm = carry
            batch_idx, wb = inp
            xb = jax.tree_util.tree_map(lambda a: a[batch_idx], x)
            yb = y[batch_idx]
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                xb,
                train=False,
            )
            loss, wsum = cross_entropy(logits, yb, wb, class_weights)
            preds = jnp.argmax(logits, axis=-1)
            cm = cm + M.confusion_matrix(yb, preds, num_classes, wb)
            probs = jax.nn.softmax(logits, axis=-1)
            return (loss_sum + loss * wsum, w_sum + wsum, cm), probs

        init = (jnp.zeros(()), jnp.zeros(()), jnp.zeros((num_classes, num_classes)))
        (loss_sum, w_sum, cm), probs = jax.lax.scan(step, init, (idx, w))
        return (loss_sum / jnp.maximum(w_sum, 1e-12), cm,
                probs.reshape(-1, num_classes))

    return train_epoch, eval_dataset


def batch_indices(
    n: int, batch_size: int, steps: int | None = None, rng: np.random.Generator | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Build a wrap-padded [steps, B] index grid + 0/1 weights.

    With rng: shuffled (training). steps > ceil(n/B) appends all-zero-weight
    batches (lockstep epochs across ragged folds); the padded tail of the last
    real batch wraps to index 0 with weight 0.
    """
    real_steps = max(-(-n // batch_size), 1)
    steps = steps or real_steps
    order = rng.permutation(n) if rng is not None else np.arange(n)
    total = steps * batch_size
    idx = np.zeros(total, dtype=np.int32)
    w = np.zeros(total, dtype=np.float32)
    take = min(n, total)
    idx[:take] = order[:take]
    w[:take] = 1.0
    return idx.reshape(steps, batch_size), w.reshape(steps, batch_size)


class EpochLog(NamedTuple):
    epoch: int
    duration_s: float
    train_loss: float
    val_loss: float
    val_acc: float
    val_f1: float
    lr: float


class Trainer:
    """Single-fold trainer with the reference's artifact contract:
    fold_dir/training_log.txt, fold_dir/best_model checkpoint,
    fold_dir/test_confusion_matrix.png."""

    def __init__(
        self,
        model,
        fold_output_dir: Path | str,
        cfg: TrainerConfig,
        num_classes: int,
        seed: int = 42,
        class_weights: np.ndarray | None = None,
        steps_per_epoch: int | None = None,
    ):
        self.model = model
        self.cfg = cfg
        self.num_classes = num_classes
        self.fold_dir = Path(fold_output_dir)
        self.fold_dir.mkdir(parents=True, exist_ok=True)
        self.log_file = self.fold_dir / "training_log.txt"
        self._tee = TeeLogger(
            self.log_file,
            header=f"Training log for run starting at "
                   f"{time.strftime('%Y-%m-%d %H:%M:%S')}",
            # A resumed run appends to the existing log instead of wiping the
            # pre-resume epochs (the artifact continuity the resume feature
            # exists for).
            append=cfg.resume,
        )
        self.seed = seed
        self.steps_per_epoch = steps_per_epoch
        self.tx = make_optimizer(cfg.learning_rate, cfg.weight_decay)
        cw = jnp.asarray(class_weights, jnp.float32) if class_weights is not None else None
        self._train_epoch, self._eval = make_epoch_fns_cached(
            model, (cfg.learning_rate, cfg.weight_decay), self.tx, num_classes,
            cw, dropout_rng=cfg.dropout_rng,
        )
        self.state: TrainState | None = None
        self.best_state: TrainState | None = None
        self.history: list[EpochLog] = []
        self._t0 = time.time()

    # -- logging ------------------------------------------------------------
    def _log(self, message: str) -> None:
        self._tee(message)

    # -- data staging --------------------------------------------------------
    @staticmethod
    def _stage(ds):
        """Move a WindowDataset / HybridWindowDataset (or (x, y) pair) to
        device once; x may be a pytree of arrays (hybrid path)."""
        x, y = (ds.x, ds.y) if hasattr(ds, "x") else ds
        x = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), x)
        return x, jnp.asarray(y, jnp.int32)

    # -- training -----------------------------------------------------------
    def train(self, train_ds, val_ds) -> TrainState:
        cfg = self.cfg
        x_tr, y_tr = self._stage(train_ds)
        x_va, y_va = self._stage(val_ds)
        n = int(y_tr.shape[0])
        rng_np = np.random.default_rng(self.seed)
        rng = jax.random.PRNGKey(self.seed)

        if self.state is None:
            rng, init_rng = jax.random.split(rng)
            sample = jax.tree_util.tree_map(lambda a: a[: min(2, n)], x_tr)
            self.state = init_train_state(self.model, init_rng, sample, self.tx)
        state = self.state

        es_state = early_stopping_init()
        pl_state = plateau_init(cfg.learning_rate)
        es_cfg = cfg.early_stopping
        best_state = state
        val_idx, val_w = batch_indices(int(y_va.shape[0]), cfg.batch_size)
        val_idx, val_w = jnp.asarray(val_idx), jnp.asarray(val_w)

        order_rng = rng_np if cfg.shuffle else None

        # Mid-run resume (no equivalent in the reference, SURVEY.md §5):
        # restore the full pytree and replay the RNG stream for determinism.
        start_epoch = 0
        if cfg.resume and self._resume_path().exists():
            state, best_state, es_state, pl_state, start_epoch = self._load_resume(
                (state, best_state, es_state, pl_state)
            )
            self._log(f"Resumed from epoch {start_epoch}")
            for _ in range(start_epoch):
                batch_indices(n, cfg.batch_size, self.steps_per_epoch, order_rng)
                rng, _ = jax.random.split(rng)

        stopped = False
        for epoch in range(start_epoch, cfg.epochs):
            t_start = time.time()
            idx, w = batch_indices(n, cfg.batch_size, self.steps_per_epoch, order_rng)
            rng, epoch_rng = jax.random.split(rng)
            with jax.profiler.StepTraceAnnotation("train_epoch", step_num=epoch):
                state, train_loss = self._train_epoch(
                    state, x_tr, y_tr, jnp.asarray(idx), jnp.asarray(w), epoch_rng
                )
            val_loss, cm, _ = self._eval(state, x_va, y_va, val_idx, val_w)
            val_acc = float(M.accuracy_from_cm(cm))
            val_f1 = float(M.weighted_f1_from_cm(cm))
            val_loss = float(val_loss)

            # ReduceLROnPlateau on val loss (reference trainer.py:160).
            pl_state = plateau_update(
                pl_state, val_loss,
                factor=cfg.lr_plateau_factor,
                patience=cfg.lr_plateau_patience,
                threshold=cfg.lr_plateau_threshold,
            )
            state = state.replace(opt_state=set_learning_rate(state.opt_state, pl_state.lr))

            duration = time.time() - t_start
            self.history.append(EpochLog(
                epoch + 1, duration, float(train_loss), val_loss, val_acc, val_f1,
                float(pl_state.lr),
            ))
            self._log(
                f"Epoch {epoch + 1}/{cfg.epochs} | {duration:.2f}s | "
                f"train loss: {float(train_loss):.4f} | val loss: {val_loss:.4f} | "
                f"val acc: {val_acc:.4f} | val F1: {val_f1:.4f}"
            )

            if es_cfg.enabled:
                es_state = early_stopping_update(
                    es_state, val_loss, epoch,
                    patience=es_cfg.patience, delta=es_cfg.delta,
                    legacy_inverted=es_cfg.legacy_inverted,
                )
                if bool(es_state.improved):
                    best_state = state
                    self._save_checkpoint(best_state)
                if bool(es_state.should_stop):
                    self._log("Early stopping triggered")
                    stopped = True
                    break

            if cfg.checkpoint_every > 0 and (epoch + 1) % cfg.checkpoint_every == 0:
                self._save_resume((state, best_state, es_state, pl_state), epoch + 1)

        if es_cfg.enabled and (stopped or not cfg.legacy_restore_only_on_early_stop):
            # Reference reloads best weights only after an early stop
            # (trainer.py:185-187); default here restores best always.
            state = best_state
            self._log(f"Restored best model (epoch {int(es_state.best_epoch) + 1})")
        self.state = state
        self.best_state = best_state
        self._log(f"--- Training complete --- total: {time.time() - self._t0:.2f}s")
        return state

    # -- evaluation ---------------------------------------------------------
    def evaluate(self, ds, is_test: bool = False, is_val: bool = False):
        x, y = self._stage(ds)
        idx, w = batch_indices(int(y.shape[0]), self.cfg.batch_size)
        loss, cm, probs = self._eval(
            self.state, x, y, jnp.asarray(idx), jnp.asarray(w)
        )
        acc = float(M.accuracy_from_cm(cm))
        f1 = float(M.weighted_f1_from_cm(cm))
        loss = float(loss)
        n = int(y.shape[0])
        probs_np = np.asarray(probs)[:n]
        preds_np = probs_np.argmax(axis=-1)
        if is_test:
            labels_np = np.asarray(y)
            self.plot_confusion_matrix(labels_np, preds_np, "test_confusion_matrix.png")
            # Per-window softmax probabilities — the reference collects these
            # at evaluation (trainer.py:224-231); persisted as an artifact so
            # downstream calibration/threshold analysis has them.
            np.save(self.fold_dir / "test_probs.npy", probs_np)
            self._log("\n--- Final test results ---")
            self._log(f"test loss: {loss:.4f} | test acc: {acc:.4f} | test F1: {f1:.4f}")
            return loss, acc, f1
        if is_val:
            return loss, acc, f1, preds_np, np.asarray(y)
        return loss, acc, f1

    # -- artifacts ----------------------------------------------------------
    def _save_checkpoint(self, state: TrainState) -> None:
        from multimodalsignal_tpu.train.checkpoints import save_state

        save_state(self.fold_dir / "best_model.msgpack", state)

    # -- mid-run resume -------------------------------------------------------
    def _resume_path(self) -> Path:
        return self.fold_dir / "resume_state.msgpack"

    def _save_resume(self, bundle, next_epoch: int) -> None:
        import json

        from multimodalsignal_tpu.train.checkpoints import save_state

        save_state(self._resume_path(), bundle)
        (self.fold_dir / "resume_meta.json").write_text(
            json.dumps({"next_epoch": next_epoch})
        )

    def _load_resume(self, template):
        import json

        from multimodalsignal_tpu.train.checkpoints import restore_state

        bundle = restore_state(self._resume_path(), template)
        meta = json.loads((self.fold_dir / "resume_meta.json").read_text())
        return (*bundle, meta["next_epoch"])

    def plot_confusion_matrix(self, true_labels, pred_labels, filename="confusion_matrix.png"):
        """Heatmap PNG with the reference's class-count-dependent label sets
        (trainer.py:249-273)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            n_unique = len(np.unique(true_labels))
            if n_unique == 2:
                labels = ["Non-Stress", "Stress"]
            else:
                labels = ["Neutral/Baseline", "Amusement", "Stress/TSST"]
            cm = np.zeros((len(labels), len(labels)), dtype=int)
            for t, p in zip(true_labels, pred_labels):
                if t < len(labels) and p < len(labels):
                    cm[int(t), int(p)] += 1
            fig, ax = plt.subplots(figsize=(8, 6))
            im = ax.imshow(cm, cmap="Blues")
            ax.set_xticks(range(len(labels)), labels, rotation=30, ha="right")
            ax.set_yticks(range(len(labels)), labels)
            for i in range(len(labels)):
                for j in range(len(labels)):
                    ax.text(j, i, str(cm[i, j]), ha="center", va="center",
                            color="white" if cm[i, j] > cm.max() / 2 else "black")
            ax.set_xlabel("Predicted Label")
            ax.set_ylabel("True Label")
            ax.set_title("Confusion Matrix")
            fig.colorbar(im)
            fig.tight_layout()
            path = self.fold_dir / filename
            fig.savefig(path)
            plt.close(fig)
            self._log(f"Confusion matrix saved to: {path}")
        except Exception as e:  # parity: reference logs and continues
            self._log(f"Failed to save confusion matrix: {e}")
