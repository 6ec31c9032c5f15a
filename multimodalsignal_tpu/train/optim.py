"""Optimizer + scheduler/early-stopping state machines.

Parity targets:
  * torch.optim.Adam with weight_decay (reference trainer.py:68): L2 term is
    added to the gradient BEFORE the Adam moments (unlike AdamW), i.e.
    optax.add_decayed_weights -> scale_by_adam -> -lr.
  * ReduceLROnPlateau(mode='min', factor=0.1, patience=3) stepped on val loss
    (reference trainer.py:72-77,160) with torch's default rel threshold 1e-4.
  * EarlyStopping (reference trainer.py:12-39): patience counter with
    save-best checkpoint. The reference's comparison is inverted for a loss
    (SURVEY.md §7); `legacy_inverted=True` replicates that, default monitors
    min val loss.

Both state machines are pure functions over small NamedTuple states so they
can run either host-side (serial trainer) or in-graph under vmap across folds
(sharded LOSOCV sweep) — "improvement" and "stop" become masked updates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import optax


def make_optimizer(learning_rate: float, weight_decay: float) -> optax.GradientTransformation:
    """torch-Adam-with-weight-decay equivalent; lr is injectable so the
    plateau scheduler can rescale it mid-run."""

    def factory(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(factory)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr):
    """Rewrite the injected learning_rate hyperparameter in-place."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def get_learning_rate(opt_state):
    return opt_state.hyperparams["learning_rate"]


# ---------------------------------------------------------------------------
# ReduceLROnPlateau
# ---------------------------------------------------------------------------

class PlateauState(NamedTuple):
    lr: jnp.ndarray        # current learning rate
    best: jnp.ndarray      # best (lowest) metric so far
    num_bad: jnp.ndarray   # epochs since last improvement


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(
        lr=jnp.asarray(lr, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad=jnp.asarray(0, jnp.int32),
    )


def plateau_update(
    state: PlateauState,
    metric,
    factor: float = 0.1,
    patience: int = 3,
    threshold: float = 1e-4,
    min_lr: float = 0.0,
) -> PlateauState:
    """One scheduler step on a to-minimize metric (torch rel-threshold rule:
    improvement iff metric < best * (1 - threshold))."""
    metric = jnp.asarray(metric, jnp.float32)
    improved = metric < state.best * (1.0 - threshold)
    best = jnp.where(improved, metric, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    reduce = num_bad > patience
    lr = jnp.where(reduce, jnp.maximum(state.lr * factor, min_lr), state.lr)
    num_bad = jnp.where(reduce, 0, num_bad)
    return PlateauState(lr=lr, best=best, num_bad=num_bad)


# ---------------------------------------------------------------------------
# EarlyStopping
# ---------------------------------------------------------------------------

class EarlyStoppingState(NamedTuple):
    best_score: jnp.ndarray   # monitored value at the best epoch
    counter: jnp.ndarray      # epochs since improvement
    should_stop: jnp.ndarray  # latched stop flag
    improved: jnp.ndarray     # this step was an improvement (=> checkpoint)
    best_epoch: jnp.ndarray


def early_stopping_init() -> EarlyStoppingState:
    return EarlyStoppingState(
        best_score=jnp.asarray(jnp.nan, jnp.float32),
        counter=jnp.asarray(0, jnp.int32),
        should_stop=jnp.asarray(False),
        improved=jnp.asarray(False),
        best_epoch=jnp.asarray(-1, jnp.int32),
    )


def early_stopping_update(
    state: EarlyStoppingState,
    score,
    epoch,
    patience: int = 20,
    delta: float = 0.0,
    legacy_inverted: bool = False,
) -> EarlyStoppingState:
    """One early-stopping step on the monitored score.

    Default: score is a loss, improvement = score < best - delta.
    legacy_inverted: the reference's literal comparison (trainer.py:27):
    improvement = score > best + delta — which, fed val_loss, treats a RISING
    loss as improvement. Kept only for bit-faithful replication studies.
    """
    score = jnp.asarray(score, jnp.float32)
    first = jnp.isnan(state.best_score)
    if legacy_inverted:
        improved = jnp.logical_or(first, score >= state.best_score + delta)
    else:
        improved = jnp.logical_or(first, score < state.best_score - delta)
    best_score = jnp.where(improved, score, state.best_score)
    counter = jnp.where(improved, 0, state.counter + 1)
    should_stop = jnp.logical_or(state.should_stop, counter >= patience)
    best_epoch = jnp.where(improved, jnp.asarray(epoch, jnp.int32), state.best_epoch)
    return EarlyStoppingState(
        best_score=best_score,
        counter=counter,
        should_stop=should_stop,
        improved=jnp.logical_and(improved, jnp.logical_not(state.should_stop)),
        best_epoch=best_epoch,
    )
