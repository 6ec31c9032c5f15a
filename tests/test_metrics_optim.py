"""Metrics vs sklearn oracles; optimizer vs torch.optim.Adam; scheduler and
early-stopping state machines vs reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
from sklearn.metrics import accuracy_score, confusion_matrix as sk_cm, f1_score

from multimodalsignal_tpu.train.metrics import (
    accuracy as _accuracy,
    confusion_matrix as _confusion_matrix,
    weighted_f1 as _weighted_f1,
)

# Jit the metric kernels once per (static) signature: the quick tier's cost
# here is eager re-tracing, not math (1-core host; see conftest cache notes).
accuracy = jax.jit(_accuracy, static_argnums=2)
confusion_matrix = jax.jit(_confusion_matrix, static_argnums=2)
weighted_f1 = jax.jit(_weighted_f1, static_argnums=2)
from multimodalsignal_tpu.train.optim import (
    early_stopping_init,
    early_stopping_update,
    get_learning_rate,
    make_optimizer,
    plateau_init,
    plateau_update,
    set_learning_rate,
)


@pytest.mark.parametrize("num_classes", [2, 3])
def test_metrics_match_sklearn(num_classes, rng):
    y_true = rng.integers(0, num_classes, 200)
    y_pred = rng.integers(0, num_classes, 200)
    cm = np.asarray(confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), num_classes))
    np.testing.assert_array_equal(cm, sk_cm(y_true, y_pred, labels=range(num_classes)))
    assert float(accuracy(jnp.asarray(y_true), jnp.asarray(y_pred), num_classes)) == pytest.approx(
        accuracy_score(y_true, y_pred)
    )
    assert float(weighted_f1(jnp.asarray(y_true), jnp.asarray(y_pred), num_classes)) == pytest.approx(
        f1_score(y_true, y_pred, average="weighted"), abs=1e-6
    )


def test_metrics_with_mask(rng):
    y_true = rng.integers(0, 2, 100)
    y_pred = rng.integers(0, 2, 100)
    mask = rng.random(100) > 0.3
    acc = float(accuracy(jnp.asarray(y_true), jnp.asarray(y_pred), 2, jnp.asarray(mask)))
    assert acc == pytest.approx(accuracy_score(y_true[mask], y_pred[mask]))
    f1 = float(weighted_f1(jnp.asarray(y_true), jnp.asarray(y_pred), 2, jnp.asarray(mask)))
    assert f1 == pytest.approx(f1_score(y_true[mask], y_pred[mask], average="weighted"), abs=1e-6)


def test_weighted_f1_missing_class(rng):
    """Zero-support classes must not poison the weighted mean (sklearn parity)."""
    y_true = np.array([0, 0, 1, 1, 1])
    y_pred = np.array([0, 1, 1, 1, 2])  # class 2 predicted but never true
    got = float(weighted_f1(jnp.asarray(y_true), jnp.asarray(y_pred), 3))
    assert got == pytest.approx(f1_score(y_true, y_pred, average="weighted"), abs=1e-6)


def test_adam_weight_decay_matches_torch(rng):
    """optax chain must reproduce torch Adam-with-weight-decay trajectories
    (L2 into the moments, not decoupled AdamW)."""
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    lr, wd, steps = 1e-2, 1e-2, 5

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    x = torch.from_numpy(rng.standard_normal((8, 4)).astype(np.float32))
    for _ in range(steps):
        topt.zero_grad()
        loss = ((x @ tp) ** 2).mean()
        loss.backward()
        topt.step()

    params = {"w": jnp.asarray(w0)}
    tx = make_optimizer(lr, wd)
    opt_state = tx.init(params)
    xj = jnp.asarray(x.numpy())

    def loss_fn(p):
        return jnp.mean((xj @ p["w"]) ** 2)

    @jax.jit
    def step(params, opt_state):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree_util.tree_map(lambda p, u: p + u, params, updates), opt_state

    for _ in range(steps):
        params, opt_state = step(params, opt_state)

    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_set_learning_rate_roundtrip():
    tx = make_optimizer(1e-3, 0.0)
    state = tx.init({"w": jnp.zeros(3)})
    assert float(get_learning_rate(state)) == pytest.approx(1e-3)
    state = set_learning_rate(state, 1e-4)
    assert float(get_learning_rate(state)) == pytest.approx(1e-4)


def test_plateau_matches_torch_scheduler():
    """Trajectory parity with torch ReduceLROnPlateau(min, 0.1, patience=3)."""
    lin = torch.nn.Linear(2, 2)
    topt = torch.optim.Adam(lin.parameters(), lr=1e-3)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(topt, mode="min", factor=0.1, patience=3)
    state = plateau_init(1e-3)
    losses = [1.0, 0.9, 0.95, 0.95, 0.95, 0.95, 0.95, 0.5, 0.6, 0.6, 0.6, 0.6, 0.6]
    for loss in losses:
        tsched.step(loss)
        state = plateau_update(state, loss)
        torch_lr = topt.param_groups[0]["lr"]
        assert float(state.lr) == pytest.approx(torch_lr, rel=1e-6), f"at loss {loss}"


def test_early_stopping_min_loss_semantics():
    st = early_stopping_init()
    scores = [1.0, 0.9, 0.95, 0.96, 0.97]  # improves twice then stalls
    for epoch, s in enumerate(scores):
        st = early_stopping_update(st, s, epoch, patience=3)
    assert int(st.best_epoch) == 1
    assert float(st.best_score) == pytest.approx(0.9)
    assert bool(st.should_stop)  # 3 bad epochs -> stop


def test_early_stopping_legacy_inverted_replicates_reference():
    """Reference trainer.py:27 treats RISING val loss as improvement."""
    st = early_stopping_init()
    scores = [1.0, 1.1, 0.9, 0.8, 0.7]
    for epoch, s in enumerate(scores):
        st = early_stopping_update(st, s, epoch, patience=3, legacy_inverted=True)
    assert int(st.best_epoch) == 1  # 1.1 was the "best" under inverted compare
    assert bool(st.should_stop)


def test_early_stopping_improved_flag_drives_checkpointing():
    st = early_stopping_init()
    st = early_stopping_update(st, 1.0, 0)
    assert bool(st.improved)
    st = early_stopping_update(st, 1.5, 1)
    assert not bool(st.improved)
    st = early_stopping_update(st, 0.5, 2)
    assert bool(st.improved)
