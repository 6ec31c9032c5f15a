"""Trainer: learns a separable synthetic task, artifacts, early stopping,
checkpoint round-trip, batch indexing contract."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from multimodalsignal_tpu.config import EarlyStoppingConfig, TrainerConfig
from multimodalsignal_tpu.models import CnnGruAttentionModel
from multimodalsignal_tpu.train.checkpoints import restore_state, save_state
from multimodalsignal_tpu.train.trainer import Trainer, batch_indices


def _toy_problem(rng, n=96, c=3, t=512):
    """Class 1 = higher-frequency oscillation: learnable within a few epochs."""
    y = rng.integers(0, 2, n).astype(np.int32)
    tt = np.arange(t) / 128.0
    freq = np.where(y == 1, 8.0, 2.0)
    x = np.sin(2 * np.pi * freq[:, None, None] * tt[None, None, :])
    x = np.repeat(x, c, axis=1) + 0.1 * rng.standard_normal((n, c, t))
    return x.astype(np.float32), y


def test_batch_indices_contract(rng):
    idx, w = batch_indices(10, 4, rng=rng)
    assert idx.shape == (3, 4) and w.shape == (3, 4)
    assert w.sum() == 10  # exactly n real samples
    real = idx.reshape(-1)[w.reshape(-1) > 0]
    assert sorted(real.tolist()) == list(range(10))
    # Lockstep padding: extra steps all-zero weight.
    idx2, w2 = batch_indices(10, 4, steps=5, rng=rng)
    assert idx2.shape == (5, 4)
    assert w2[3:].sum() == 0 and w2.sum() == 10


@pytest.mark.slow
def test_trainer_learns_and_writes_artifacts(tmp_path, rng):
    x, y = _toy_problem(rng)
    x_val, y_val = _toy_problem(rng, n=32)
    x_test, y_test = _toy_problem(rng, n=32)
    cfg = TrainerConfig(
        epochs=12, batch_size=16, learning_rate=3e-3,
        early_stopping=EarlyStoppingConfig(patience=8),
    )
    model = CnnGruAttentionModel(num_classes=2, gru_hidden_size=16, gru_num_layers=1)
    trainer = Trainer(model, tmp_path / "fold", cfg, num_classes=2, seed=0)
    trainer.train((x, y), (x_val, y_val))
    loss, acc, f1 = trainer.evaluate((x_test, y_test), is_test=True)
    assert acc > 0.9, f"failed to learn separable task: acc={acc}"
    assert (tmp_path / "fold" / "training_log.txt").exists()
    assert (tmp_path / "fold" / "test_confusion_matrix.png").exists()
    assert (tmp_path / "fold" / "best_model.msgpack").exists()
    log = (tmp_path / "fold" / "training_log.txt").read_text()
    assert "val acc" in log and "Final test results" in log
    # Per-window softmax probabilities (reference trainer.py:224-231).
    probs = np.load(tmp_path / "fold" / "test_probs.npy")
    assert probs.shape == (len(y_test), 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    # Their argmax reproduces the reported accuracy.
    assert (probs.argmax(axis=1) == y_test).mean() == pytest.approx(acc, abs=1e-6)


@pytest.mark.slow
def test_trainer_early_stops(tmp_path):
    """On pure noise with a DISJOINT validation set (memorizing the train set
    cannot improve val loss), patience must fire well before the horizon.
    Local seed: independent of fixture consumption order across test files."""
    local = np.random.default_rng(123)
    x = local.standard_normal((64, 2, 256)).astype(np.float32)
    y = local.integers(0, 2, 64).astype(np.int32)
    x_val = local.standard_normal((32, 2, 256)).astype(np.float32)
    y_val = local.integers(0, 2, 32).astype(np.int32)
    cfg = TrainerConfig(
        epochs=50, batch_size=32, learning_rate=1e-3,
        early_stopping=EarlyStoppingConfig(patience=2),
    )
    model = CnnGruAttentionModel(num_classes=2, gru_hidden_size=8, gru_num_layers=1)
    trainer = Trainer(model, tmp_path / "f", cfg, num_classes=2, seed=0)
    trainer.train((x, y), (x_val, y_val))
    assert len(trainer.history) < 50


def test_checkpoint_roundtrip(tmp_path, rng):
    x, y = _toy_problem(rng, n=32)
    cfg = TrainerConfig(epochs=2, batch_size=16,
                        early_stopping=EarlyStoppingConfig(patience=5))
    model = CnnGruAttentionModel(num_classes=2, gru_hidden_size=8, gru_num_layers=1)
    trainer = Trainer(model, tmp_path / "f", cfg, num_classes=2, seed=0)
    trainer.train((x, y), (x[:16], y[:16]))
    state = trainer.state
    save_state(tmp_path / "ckpt.msgpack", state)
    # Restore into a fresh differently-seeded template and check logits agree.
    import jax

    from multimodalsignal_tpu.train.optim import make_optimizer
    from multimodalsignal_tpu.train.trainer import init_train_state

    template = init_train_state(
        model, jax.random.PRNGKey(1), jnp.asarray(x[:1]),
        make_optimizer(cfg.learning_rate, cfg.weight_decay))
    restored = restore_state(tmp_path / "ckpt.msgpack", template)
    xb = jnp.asarray(x[:4])
    logits_a = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, xb)
    logits_b = model.apply(
        {"params": restored.params, "batch_stats": restored.batch_stats}, xb)
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b), rtol=1e-4, atol=1e-6)


def test_lockstep_steps_equivalent_updates(tmp_path, rng):
    """Padding extra all-invalid steps must not change training results
    (the whole-tree select keeps Adam bit-exact)."""
    x, y = _toy_problem(rng, n=32)
    model = CnnGruAttentionModel(num_classes=2, gru_hidden_size=8, gru_num_layers=1)
    cfg = TrainerConfig(epochs=2, batch_size=16,
                        early_stopping=EarlyStoppingConfig(enabled=False))
    tr_a = Trainer(model, tmp_path / "a", cfg, num_classes=2, seed=0)
    tr_a.train((x, y), (x[:8], y[:8]))
    tr_b = Trainer(model, tmp_path / "b", cfg, num_classes=2, seed=0, steps_per_epoch=5)
    tr_b.train((x, y), (x[:8], y[:8]))
    la = [h.train_loss for h in tr_a.history]
    lb = [h.train_loss for h in tr_b.history]
    np.testing.assert_allclose(la, lb, rtol=1e-5)


@pytest.mark.slow
def test_mid_run_resume_bitwise(tmp_path, rng):
    """Interrupt-and-resume must reproduce the uninterrupted run exactly
    (full state + replayed RNG streams) — capability absent in the reference
    (SURVEY.md §5 checkpoint/resume)."""
    import dataclasses

    x, y = _toy_problem(rng, n=48)
    xv, yv = _toy_problem(rng, n=16)
    base = TrainerConfig(epochs=4, batch_size=16, learning_rate=3e-3,
                         early_stopping=EarlyStoppingConfig(patience=10))
    model = CnnGruAttentionModel(num_classes=2, gru_hidden_size=8, gru_num_layers=1)

    # Uninterrupted 4-epoch run.
    t_full = Trainer(model, tmp_path / "full", base, num_classes=2, seed=7)
    t_full.train((x, y), (xv, yv))

    # 2 epochs with checkpointing, then resume to 4 in a fresh Trainer.
    cfg_a = dataclasses.replace(base, epochs=2, checkpoint_every=1)
    t_a = Trainer(model, tmp_path / "part", cfg_a, num_classes=2, seed=7)
    t_a.train((x, y), (xv, yv))
    cfg_b = dataclasses.replace(base, resume=True)
    t_b = Trainer(model, tmp_path / "part", cfg_b, num_classes=2, seed=7)
    t_b.train((x, y), (xv, yv))

    import jax
    for got, want in zip(jax.tree_util.tree_leaves(t_b.state.params),
                         jax.tree_util.tree_leaves(t_full.state.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert [h.epoch for h in t_b.history] == [3, 4]
