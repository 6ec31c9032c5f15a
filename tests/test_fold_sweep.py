"""Sharded fold sweep: in-graph shuffling, fold batching, and the full
vmapped LOSO sweep on the virtual 8-device CPU mesh (SURVEY.md §4's
multi-device test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalsignal_tpu.config import (
    EarlyStoppingConfig,
    ExperimentConfig,
    ModelConfig,
    TrainerConfig,
)
from multimodalsignal_tpu.data.dataset import pack_corpus
from multimodalsignal_tpu.parallel.fold_sweep import (
    FoldBatch,
    _sequential_grid,
    _shuffled_grid,
    build_fold_batch,
    make_fold_mesh,
    run_sharded_experiment,
)

from tests.test_preprocess import preprocessed  # noqa: F401  (fixture reuse)
from tests.conftest import SUBJECTS_SMALL


def test_shuffled_grid_is_permutation():
    pool = jnp.asarray(np.arange(100, 117, dtype=np.int32))  # 17 entries
    n_valid = 11
    idx, w = _shuffled_grid(jax.random.PRNGKey(0), pool, n_valid, steps=3, batch_size=8)
    assert idx.shape == (3, 8) and w.shape == (3, 8)
    flat_idx = np.asarray(idx).reshape(-1)
    flat_w = np.asarray(w).reshape(-1)
    assert flat_w.sum() == n_valid
    real = flat_idx[flat_w > 0]
    # Exactly the 11 valid pool entries, each once, shuffled.
    assert sorted(real.tolist()) == list(range(100, 111))
    # Different keys give different orders.
    idx2, _ = _shuffled_grid(jax.random.PRNGKey(1), pool, n_valid, 3, 8)
    assert not np.array_equal(np.asarray(idx2), np.asarray(idx))


def test_sequential_grid_covers_in_order():
    pool = jnp.asarray(np.arange(50, 60, dtype=np.int32))
    idx, w = _sequential_grid(pool, 7, steps=2, batch_size=8)
    flat_idx = np.asarray(idx).reshape(-1)
    flat_w = np.asarray(w).reshape(-1)
    assert flat_idx[:7].tolist() == list(range(50, 57))
    assert flat_w.sum() == 7


def test_build_fold_batch(preprocessed):  # noqa: F811
    corpus = pack_corpus(
        preprocessed / "chest_raw", SUBJECTS_SMALL, ["chest_ECG"],
        _channel_names(preprocessed), "stress_binary",
    )
    fb = build_fold_batch(corpus, SUBJECTS_SMALL, pad_folds_to=8)
    assert fb.train_pool.shape[0] == 8
    assert fb.fold_valid.tolist() == [True] * 4 + [False] * 4
    assert len(fb.test_subjects) == 4
    wmax = corpus.x.shape[1]
    for f in range(4):
        # Pools index real windows only.
        for pool, n in ((fb.train_pool, fb.n_train), (fb.val_pool, fb.n_val),
                        (fb.test_pool, fb.n_test)):
            flat = pool[f, : n[f]]
            rows, cols = flat // wmax, flat % wmax
            assert corpus.mask[rows, cols].all()
        # Train/val/test partition is disjoint over subjects.
        tr_rows = set((fb.train_pool[f, : fb.n_train[f]] // wmax).tolist())
        va_rows = set((fb.val_pool[f, : fb.n_val[f]] // wmax).tolist())
        te_rows = set((fb.test_pool[f, : fb.n_test[f]] // wmax).tolist())
        assert not (tr_rows & va_rows) and not (tr_rows & te_rows)
        assert not (va_rows & te_rows)
        assert len(te_rows) == 1


def _channel_names(preprocessed):
    return (preprocessed / "chest_raw" / "_channel_names.txt").read_text().split()


def test_make_fold_mesh_padding():
    mesh, padded = make_fold_mesh(15)
    assert padded % mesh.devices.size == 0
    assert padded >= 15


@pytest.mark.slow
def test_sharded_experiment_end_to_end(preprocessed, tmp_path):  # noqa: F811
    """Full sharded LOSOCV over the 8-device CPU mesh: one jitted program
    trains all folds; artifacts match the serial contract."""
    cfg = ExperimentConfig(
        data_path=str(preprocessed / "chest_raw"),
        subjects=tuple(SUBJECTS_SMALL),
        channels_to_use=("chest_ECG", "chest_EDA", "chest_Resp"),
        model=ModelConfig(cnn_out_channels=8, gru_hidden_size=8, gru_num_layers=1),
        trainer=TrainerConfig(
            epochs=3, batch_size=16, learning_rate=3e-3,
            early_stopping=EarlyStoppingConfig(patience=5),
        ),
        fold_execution="sharded",
    )
    results, summary = run_sharded_experiment(cfg, tmp_path)
    assert len(results) == 4
    assert summary["num_folds"] == 4
    assert (tmp_path / "cv_summary.txt").exists()
    for r in results:
        assert 0.0 <= r.accuracy <= 1.0
        assert 1 <= r.epochs_run <= 3
        log = (tmp_path / f"fold_test_on_{r.subject}" / "training_log.txt").read_text()
        assert "Final test results" in log
        assert f"test acc: {r.accuracy:.4f}" in log
        # Per-window test probabilities exported from the sweep.
        probs = np.load(tmp_path / f"fold_test_on_{r.subject}" / "test_probs.npy")
        assert probs.ndim == 2 and probs.shape[1] == 2 and len(probs) > 0
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    # History must be finite for the epochs that ran.
    accs = [r.accuracy for r in results]
    assert np.isfinite(accs).all()


@pytest.mark.slow
def test_dispatch_modes_equivalent(tmp_path):
    """'segmented' (lax.scan of N epochs per device execution) and
    'per_epoch' (host epoch loop) must produce bit-identical per-fold
    results AND histories. epochs=5 with segment=2 exercises the
    remainder-length segment program; patience=1 makes folds stop before
    the horizon so the trailing-coast trim is exercised too.

    cfg carries trainer.resume=True with run_dir=None: resume is inert
    without a run dir and must NOT trip the segmented-dispatch guard
    (round-4 advisor finding); with a run_dir set it must fail loudly."""
    from multimodalsignal_tpu.data.dataset import PackedCorpus
    from multimodalsignal_tpu.parallel.fold_sweep import run_fold_sweep
    from jax.sharding import Mesh

    rng_np = np.random.default_rng(0)
    s, wmax, c, t = 4, 12, 2, 128
    corpus = PackedCorpus(
        x=rng_np.standard_normal((s, wmax, c, t)).astype(np.float32),
        y=rng_np.integers(0, 2, (s, wmax)).astype(np.int32),
        mask=np.ones((s, wmax), dtype=bool),
        subjects=tuple(f"S{i+2}" for i in range(s)),
    )
    fb = build_fold_batch(corpus, list(corpus.subjects), pad_folds_to=4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("fold",))
    cfg = ExperimentConfig(
        subjects=corpus.subjects,
        channels_to_use=("chest_ECG", "chest_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4, gru_num_layers=1),
        trainer=TrainerConfig(epochs=5, batch_size=8, resume=True,
                              early_stopping=EarlyStoppingConfig(patience=1)),
        sweep_segment_epochs=2,
    )
    r_seg = run_fold_sweep(corpus, fb, cfg, mesh, dispatch="segmented")
    r_epoch = run_fold_sweep(corpus, fb, cfg, mesh, dispatch="per_epoch")
    np.testing.assert_array_equal(np.asarray(r_seg.test_cm),
                                  np.asarray(r_epoch.test_cm))
    np.testing.assert_array_equal(np.asarray(r_seg.test_loss),
                                  np.asarray(r_epoch.test_loss))
    np.testing.assert_array_equal(np.asarray(r_seg.history.val_loss),
                                  np.asarray(r_epoch.history.val_loss))
    np.testing.assert_array_equal(np.asarray(r_seg.history.train_loss),
                                  np.asarray(r_epoch.history.train_loss))
    np.testing.assert_array_equal(np.asarray(r_seg.stop_epoch),
                                  np.asarray(r_epoch.stop_epoch))
    np.testing.assert_array_equal(np.asarray(r_seg.best_epoch),
                                  np.asarray(r_epoch.best_epoch))

    # The retired whole-sweep mode must fail loudly, not crash the runtime.
    with pytest.raises(ValueError, match="fused"):
        run_fold_sweep(corpus, fb, cfg, mesh, dispatch="fused")

    # A LIVE resume (resume=True + run_dir + an existing sweep_resume
    # checkpoint, possibly from a per_epoch run) is per_epoch-only; a fresh
    # run dir with resume=True is inert and must work (first launch of a
    # resumable job under segmented dispatch).
    r_fresh = run_fold_sweep(corpus, fb, cfg, mesh, dispatch="segmented",
                             run_dir=tmp_path)
    np.testing.assert_array_equal(np.asarray(r_fresh.test_cm),
                                  np.asarray(r_seg.test_cm))
    from multimodalsignal_tpu.parallel.fold_sweep import _RESUME_STATE
    (tmp_path / _RESUME_STATE).touch()
    with pytest.raises(ValueError, match="per_epoch"):
        run_fold_sweep(corpus, fb, cfg, mesh, dispatch="segmented",
                       run_dir=tmp_path)


def test_sweep_dropout_rng_impl_switch():
    """dropout_rng='rbg' swaps only the mask stream: the sweep still trains
    (finite, same shapes), differs from the threefry run, and each impl is
    run-to-run deterministic."""
    from multimodalsignal_tpu.data.dataset import PackedCorpus
    from multimodalsignal_tpu.parallel.fold_sweep import run_fold_sweep
    from jax.sharding import Mesh

    rng_np = np.random.default_rng(1)
    s, wmax, c, t = 4, 12, 2, 128
    corpus = PackedCorpus(
        x=rng_np.standard_normal((s, wmax, c, t)).astype(np.float32),
        y=rng_np.integers(0, 2, (s, wmax)).astype(np.int32),
        mask=np.ones((s, wmax), dtype=bool),
        subjects=tuple(f"S{i+2}" for i in range(s)),
    )
    fb = build_fold_batch(corpus, list(corpus.subjects), pad_folds_to=4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("fold",))

    def run(impl):
        cfg = ExperimentConfig(
            subjects=corpus.subjects,
            channels_to_use=("chest_ECG", "chest_EDA"),
            model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4,
                              gru_num_layers=2),
            trainer=TrainerConfig(epochs=2, batch_size=8,
                                  dropout_rng=impl,
                                  early_stopping=EarlyStoppingConfig(patience=1)),
        )
        return run_fold_sweep(corpus, fb, cfg, mesh)

    r_tf = run("threefry")
    r_rbg = run("rbg")
    assert np.isfinite(np.asarray(r_rbg.history.val_loss)).any()
    # different mask streams -> different training trajectories
    assert not np.array_equal(np.asarray(r_tf.history.val_loss),
                              np.asarray(r_rbg.history.val_loss))
    # each impl is deterministic
    np.testing.assert_array_equal(np.asarray(r_rbg.history.val_loss),
                                  np.asarray(run("rbg").history.val_loss))


@pytest.mark.slow
def test_device_count_invariance():
    """The same FoldBatch swept on a 2-device and a 4-device mesh must give
    bit-identical per-fold results (folds are independent vmap lanes; the
    mesh only changes placement), and the folds must differ from each other
    (identical CMs across folds would mean sharding fed every fold the same
    data). VERDICT r2 item 7."""
    from multimodalsignal_tpu.data.dataset import PackedCorpus
    from multimodalsignal_tpu.parallel.fold_sweep import run_fold_sweep
    from jax.sharding import Mesh

    rng_np = np.random.default_rng(7)
    s, wmax, c, t = 4, 10, 2, 64
    y = rng_np.integers(0, 2, (s, wmax)).astype(np.int32)
    corpus = PackedCorpus(
        x=(rng_np.standard_normal((s, wmax, c, t))
           + 0.8 * y[..., None, None]).astype(np.float32),
        y=y,
        mask=np.ones((s, wmax), dtype=bool),
        subjects=tuple(f"S{i+2}" for i in range(s)),
    )
    fb = build_fold_batch(corpus, list(corpus.subjects), pad_folds_to=4)
    cfg = ExperimentConfig(
        subjects=corpus.subjects,
        channels_to_use=("chest_ECG", "chest_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4, gru_num_layers=1),
        trainer=TrainerConfig(epochs=1, batch_size=8,
                              early_stopping=EarlyStoppingConfig(patience=1)),
    )
    mesh4 = Mesh(np.asarray(jax.devices()[:4]), axis_names=("fold",))
    mesh2 = Mesh(np.asarray(jax.devices()[:2]), axis_names=("fold",))
    r4 = run_fold_sweep(corpus, fb, cfg, mesh4)
    r2 = run_fold_sweep(corpus, fb, cfg, mesh2)
    cm4 = np.asarray(r4.test_cm)
    np.testing.assert_array_equal(cm4, np.asarray(r2.test_cm))
    np.testing.assert_array_equal(np.asarray(r4.history.val_loss),
                                  np.asarray(r2.history.val_loss))
    # Fold distinctness: at least one fold's CM differs from fold 0's.
    assert any(not np.array_equal(cm4[0], cm4[i]) for i in range(1, s))


@pytest.mark.slow
def test_hierarchical_sharded(preprocessed, tmp_path):  # noqa: F811
    """Two sharded sweeps + vmapped composed ternary eval on the CPU mesh."""
    from multimodalsignal_tpu.config import HierarchicalConfig
    from multimodalsignal_tpu.parallel.hierarchical_sweep import (
        run_hierarchical_sharded,
    )

    tiny_model = ModelConfig(cnn_out_channels=8, gru_hidden_size=8, gru_num_layers=1)
    base = ExperimentConfig(
        data_path=str(preprocessed / "chest_raw"),
        subjects=tuple(SUBJECTS_SMALL[:3]),
        model=tiny_model,
        trainer=TrainerConfig(epochs=2, batch_size=16,
                              early_stopping=EarlyStoppingConfig(patience=3)),
    )
    cfg = HierarchicalConfig(
        m1_channels=("chest_ECG", "chest_EDA"),
        m1_model=tiny_model,
        m2_channels=("chest_EDA", "chest_Resp"),
        m2_model=tiny_model,
        base=base,
    )
    results, summary = run_hierarchical_sharded(cfg, tmp_path)
    assert summary["num_folds"] == 3
    assert 0.0 <= summary["overall_accuracy"] <= 1.0
    assert (tmp_path / "hierarchical_summary.txt").exists()
    for r in results:
        assert r.num_test_windows > 0
        assert 0.0 <= r.composed_accuracy <= 1.0
        # Both stages export serial-layout checkpoints per fold.
        for sub in ("model_m1", "model_m2"):
            assert (tmp_path / f"fold_test_on_{r.subject}" / sub /
                    "best_model.msgpack").exists()

    # The exported run deploys: composed ternary inference from checkpoints
    # must replicate the reference gating (stress if M1 says stress, else
    # M2) exactly against the two stage predictors run by hand.
    from multimodalsignal_tpu.experiments.predict import (
        HierarchicalPredictor,
        Predictor,
    )

    hp = HierarchicalPredictor.from_run(tmp_path, fold="S2")
    assert hp.channels == ("chest_ECG", "chest_EDA", "chest_Resp")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 3, 7680)).astype(np.float32)
    probs, labels = hp.predict_windows_labeled(x, batch_size=4)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)

    m1 = Predictor.from_cfg_and_checkpoint(
        hp.m1.cfg, tmp_path / "fold_test_on_S2" / "model_m1" / "best_model.msgpack")
    m2 = Predictor.from_cfg_and_checkpoint(
        hp.m2.cfg, tmp_path / "fold_test_on_S2" / "model_m2" / "best_model.msgpack")
    p1 = m1.predict_windows(x[:, [0, 1]])
    p2 = m2.predict_windows(x[:, [1, 2]])
    want = np.where(p1.argmax(-1) == 1, 2, p2.argmax(-1))
    np.testing.assert_array_equal(labels, want)
    np.testing.assert_allclose(
        probs,
        np.stack([p1[:, 0] * p2[:, 0], p1[:, 0] * p2[:, 1], p1[:, 1]], -1),
        atol=1e-5)


@pytest.mark.slow
def test_sharded_run_exports_usable_checkpoints(preprocessed, tmp_path):  # noqa: F811
    """Sharded runs must write per-fold best_model.msgpack that Predictor
    can load and use on a raw recording."""
    from multimodalsignal_tpu.experiments.predict import Predictor
    from tests.conftest import TASKS_SMALL

    cfg = ExperimentConfig(
        data_path=str(preprocessed / "chest_raw"),
        subjects=tuple(SUBJECTS_SMALL[:3]),
        model=ModelConfig(cnn_out_channels=8, gru_hidden_size=8, gru_num_layers=1),
        trainer=TrainerConfig(epochs=1, batch_size=16,
                              early_stopping=EarlyStoppingConfig(patience=2)),
    )
    run_sharded_experiment(cfg, tmp_path)
    ckpt = tmp_path / "fold_test_on_S2" / "best_model.msgpack"
    assert ckpt.exists()
    predictor = Predictor.from_run(tmp_path, fold="S2")
    # Classify a brand-new recording the run never saw.
    from multimodalsignal_tpu.data.synthetic import write_synthetic_wesad
    root = tmp_path / "wesad_new"
    write_synthetic_wesad(root, ["S99"], tasks=TASKS_SMALL, seed=5)
    result = predictor.predict_recording(root / "S99" / "S99.pkl")
    assert len(result.labels) > 0
    assert np.isfinite(result.probs).all()


def test_pack_pools_pad_within_fold():
    """Padded pool slots must reference the fold's OWN windows (not global
    flat index 0 = another fold's test subject) so zero-weight padded rows
    can't contaminate train-mode BatchNorm statistics across folds."""
    from multimodalsignal_tpu.parallel.fold_sweep import _pack_pools

    pools = [np.asarray([7, 8, 9]), np.asarray([42])]
    out, n = _pack_pools(pools, pad_to_folds=3)
    assert n.tolist() == [3, 1, 0]
    assert out[0].tolist() == [7, 8, 9]
    assert out[1].tolist() == [42, 42, 42]  # padded with own first index


@pytest.mark.slow
def test_sweep_resume_bit_identical(tmp_path):
    """Kill the sweep mid-run (preemption drill) and resume from the sweep
    checkpoint: final metrics must be bit-identical to an uninterrupted run
    (VERDICT: sweep-level fault tolerance, SURVEY.md §5)."""
    import dataclasses

    from jax.sharding import Mesh

    from multimodalsignal_tpu.data.dataset import PackedCorpus
    from multimodalsignal_tpu.parallel.fold_sweep import SweepAborted, run_fold_sweep

    rng_np = np.random.default_rng(7)
    s, wmax, c, t = 4, 12, 2, 128
    corpus = PackedCorpus(
        x=rng_np.standard_normal((s, wmax, c, t)).astype(np.float32),
        y=rng_np.integers(0, 2, (s, wmax)).astype(np.int32),
        mask=np.ones((s, wmax), dtype=bool),
        subjects=tuple(f"S{i+2}" for i in range(s)),
    )
    fb = build_fold_batch(corpus, list(corpus.subjects), pad_folds_to=4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("fold",))
    cfg = ExperimentConfig(
        subjects=corpus.subjects,
        channels_to_use=("chest_ECG", "chest_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4, gru_num_layers=1),
        trainer=TrainerConfig(epochs=5, batch_size=8,
                              early_stopping=EarlyStoppingConfig(patience=10)),
    )
    r_full = run_fold_sweep(corpus, fb, cfg, mesh)

    cfg_ckpt = dataclasses.replace(
        cfg, trainer=dataclasses.replace(cfg.trainer, checkpoint_every=2, resume=True)
    )
    with pytest.raises(SweepAborted):
        run_fold_sweep(corpus, fb, cfg_ckpt, mesh, run_dir=tmp_path,
                       abort_after_epoch=3)
    assert (tmp_path / "sweep_resume.msgpack").exists()
    r_resumed = run_fold_sweep(corpus, fb, cfg_ckpt, mesh, run_dir=tmp_path)

    np.testing.assert_array_equal(np.asarray(r_full.test_cm),
                                  np.asarray(r_resumed.test_cm))
    np.testing.assert_array_equal(np.asarray(r_full.test_loss),
                                  np.asarray(r_resumed.test_loss))
    np.testing.assert_array_equal(np.asarray(r_full.history.val_loss),
                                  np.asarray(r_resumed.history.val_loss))
    np.testing.assert_array_equal(np.asarray(r_full.history.train_loss),
                                  np.asarray(r_resumed.history.train_loss))
    np.testing.assert_array_equal(np.asarray(r_full.best_epoch),
                                  np.asarray(r_resumed.best_epoch))
    np.testing.assert_array_equal(np.asarray(r_full.stop_epoch),
                                  np.asarray(r_resumed.stop_epoch))


@pytest.mark.slow
def test_sweep_class_weights_change_training():
    """trainer.use_class_weights (the reference's intended-but-dead branch,
    trainer.py:80-97) must reach the sweep's loss: with a heavily imbalanced
    corpus, balanced weighting changes the training trajectory vs uniform
    weighting, and weighting off stays the exact default behavior (ones are
    a no-op — covered bitwise by test_dispatch_modes_equivalent)."""
    import dataclasses

    from jax.sharding import Mesh

    from multimodalsignal_tpu.data.dataset import PackedCorpus
    from multimodalsignal_tpu.parallel.fold_sweep import run_fold_sweep

    rng_np = np.random.default_rng(1)
    s, wmax, c, t = 4, 16, 2, 128
    y = np.zeros((s, wmax), np.int32)
    y[:, :2] = 1  # 12.5% minority
    corpus = PackedCorpus(
        x=(rng_np.standard_normal((s, wmax, c, t))
           + 0.5 * y[..., None, None]).astype(np.float32),
        y=y,
        mask=np.ones((s, wmax), dtype=bool),
        subjects=tuple(f"S{i+2}" for i in range(s)),
    )
    fb = build_fold_batch(corpus, list(corpus.subjects), pad_folds_to=4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("fold",))
    cfg = ExperimentConfig(
        subjects=corpus.subjects,
        channels_to_use=("chest_ECG", "chest_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4,
                          gru_num_layers=1),
        trainer=TrainerConfig(epochs=2, batch_size=8,
                              early_stopping=EarlyStoppingConfig(patience=5)),
    )
    r_plain = run_fold_sweep(corpus, fb, cfg, mesh)
    cfg_cw = dataclasses.replace(
        cfg, trainer=dataclasses.replace(cfg.trainer, use_class_weights=True)
    )
    r_cw = run_fold_sweep(corpus, fb, cfg_cw, mesh)
    assert not np.allclose(np.asarray(r_plain.history.train_loss),
                           np.asarray(r_cw.history.train_loss))
    assert not np.array_equal(np.asarray(r_plain.test_cm),
                              np.asarray(r_cw.test_cm))


def test_replicate_fold_batch_and_mesh():
    """Host-side replication math: tiling, padding, divisibility."""
    from multimodalsignal_tpu.parallel.replicated_sweep import (
        make_replicated_mesh,
        replicate_fold_batch,
    )

    mesh, per_group = make_replicated_mesh(3, 2, devices=jax.devices()[:8])
    assert (per_group * 2) % mesh.devices.size == 0
    assert per_group >= 3

    fb = FoldBatch(
        train_pool=np.arange(8, dtype=np.int32).reshape(4, 2),
        n_train=np.asarray([2, 2, 1, 2], np.int32),
        val_pool=np.arange(4, dtype=np.int32).reshape(4, 1),
        n_val=np.ones(4, np.int32),
        test_pool=np.arange(4, dtype=np.int32).reshape(4, 1),
        n_test=np.ones(4, np.int32),
        fold_valid=np.asarray([True, True, True, False]),
        test_subjects=("S2", "S3", "S4"),
    )
    rfb = replicate_fold_batch(fb, 3)
    assert rfb.train_pool.shape == (12, 2)
    for g in range(3):
        np.testing.assert_array_equal(rfb.train_pool[g * 4:(g + 1) * 4],
                                      fb.train_pool)
        np.testing.assert_array_equal(rfb.fold_valid[g * 4:(g + 1) * 4],
                                      fb.fold_valid)
    assert rfb.test_subjects == fb.test_subjects


@pytest.mark.slow
def test_replicated_sweep_matches_single_seed_runs(tmp_path):
    """Seed-replicated sweep (folds x seeds lanes): every seed group must be
    bit-identical to the single-seed sweep at that seed, groups must differ
    from each other, and the summary's variance decomposition must agree
    with the per-lane confusion matrices."""
    from jax.sharding import Mesh

    from multimodalsignal_tpu.data.dataset import PackedCorpus
    from multimodalsignal_tpu.parallel.fold_sweep import run_fold_sweep
    from multimodalsignal_tpu.parallel.replicated_sweep import (
        make_replicated_mesh,
        replicate_fold_batch,
        summarize_replicated,
    )

    rng_np = np.random.default_rng(3)
    s, wmax, c, t = 4, 10, 2, 64
    y = rng_np.integers(0, 2, (s, wmax)).astype(np.int32)
    corpus = PackedCorpus(
        x=(rng_np.standard_normal((s, wmax, c, t))
           + 0.6 * y[..., None, None]).astype(np.float32),
        y=y,
        mask=np.ones((s, wmax), dtype=bool),
        subjects=tuple(f"S{i+2}" for i in range(s)),
    )
    cfg = ExperimentConfig(
        subjects=corpus.subjects,
        channels_to_use=("chest_ECG", "chest_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4,
                          gru_num_layers=1),
        trainer=TrainerConfig(epochs=2, batch_size=8,
                              early_stopping=EarlyStoppingConfig(patience=5)),
    )
    seeds = (42, 7)
    mesh, per_group = make_replicated_mesh(s, len(seeds),
                                           devices=jax.devices()[:8])
    fb = build_fold_batch(corpus, list(corpus.subjects), seed=cfg.seed,
                          pad_folds_to=per_group)
    rfb = replicate_fold_batch(fb, len(seeds))
    assert rfb.train_pool.shape[0] == per_group * len(seeds)

    r_rep = run_fold_sweep(corpus, rfb, cfg, mesh, seeds=seeds)

    # Each group == the single-seed sweep at that seed, bit-for-bit.
    single_mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("fold",))
    for g, seed in enumerate(seeds):
        r_one = run_fold_sweep(corpus, fb, cfg, single_mesh, seeds=(seed,))
        sl = slice(g * per_group, (g + 1) * per_group)
        np.testing.assert_array_equal(np.asarray(r_rep.test_cm)[sl],
                                      np.asarray(r_one.test_cm))
        np.testing.assert_array_equal(
            np.asarray(r_rep.history.val_loss)[sl],
            np.asarray(r_one.history.val_loss),
        )
    # seeds=(cfg.seed,) is the plain sweep's RNG stream exactly.
    r_plain = run_fold_sweep(corpus, fb, cfg, single_mesh)
    np.testing.assert_array_equal(
        np.asarray(r_rep.test_cm)[:per_group], np.asarray(r_plain.test_cm)
    )
    # Different seeds actually train differently.
    assert not np.array_equal(
        np.asarray(r_rep.history.val_loss)[:per_group],
        np.asarray(r_rep.history.val_loss)[per_group:],
    )

    summary = summarize_replicated(r_rep, fb, seeds, per_group)
    acc = np.asarray(summary["accuracy"])
    assert acc.shape == (len(seeds), len(fb.test_subjects))
    from multimodalsignal_tpu.train import metrics as M

    cm00 = np.asarray(r_rep.test_cm)[0]
    assert acc[0, 0] == pytest.approx(float(M.accuracy_from_cm(cm00)))
    assert summary["grand_mean_accuracy"] == pytest.approx(acc.mean())
    assert summary["seed_std_of_mean_accuracy"] == pytest.approx(
        acc.mean(axis=1).std(ddof=1)
    )


@pytest.mark.slow
def test_replicated_sweep_seed_chunking(preprocessed, tmp_path):  # noqa: F811
    """seed_chunk=1 (one launch per seed group) must produce the exact
    per-(seed, fold) matrices of the monolithic all-seeds launch: seed
    groups are independent programs, so sequential launches change nothing
    semantically (and on the CPU mesh, nothing bitwise either)."""
    from multimodalsignal_tpu.parallel.replicated_sweep import (
        run_replicated_experiment,
    )

    cfg = ExperimentConfig(
        data_path=str(preprocessed / "chest_raw"),
        subjects=tuple(SUBJECTS_SMALL[:3]),
        channels_to_use=("chest_ECG", "chest_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4,
                          gru_num_layers=1),
        trainer=TrainerConfig(epochs=2, batch_size=8,
                              early_stopping=EarlyStoppingConfig(patience=5)),
    )
    seeds = (42, 7)
    mono = run_replicated_experiment(cfg, seeds, tmp_path / "mono")
    chunked = run_replicated_experiment(cfg, seeds, tmp_path / "chunked",
                                        seed_chunk=1)

    np.testing.assert_array_equal(np.asarray(chunked["accuracy"]),
                                  np.asarray(mono["accuracy"]))
    np.testing.assert_array_equal(np.asarray(chunked["f1"]),
                                  np.asarray(mono["f1"]))
    assert chunked["seed_chunk"] == 1
    assert len(chunked["launch_walls_s"]) == 2
    assert len(mono["launch_walls_s"]) == 1
    assert (tmp_path / "chunked" / "seed_summary.json").exists()
    assert (tmp_path / "chunked" / "seed_fold_matrix.npz").exists()


@pytest.mark.slow
def test_replicated_sweep_oom_autohalving(preprocessed, tmp_path,
                                          monkeypatch):  # noqa: F811
    """A RESOURCE_EXHAUSTED launch failure must restart the sweep with the
    per-launch seed count halved (down to single-group launches) and still
    produce the single-group-launch results; any other error propagates."""
    import multimodalsignal_tpu.parallel.replicated_sweep as rs

    cfg = ExperimentConfig(
        data_path=str(preprocessed / "chest_raw"),
        subjects=tuple(SUBJECTS_SMALL[:3]),
        channels_to_use=("chest_ECG", "chest_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4,
                          gru_num_layers=1),
        trainer=TrainerConfig(epochs=2, batch_size=8,
                              early_stopping=EarlyStoppingConfig(patience=5)),
    )
    seeds = (42, 7)
    reference = rs.run_replicated_experiment(cfg, seeds, tmp_path / "ref",
                                             seed_chunk=1)

    real_run_fold_sweep = rs.run_fold_sweep
    launches = []

    def fake_oom_above_one_group(corpus, rfb, cfg_, mesh, seeds=(None,),
                                 **kw):
        launches.append(len(seeds))
        if len(seeds) > 1:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory allocating X bytes"
            )
        return real_run_fold_sweep(corpus, rfb, cfg_, mesh, seeds=seeds,
                                   **kw)

    monkeypatch.setattr(rs, "run_fold_sweep", fake_oom_above_one_group)
    halved = rs.run_replicated_experiment(cfg, seeds, tmp_path / "halved")

    # One failed 2-group launch, then two successful 1-group launches.
    assert launches == [2, 1, 1]
    assert halved["seed_chunk"] == 1
    assert len(halved["launch_walls_s"]) == 2
    np.testing.assert_array_equal(np.asarray(halved["accuracy"]),
                                  np.asarray(reference["accuracy"]))

    # Non-OOM errors do NOT trigger the retry loop.
    def fake_other_error(*a, **kw):
        raise RuntimeError("INVALID_ARGUMENT: something unrelated")

    monkeypatch.setattr(rs, "run_fold_sweep", fake_other_error)
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        rs.run_replicated_experiment(cfg, seeds, tmp_path / "err")

    # Already at 1-group launches, OOM propagates (halving exhausted).
    def fake_always_oom(*a, **kw):
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory")

    monkeypatch.setattr(rs, "run_fold_sweep", fake_always_oom)
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        rs.run_replicated_experiment(cfg, seeds, tmp_path / "err2",
                                     seed_chunk=1)
