"""Worker process for tests/test_multihost.py: joins a 2-process
jax.distributed CPU runtime and runs one of the sharded sweeps over the
GLOBAL (cross-process) fold mesh.

Run as: python tests/multihost_worker.py <pid> <nproc> <port> <out> <mode> [...]
Modes (each paired with an in-process single-topology baseline in the test):
  sweep                      — plain LOSO fold sweep (default)
  abort <run_dir>            — per_epoch sweep with checkpoint_every=1,
                               preemption drill after epoch 2 (SweepAborted)
  resume <run_dir>           — restore the aborted sweep and finish; results
                               must be bit-identical to an uninterrupted run
                               (exercises assert_agreement + put_global
                               redistribution, fold_sweep.py resume path)
  replicated <data> <run>    — folds x seeds replicated sweep from disk
  hierarchical <data> <run>  — M1/M2 sweeps + composed ternary eval

Also importable (make_corpus_and_cfg / run_sweep / dump_result are shared
with the in-process baseline so both runs are the same code path by
construction).
"""

import os
import sys

if __name__ == "__main__":
    # Env must be set before jax backends initialize. 4 virtual devices per
    # process x 2 processes = the same 8 global devices as the baseline.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax
import numpy as np


def make_corpus_and_cfg():
    """Deterministic in-memory corpus + tiny sweep config. Each process
    regenerates it identically (the multihost invariant: data is staged
    identically everywhere; only fold state is sharded)."""
    from multimodalsignal_tpu.config import (
        EarlyStoppingConfig,
        ExperimentConfig,
        ModelConfig,
        TrainerConfig,
    )
    from multimodalsignal_tpu.data.dataset import PackedCorpus

    rng_np = np.random.default_rng(7)
    s, wmax, c, t = 4, 10, 2, 128
    corpus = PackedCorpus(
        x=rng_np.standard_normal((s, wmax, c, t)).astype(np.float32),
        y=rng_np.integers(0, 2, (s, wmax)).astype(np.int32),
        mask=np.ones((s, wmax), dtype=bool),
        subjects=tuple(f"S{i + 2}" for i in range(s)),
    )
    cfg = ExperimentConfig(
        subjects=corpus.subjects,
        channels_to_use=("chest_ECG", "chest_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=8,
                          gru_num_layers=1),
        trainer=TrainerConfig(
            epochs=3, batch_size=8, learning_rate=3e-3,
            early_stopping=EarlyStoppingConfig(patience=5),
        ),
        fold_execution="sharded",
    )
    return corpus, cfg


def run_sweep(run_dir=None, abort_after_epoch=None, resume=False,
              checkpoint_every=0):
    """Build the fold mesh from the GLOBAL device list and run the sweep.

    The optional checkpoint/resume knobs drive the preemption drill
    (fold_sweep.py run_fold_sweep fault tolerance): the math is unchanged,
    so a checkpointed/aborted/resumed run must be bit-identical to a plain
    run_sweep() — the multi-host contract under test."""
    import dataclasses

    from multimodalsignal_tpu.parallel.fold_sweep import (
        build_fold_batch,
        make_fold_mesh,
        run_fold_sweep,
    )

    corpus, cfg = make_corpus_and_cfg()
    if checkpoint_every or resume:
        cfg = dataclasses.replace(
            cfg, trainer=dataclasses.replace(
                cfg.trainer, checkpoint_every=checkpoint_every,
                resume=resume))
    mesh, padded = make_fold_mesh(len(corpus.subjects))
    fb = build_fold_batch(corpus, list(corpus.subjects), cfg.val_fraction,
                          cfg.seed, pad_folds_to=padded)
    result = run_fold_sweep(corpus, fb, cfg, mesh, run_dir=run_dir,
                            abort_after_epoch=abort_after_epoch)
    return result, fb


def make_disk_cfg(data_path):
    """Tiny 4-fold config over an on-disk preprocessed tree (the replicated
    sweep smoke: 4 folds x 2 seeds = 8 lanes over the 8 global devices)."""
    from multimodalsignal_tpu.config import (
        EarlyStoppingConfig,
        ExperimentConfig,
        ModelConfig,
        TrainerConfig,
    )
    from pathlib import Path

    return ExperimentConfig(
        data_path=str(Path(data_path) / "chest_raw"),
        subjects=("S2", "S3", "S4", "S5"),
        channels_to_use=("chest_ECG", "chest_EDA"),
        model=ModelConfig(cnn_out_channels=4, gru_hidden_size=4,
                          gru_num_layers=1),
        trainer=TrainerConfig(
            epochs=2, batch_size=8,
            early_stopping=EarlyStoppingConfig(patience=5),
        ),
        fold_execution="sharded",
    )


REPLICATE_SEEDS = (42, 7)


def make_hier_cfg(data_path):
    """Tiny 3-fold hierarchical config (M1 stress_binary + M2
    amusement_binary + composed ternary eval) over an on-disk tree."""
    import dataclasses

    from multimodalsignal_tpu.config import HierarchicalConfig, ModelConfig

    base = dataclasses.replace(
        make_disk_cfg(data_path), subjects=("S2", "S3", "S4"),
    )
    tiny = ModelConfig(cnn_out_channels=4, gru_hidden_size=4,
                       gru_num_layers=1)
    return HierarchicalConfig(
        m1_channels=("chest_ECG", "chest_EDA"),
        m1_model=tiny,
        m2_channels=("chest_EDA", "chest_Resp"),
        m2_model=tiny,
        base=base,
    )


def run_replicated(data_path, run_dir):
    from multimodalsignal_tpu.parallel.replicated_sweep import (
        run_replicated_experiment,
    )

    return run_replicated_experiment(make_disk_cfg(data_path),
                                     REPLICATE_SEEDS, run_dir)


def dump_replicated(summary, path):
    np.savez(path,
             accuracy=np.asarray(summary["accuracy"]),
             f1=np.asarray(summary["f1"]))


def run_hierarchical(data_path, run_dir):
    from multimodalsignal_tpu.parallel.hierarchical_sweep import (
        run_hierarchical_sharded,
    )

    return run_hierarchical_sharded(make_hier_cfg(data_path), run_dir)


def dump_hierarchical(results, summary, path):
    np.savez(
        path,
        m1_accuracy=np.asarray([r.m1_accuracy for r in results]),
        m1_f1=np.asarray([r.m1_f1 for r in results]),
        composed_accuracy=np.asarray([r.composed_accuracy for r in results]),
        composed_f1=np.asarray([r.composed_f1 for r in results]),
        num_test_windows=np.asarray([r.num_test_windows for r in results]),
        overall_accuracy=np.asarray(summary["overall_accuracy"]),
        overall_f1=np.asarray(summary["overall_f1"]),
    )


def dump_result(result, fb, path):
    np.savez(
        path,
        test_loss=result.test_loss,
        test_cm=result.test_cm,
        best_epoch=result.best_epoch,
        stop_epoch=result.stop_epoch,
        val_loss=result.history.val_loss,
        val_acc=result.history.val_acc,
        train_loss=result.history.train_loss,
        fold_valid=fb.fold_valid,
    )


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "sweep"
    jax.config.update("jax_platforms", "cpu")

    from multimodalsignal_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    if mode == "sweep":
        result, fb = run_sweep()
        # to_host all-gathers inside the sweep, so EVERY process holds the
        # full results; the primary-writes convention is exercised here too.
        if multihost.is_primary():
            dump_result(result, fb, out)
    elif mode == "abort":
        # Preemption drill, phase 1: checkpoint every epoch into the SHARED
        # run dir, die (on every process, same epoch) right after epoch 2.
        from multimodalsignal_tpu.parallel.fold_sweep import SweepAborted

        try:
            run_sweep(run_dir=sys.argv[6], abort_after_epoch=2,
                      checkpoint_every=1)
        except SweepAborted as e:
            print(f"[worker {pid}] aborted as drilled: {e}", flush=True)
        else:
            raise AssertionError("abort drill did not raise SweepAborted")
    elif mode == "resume":
        # Phase 2: restore the shared sweep_resume checkpoint (exercises
        # assert_agreement on the resume epoch + put_global redistribution
        # of the carry across BOTH processes' devices) and finish.
        result, fb = run_sweep(run_dir=sys.argv[6], resume=True,
                               checkpoint_every=1)
        if multihost.is_primary():
            dump_result(result, fb, out)
    elif mode == "replicated":
        summary = run_replicated(sys.argv[6], sys.argv[7])
        if multihost.is_primary():
            dump_replicated(summary, out)
    elif mode == "hierarchical":
        results, summary = run_hierarchical(sys.argv[6], sys.argv[7])
        if multihost.is_primary():
            dump_hierarchical(results, summary, out)
    else:
        raise SystemExit(f"unknown worker mode {mode!r}")
    multihost.sync("test_multihost_done")
    print(f"[worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()
