"""Worker process for tests/test_multihost.py: joins a 2-process
jax.distributed CPU runtime and runs the sharded LOSO fold sweep over the
GLOBAL (cross-process) fold mesh.

Run as: python tests/multihost_worker.py <pid> <nproc> <port> <out.npz>
The test asserts process 0's results are bit-identical to a single-process
run of `run_sweep` on the same 8 virtual devices.

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


def run_sweep():
    """Build the fold mesh from the GLOBAL device list and run the sweep."""
    from multimodalsignal_tpu.parallel.fold_sweep import (
        build_fold_batch,
        make_fold_mesh,
        run_fold_sweep,
    )

    corpus, cfg = make_corpus_and_cfg()
    mesh, padded = make_fold_mesh(len(corpus.subjects))
    fb = build_fold_batch(corpus, list(corpus.subjects), cfg.val_fraction,
                          cfg.seed, pad_folds_to=padded)
    return run_fold_sweep(corpus, fb, cfg, mesh), fb


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
    jax.config.update("jax_platforms", "cpu")

    from multimodalsignal_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    result, fb = run_sweep()
    # to_host all-gathers inside the sweep, so EVERY process holds the full
    # results; the primary-writes convention is exercised here too.
    if multihost.is_primary():
        dump_result(result, fb, out)
    multihost.sync("test_multihost_done")
    print(f"[worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()
