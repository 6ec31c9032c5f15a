"""Parallel execution: fold-level SPMD over a `fold` mesh axis.

The reference runs its 15 LOSO folds as a serial Python loop
(reference main.py:98); here the whole cross-validation is ONE jitted
computation vmapped over folds and sharded across devices via
jax.sharding.Mesh — the structural TPU-native win (SURVEY.md §2
"Parallelism strategies")."""

from multimodalsignal_tpu.parallel import multihost
from multimodalsignal_tpu.parallel.fold_sweep import (
    FoldBatch,
    build_fold_batch,
    make_fold_mesh,
    run_fold_sweep,
    run_sharded_experiment,
)

__all__ = [
    "FoldBatch",
    "build_fold_batch",
    "make_fold_mesh",
    "multihost",
    "run_fold_sweep",
    "run_sharded_experiment",
]
