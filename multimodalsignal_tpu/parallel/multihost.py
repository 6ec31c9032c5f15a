"""Multi-host (multi-process) execution for the fold/sweep meshes.

The reference is strictly single-process, single-device (SURVEY.md §5
"Distributed communication backend": no torch.distributed/NCCL/MPI anywhere;
the fold loop is serial at reference main.py:98). The TPU-native scale-out
path is: `jax.distributed.initialize` joins N processes (one per host) into
one runtime, `jax.devices()` becomes the GLOBAL device list, and the existing
1-D `fold` mesh (fold_sweep.make_fold_mesh) simply spans all of them — the
sweep program itself is unchanged SPMD.

Design (matches the scaling-book recipe and SURVEY §5):
  * The packed corpus is small (a few hundred MB at most) and is staged
    IDENTICALLY on every process from the same config — data is replicated,
    never scattered, so no input collective is needed beyond the one XLA
    inserts for the replicated operand.
  * Per-fold state (params, Adam moments, BN stats, early-stop machines)
    is fold-sharded: folds assigned to another host's devices never touch
    this host's memory.
  * The only cross-host (DCN) traffic is the per-epoch log gather and the
    final metric/params gather — a few KB/epoch plus one ~MB gather at the
    end, exactly the "all-gather of per-fold scalars" SURVEY §5 prescribes.

Host-side array movement differs between single- and multi-process JAX:
`jax.device_put(x, sharding)` and `np.asarray(global_array)` only work when
every shard is process-addressable. The two helpers below (`put_global`,
`to_host`) wrap the multi-process-safe forms (`jax.make_array_from_callback`
to scatter host data onto a global sharding; a jitted identity with
replicated `out_shardings` to all-gather results back) and reduce to the
plain fast paths in single-process runs, so the sweep code has ONE code path.

Validated by tests/test_multihost.py: two `jax.distributed` CPU processes on
localhost (4 virtual devices each) run the sharded LOSO sweep end-to-end and
the results are bit-identical to a single-process 8-device run.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize",
    "maybe_initialize_from_env",
    "is_primary",
    "put_global",
    "to_host",
    "sync",
]


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join this process into a multi-process JAX runtime.

    Call before any JAX computation (ideally first thing in main()). After
    this, `jax.devices()` is the global device list across all processes and
    `make_fold_mesh` builds a mesh spanning every host. On CPU, cross-process
    collectives ride Gloo; on TPU pods, ICI within a slice and DCN across.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def maybe_initialize_from_env() -> bool:
    """Initialize from MMS_COORDINATOR / MMS_NUM_PROCESSES / MMS_PROCESS_ID
    env vars when all are set; returns True if distributed mode was entered.

    On TPU pods provisioned by standard tooling (GKE/queued resources),
    plain `jax.distributed.initialize()` auto-discovers everything — these
    env vars serve manual/CPU bring-up, e.g.:

        MMS_COORDINATOR=host0:9731 MMS_NUM_PROCESSES=2 MMS_PROCESS_ID=0 \\
            python -m multimodalsignal_tpu.main --execution sharded ...
    """
    coord = os.environ.get("MMS_COORDINATOR")
    nproc = os.environ.get("MMS_NUM_PROCESSES")
    pid = os.environ.get("MMS_PROCESS_ID")
    if not (coord and nproc and pid):
        return False
    initialize(coord, int(nproc), int(pid))
    return True


def is_primary() -> bool:
    """True on the process that owns run-dir artifact writes (process 0)."""
    return jax.process_index() == 0


def _multi() -> bool:
    return jax.process_count() > 1


def put_global(tree, sharding: NamedSharding):
    """device_put a host pytree onto a (possibly multi-process) sharding.

    Every process must hold the SAME full-value leaves (our invariant: the
    corpus and fold batch are staged identically everywhere from the same
    config/seed). Single-process: plain jax.device_put. Multi-process:
    jax.make_array_from_callback builds the global array, each process
    materializing only its addressable shards.
    """
    if not _multi():
        return jax.device_put(tree, sharding)

    def put_leaf(leaf):
        host = np.asarray(leaf)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )

    return jax.tree_util.tree_map(put_leaf, tree)


# One jitted all-gather identity per mesh: a fresh jax.jit(lambda) per call
# would retrace (and on some backends recompile) every epoch.
_GATHER_CACHE: dict = {}


def _gather_fn(mesh: Mesh):
    fn = _GATHER_CACHE.get(mesh)
    if fn is None:
        repl = NamedSharding(mesh, P())
        fn = jax.jit(lambda t: t, out_shardings=repl)
        _GATHER_CACHE[mesh] = fn
    return fn


def to_host(tree, mesh: Mesh):
    """Bring a device pytree to host numpy on EVERY process.

    Single-process: plain np.asarray per leaf. Multi-process: a jitted
    identity with fully-replicated out_shardings all-gathers each leaf
    (the one cross-host collective of the sweep), after which the global
    arrays are fully addressable and convert to numpy everywhere.
    """
    if not _multi():
        return jax.tree_util.tree_map(np.asarray, tree)
    gathered = _gather_fn(mesh)(tree)
    return jax.tree_util.tree_map(np.asarray, gathered)


def assert_agreement(value: int, name: str) -> None:
    """Raise unless every process holds the same integer `value`.

    Guards host-side control decisions that MUST match across processes
    (e.g. the resume epoch read from a possibly non-shared run dir): a
    divergence would desynchronize the per-epoch collective schedule and
    hang or corrupt the job. No-op single-process."""
    if not _multi():
        return
    from jax.experimental import multihost_utils

    values = np.asarray(
        multihost_utils.process_allgather(np.int32(value)))
    if not (values == values.flat[0]).all():
        raise RuntimeError(
            f"multi-host disagreement on {name}: per-process values "
            f"{values.tolist()} — is the run dir shared/replicated across "
            f"hosts? (checkpoint/resume requires every process to see the "
            f"same sweep_resume files)")


def sync(name: str = "mms_sync") -> None:
    """Barrier across processes (no-op single-process). Used before
    primary-only artifact reads that other processes produce."""
    if _multi():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
