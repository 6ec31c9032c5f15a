"""Multi-host (multi-process) fold sweep: two `jax.distributed` CPU
processes on localhost (4 virtual devices each) run the sharded LOSO sweep
over one GLOBAL 8-device fold mesh, and the results must be bit-identical
to a single-process 8-device run (SURVEY.md §5 "Distributed communication
backend"; the serial loop being scaled is reference main.py:98).

The single-process baseline runs in THIS process (conftest's 8-device CPU
mesh) through the very same run_sweep() helper the workers use, so the two
runs differ only in process topology."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests import multihost_worker

REPO = Path(__file__).resolve().parent.parent


def _spawn_worker(pid: int, nproc: int, port: int, out: Path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    # The workers must not inherit a TPU platform from the ambient env.
    env.pop("MMS_COORDINATOR", None)
    return subprocess.Popen(
        [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
         str(pid), str(nproc), str(port), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.slow
def test_two_process_sweep_bit_identical_to_single(tmp_path):
    # Baseline: single process, 8 local devices (conftest), same helper.
    result, fb = multihost_worker.run_sweep()
    base_path = tmp_path / "single.npz"
    multihost_worker.dump_result(result, fb, base_path)

    # Distributed: 2 processes x 4 devices, same global device count.
    # Bind an ephemeral socket to find a genuinely free coordinator port.
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out = tmp_path / "dist.npz"
    procs = [_spawn_worker(i, 2, port, out) for i in range(2)]
    outputs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=540)
            outputs.append(stdout)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outputs))
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{stdout}"
    assert out.exists(), "primary worker wrote no result"

    with np.load(base_path) as single, np.load(out) as dist:
        assert set(single.files) == set(dist.files)
        # Real folds must be bit-identical between process topologies; padded
        # (invalid) folds are dropped from the contract.
        valid = single["fold_valid"]
        assert valid.sum() == 4
        for key in single.files:
            a, b = single[key], dist[key]
            if a.shape and a.shape[0] == len(valid):
                a, b = a[valid], b[valid]
            np.testing.assert_array_equal(
                a, b, err_msg=f"{key} differs between 1- and 2-process runs"
            )
    # Distinct real folds (the sweep actually trained different folds).
    with np.load(base_path) as single:
        tl = single["test_loss"][single["fold_valid"]]
        assert len(np.unique(tl)) > 1


def test_helpers_single_process_fast_paths():
    """put_global/to_host/assert_agreement/sync reduce to plain
    device_put/np.asarray/no-ops in single-process runs (the code path every
    non-pod user exercises)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from multimodalsignal_tpu.parallel import multihost

    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("fold",))
    shard = NamedSharding(mesh, P("fold"))
    tree = {"a": np.arange(8, dtype=np.float32),
            "b": (np.ones((8, 3), np.float32),
                  np.full((8,), 7, np.int32))}
    dev = multihost.put_global(tree, shard)
    assert dev["a"].sharding.is_equivalent_to(shard, 1)
    host = multihost.to_host(dev, mesh)
    np.testing.assert_array_equal(host["a"], tree["a"])
    np.testing.assert_array_equal(host["b"][0], tree["b"][0])
    assert isinstance(host["a"], np.ndarray)
    # Scalars/no-ops must not throw in single-process mode.
    multihost.assert_agreement(5, "noop")
    multihost.sync("noop")
    assert multihost.is_primary()
    # Gather-fn memoization: same mesh -> same jitted identity object.
    from multimodalsignal_tpu.parallel.multihost import _gather_fn
    assert _gather_fn(mesh) is _gather_fn(mesh)


def test_env_initialize_requires_all_three(monkeypatch):
    """Partial MMS_* env must not attempt distributed init."""
    from multimodalsignal_tpu.parallel import multihost

    monkeypatch.delenv("MMS_COORDINATOR", raising=False)
    monkeypatch.delenv("MMS_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("MMS_PROCESS_ID", raising=False)
    assert multihost.maybe_initialize_from_env() is False
    monkeypatch.setenv("MMS_COORDINATOR", "localhost:1")
    monkeypatch.setenv("MMS_NUM_PROCESSES", "2")
    # PROCESS_ID still missing -> no init attempt (which would hang).
    assert multihost.maybe_initialize_from_env() is False
