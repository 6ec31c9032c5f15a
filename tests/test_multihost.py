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


def _spawn_worker(pid: int, nproc: int, port: int, out: Path, *extra: str):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    # The workers must not inherit a TPU platform from the ambient env.
    env.pop("MMS_COORDINATOR", None)
    return subprocess.Popen(
        [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
         str(pid), str(nproc), str(port), str(out),
         *(str(a) for a in extra)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(out: Path, mode: str, per_process_extra) -> None:
    """Spawn a 2-process jax.distributed run in the given worker mode and
    assert both workers exit cleanly. per_process_extra: extra argv per pid."""
    port = _free_port()
    procs = [_spawn_worker(i, 2, port, out, mode, *per_process_extra[i])
             for i in range(2)]
    outputs = ["", ""]
    try:
        for i, p in enumerate(procs):
            outputs[i], _ = p.communicate(timeout=540)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multihost {mode} workers timed out:\n"
                    + "\n".join(outputs))
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f"{mode} worker failed:\n{stdout}"


def _tree_files(root: Path) -> list[str]:
    return sorted(str(p.relative_to(root))
                  for p in root.rglob("*") if p.is_file())


@pytest.fixture(scope="module")
def disk_data(tmp_path_factory):
    """On-disk preprocessed tree shared by the worker processes and the
    in-process baselines (the replicated/hierarchical entry points stage
    their corpus from disk, unlike the in-memory run_sweep corpus)."""
    from multimodalsignal_tpu.config import PreprocessConfig
    from multimodalsignal_tpu.data.preprocess import run_preprocessing
    from multimodalsignal_tpu.data.synthetic import write_synthetic_wesad

    from tests.conftest import SUBJECTS_SMALL, TASKS_SMALL

    root = tmp_path_factory.mktemp("mh_wesad")
    out = tmp_path_factory.mktemp("mh_data")
    write_synthetic_wesad(root, SUBJECTS_SMALL, tasks=TASKS_SMALL, seed=0)
    run_preprocessing(PreprocessConfig(
        wesad_root=str(root), output_path=str(out),
        subjects=tuple(SUBJECTS_SMALL),
    ))
    return out


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


@pytest.mark.slow
def test_two_process_resume_bit_identical(tmp_path):
    """Multi-host preemption drill: a 2-process sweep checkpoints every
    epoch into a SHARED run dir and dies after epoch 2 (SweepAborted on both
    processes); a fresh 2-process launch restores it — exercising
    assert_agreement on the resume epoch and the put_global redistribution
    of the restored carry across both processes' devices
    (fold_sweep.py resume path) — and the finished results must be
    bit-identical to an uninterrupted single-process run."""
    # Baseline: uninterrupted, single process, 8 local devices.
    result, fb = multihost_worker.run_sweep()
    base_path = tmp_path / "single.npz"
    multihost_worker.dump_result(result, fb, base_path)

    run_dir = tmp_path / "shared_run"
    run_dir.mkdir()
    # Phase 1: 2-process run, killed after epoch 2's checkpoint.
    _run_pair(tmp_path / "unused.npz", "abort",
              [(run_dir,), (run_dir,)])
    assert (run_dir / "sweep_resume.msgpack").exists()
    import json

    meta = json.loads((run_dir / "sweep_resume_meta.json").read_text())
    assert meta["next_epoch"] == 2

    # Phase 2: fresh 2-process launch resumes and finishes.
    out = tmp_path / "resumed.npz"
    _run_pair(out, "resume", [(run_dir,), (run_dir,)])
    assert out.exists(), "primary resume worker wrote no result"

    with np.load(base_path) as single, np.load(out) as dist:
        assert set(single.files) == set(dist.files)
        valid = single["fold_valid"]
        for key in single.files:
            a, b = single[key], dist[key]
            if a.shape and a.shape[0] == len(valid):
                a, b = a[valid], b[valid]
            np.testing.assert_array_equal(
                a, b,
                err_msg=f"{key} differs: uninterrupted 1-process vs "
                        f"aborted+resumed 2-process run")


@pytest.mark.slow
def test_two_process_replicated_smoke(disk_data, tmp_path):
    """2-process folds x seeds replicated sweep: per-(seed, fold) matrices
    bit-identical to a single-process run, and run-dir artifacts written by
    the primary ONLY (each process gets its own run dir; the non-primary's
    must stay empty)."""
    baseline = multihost_worker.run_replicated(disk_data, tmp_path / "base")
    run0, run1 = tmp_path / "run_p0", tmp_path / "run_p1"
    out = tmp_path / "replicated.npz"
    _run_pair(out, "replicated",
              [(disk_data, run0), (disk_data, run1)])
    assert out.exists(), "primary replicated worker wrote no result"

    with np.load(out) as dist:
        np.testing.assert_array_equal(
            dist["accuracy"], np.asarray(baseline["accuracy"]),
            err_msg="replicated accuracy matrix differs across topologies")
        np.testing.assert_array_equal(
            dist["f1"], np.asarray(baseline["f1"]),
            err_msg="replicated f1 matrix differs across topologies")

    # Primary-only artifact convention (parallel/multihost.py).
    files0 = _tree_files(run0)
    assert "seed_summary.txt" in files0
    assert "seed_summary.json" in files0
    assert "seed_fold_matrix.npz" in files0
    assert "config.json" in files0
    assert _tree_files(run1) == [], (
        "non-primary process wrote run-dir artifacts: " + str(_tree_files(run1)))


@pytest.mark.slow
def test_two_process_hierarchical_smoke(disk_data, tmp_path):
    """2-process hierarchical sweep (M1 + M2 + composed ternary eval):
    per-fold metrics bit-identical to single-process, artifacts (summary +
    per-fold M1/M2 checkpoints) written by the primary only."""
    results, summary = multihost_worker.run_hierarchical(
        disk_data, tmp_path / "base")
    run0, run1 = tmp_path / "run_p0", tmp_path / "run_p1"
    out = tmp_path / "hier.npz"
    _run_pair(out, "hierarchical",
              [(disk_data, run0), (disk_data, run1)])
    assert out.exists(), "primary hierarchical worker wrote no result"

    with np.load(out) as dist:
        np.testing.assert_array_equal(
            dist["composed_accuracy"],
            np.asarray([r.composed_accuracy for r in results]))
        np.testing.assert_array_equal(
            dist["composed_f1"],
            np.asarray([r.composed_f1 for r in results]))
        np.testing.assert_array_equal(
            dist["m1_accuracy"],
            np.asarray([r.m1_accuracy for r in results]))
        np.testing.assert_array_equal(
            dist["num_test_windows"],
            np.asarray([r.num_test_windows for r in results]))
        assert float(dist["overall_accuracy"]) == summary["overall_accuracy"]

    files0 = _tree_files(run0)
    assert "hierarchical_summary.txt" in files0
    assert "config.json" in files0
    for r in results:
        for sub in ("model_m1", "model_m2"):
            assert (f"fold_test_on_{r.subject}/{sub}/best_model.msgpack"
                    in files0)
    assert _tree_files(run1) == [], (
        "non-primary process wrote run-dir artifacts: " + str(_tree_files(run1)))


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
