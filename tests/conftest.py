"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (see SURVEY.md §4: multi-device
sharding is tested with xla_force_host_platform_device_count, no TPU slice
required)."""

import os

# MMS_TEST_TPU=1 switches the harness to the on-TPU kernel regression tier
# (tests/test_tpu_kernels.py, `pytest -m tpu`): JAX keeps the real TPU
# backend so Mosaic-compiled kernels — not the CPU interpreter — are what
# parity is asserted against. Everything else below (CPU forcing, virtual
# 8-device mesh) is skipped in that mode, and collection deselects the
# respective other tier (pytest_collection_modifyitems).
TPU_TIER = os.environ.get("MMS_TEST_TPU") == "1"

if not TPU_TIER:
    # Force CPU regardless of ambient JAX_PLATFORMS (the dev box exposes a
    # real TPU whose default matmul precision would break tight parity
    # tolerances). The env var alone is not enough: sitecustomize imports
    # jax at interpreter start, so jax's config already snapshotted the
    # ambient value — override the live config too (backends are not
    # initialized yet at conftest time).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the test suite. The quick tier is
# compile-bound (a broad tail of 5-18 s tests, each paying a fresh CPU
# compile); cache keys are process-deterministic for our programs (verified:
# two identical sweep runs in separate processes add zero new entries), so
# warm reruns load executables from disk instead of recompiling. Executables
# that embed host callbacks are skipped automatically by JAX. Disable with
# MMS_TEST_COMPILE_CACHE=0.
if os.environ.get("MMS_TEST_COMPILE_CACHE", "1") != "0":
    # Partition the cache by host CPU fingerprint: XLA:CPU entries embed
    # AOT machine code compiled for the build host's exact feature set, and
    # this environment's home dir survives host migrations — a cache written
    # on a wider-featured machine loads with "could lead to SIGILL" warnings
    # on a narrower one. A per-fingerprint subdir makes stale-host entries
    # unreachable instead of trusted. (Same scheme as the CLI entry points,
    # utils/run.py enable_compilation_cache.)
    from multimodalsignal_tpu.utils.run import host_cpu_fingerprint

    _cache = os.path.expanduser(
        f"~/.cache/multimodalsignal_tpu/xla_cache_tests/{host_cpu_fingerprint()}")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest

from multimodalsignal_tpu.data.synthetic import write_synthetic_wesad


def pytest_collection_modifyitems(config, items):
    """Two disjoint tiers: the default CPU tiers (quick/slow) and the on-TPU
    kernel tier. MMS_TEST_TPU=1 runs ONLY tpu-marked tests (the backend is
    the real chip — CPU-calibrated parity tolerances don't apply there);
    without it, tpu-marked tests skip (Mosaic needs the hardware)."""
    if TPU_TIER:
        skip = pytest.mark.skip(
            reason="MMS_TEST_TPU=1 runs only the tpu-marked kernel tier")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="on-TPU tier: run MMS_TEST_TPU=1 pytest -m tpu on a TPU "
                   "host (PYTHONPATH must keep /root/.axon_site)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)

SUBJECTS_SMALL = ["S2", "S3", "S4", "S5"]

# Short protocol so fixtures stay fast: enough minutes for several 60 s
# windows per condition.
TASKS_SMALL = (
    ("Base", 3.0),
    ("TSST", 2.0),
    ("Medi 1", 1.5),
    ("Fun", 2.0),
    ("Medi 2", 1.5),
)


@pytest.fixture(scope="session")
def wesad_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("wesad")
    write_synthetic_wesad(root, SUBJECTS_SMALL, tasks=TASKS_SMALL, seed=0)
    return root


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
