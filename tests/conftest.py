"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (see SURVEY.md §4: multi-device
sharding is tested with xla_force_host_platform_device_count, no TPU slice
required)."""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (the dev box exposes a real
# TPU whose default matmul precision would break tight parity tolerances).
# The env var alone is not enough: sitecustomize imports jax at interpreter
# start, so jax's config already snapshotted the ambient value — override the
# live config too (backends are not initialized yet at conftest time).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from multimodalsignal_tpu.data.synthetic import write_synthetic_wesad

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
