"""Dropout RNG implementation selection.

The reference (PyTorch) draws dropout masks from cuRAND/CPU Mersenne streams;
the mask distribution is what matters, not the bit generator. JAX's default
threefry2x32 generator is counter-based and portable but costs real VPU time
at training-step scale: generating the ~4M mask bits per step for the
inter-layer GRU dropout measured 154 us of a 1,994 us train step (7.7%) at
the flagship shape (benchmarks/RESULTS.md round 3). XLA's rng-bit-generator
("rbg") lowers to the TPU hardware PRNG and removes nearly all of that cost.

The switch is applied ONLY to the dropout stream, at the point of use: the
root seed, parameter init, and batch shuffling keep their threefry streams,
so `dropout_rng="threefry"` reproduces every previously committed result
bit-for-bit, and "rbg" changes nothing but the dropout mask draw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_VALID = ("auto", "threefry", "rbg")


def resolve_dropout_rng_impl(setting: str) -> str:
    """"auto" -> "rbg" on TPU (hardware PRNG), "threefry" elsewhere (keeps
    CPU test goldens and historical runs bit-stable)."""
    if setting not in _VALID:
        raise ValueError(
            f"dropout_rng must be one of {_VALID}, got {setting!r}")
    if setting == "auto":
        return "rbg" if jax.default_backend() == "tpu" else "threefry"
    return setting


def as_dropout_key(key, impl: str):
    """Convert a (possibly raw uint32) threefry key into the key type for
    `impl`. Deterministic: the rbg key's 4 data words are the threefry key's
    2 words repeated, so a fixed seed still yields a fixed mask stream."""
    if impl == "threefry":
        return key
    if impl != "rbg":
        raise ValueError(f"unknown dropout rng impl {impl!r}")
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    return jax.random.wrap_key_data(
        jnp.concatenate([data, data], axis=-1), impl="rbg")
