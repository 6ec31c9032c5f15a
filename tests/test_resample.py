"""Golden-value tests: our Fourier resampler vs scipy.signal.resample
(the oracle the reference uses at preprocess.py:70-75)."""

import numpy as np
import pytest
import scipy.signal as sps

from multimodalsignal_tpu.data.resample import (
    fourier_resample,
    fourier_resample_np,
    resample_signal,
)


@pytest.mark.parametrize("n,num", [(700, 128), (4200, 768), (701, 129), (128, 700), (100, 50), (101, 51), (50, 101)])
def test_numpy_backend_matches_scipy(n, num, rng):
    x = rng.standard_normal(n)
    expected = sps.resample(x, num)
    got = fourier_resample_np(x, num)
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n,num", [(700, 128), (701, 129), (128, 700)])
def test_jax_backend_matches_scipy(n, num, rng):
    x = rng.standard_normal(n).astype(np.float32)
    expected = sps.resample(x.astype(np.float64), num)
    got = np.asarray(fourier_resample(x, num))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_multiaxis_matches_percolumn_scipy(rng):
    """The reference column-stacks per-axis resampling (preprocess.py:71-72);
    our batched transform must agree."""
    x = rng.standard_normal((2100, 3))
    num = int(len(x) * 128 / 700)
    expected = np.column_stack([sps.resample(x[:, i], num) for i in range(3)])
    got = resample_signal(x, 700, 128)
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_output_length_matches_reference_formula(rng):
    x = rng.standard_normal(70003)
    out = resample_signal(x, 700, 128)
    assert len(out) == int(len(x) * (128 / 700))


def test_jax_batched_axis(rng):
    x = rng.standard_normal((5, 350)).astype(np.float32)
    got = np.asarray(fourier_resample(x, 64, axis=-1))
    for i in range(5):
        expected = sps.resample(x[i].astype(np.float64), 64)
        np.testing.assert_allclose(got[i], expected, rtol=1e-4, atol=1e-4)
