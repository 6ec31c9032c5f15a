"""Fourier-domain resampling with scipy.signal.resample parity.

The reference resamples every chest channel 700 Hz -> 128 Hz with
`scipy.signal.resample` (FFT method), per column for multi-axis signals
(reference preprocess.py:70-75). Here the same spectral truncation/zero-padding
is implemented once over an arbitrary axis, in two backends:

  * numpy  — float64 host path, numerically matching scipy (both ride pocketfft);
             used by offline preprocessing for bitwise-stable outputs.
  * jax    — jittable/batchable device path (`fourier_resample`), used when the
             pipeline runs on-device; resampling all channels is one batched
             rfft/irfft pair instead of the reference's per-column python loop.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _resample_spectrum(X, nx: int, num: int, xp):
    """Shared spectrum-manipulation logic for real-input Fourier resampling.

    X: rfft of the input along the last axis, shape [..., nx//2+1].
    Returns Y of shape [..., num//2+1] following scipy's component copy and
    Nyquist split/join rules.
    """
    n_keep = min(num, nx)
    nyq = n_keep // 2 + 1  # slice end that includes Nyquist if present
    Y = X[..., :nyq]
    pad = num // 2 + 1 - nyq
    if pad > 0:
        widths = [(0, 0)] * (Y.ndim - 1) + [(0, pad)]
        Y = xp.pad(Y, widths)
    if n_keep % 2 == 0:
        # Split/join the Nyquist component exactly like scipy does.
        scale = xp.ones((Y.shape[-1],), dtype=Y.real.dtype)
        if num < nx:  # downsampling: fold -N/2 into +N/2
            scale = scale.at[n_keep // 2].set(2.0) if xp is jnp else _np_set(scale, n_keep // 2, 2.0)
        elif num > nx:  # upsampling: halve the split Nyquist bin
            scale = scale.at[n_keep // 2].set(0.5) if xp is jnp else _np_set(scale, n_keep // 2, 0.5)
        Y = Y * scale
    return Y


def _np_set(arr, idx, value):
    arr[idx] = value
    return arr


def fourier_resample(x: jnp.ndarray, num: int, axis: int = -1) -> jnp.ndarray:
    """JAX FFT resample of real input to `num` samples along `axis`.

    Jittable (num/axis static). Matches scipy.signal.resample(x, num, axis)
    semantics for real input without a window.
    """
    x = jnp.moveaxis(x, axis, -1)
    nx = x.shape[-1]
    X = jnp.fft.rfft(x, axis=-1)
    Y = _resample_spectrum(X, nx, num, jnp)
    y = jnp.fft.irfft(Y, num, axis=-1) * (num / nx)
    return jnp.moveaxis(y, -1, axis)


def fourier_resample_np(x: np.ndarray, num: int, axis: int = -1) -> np.ndarray:
    """NumPy float64 twin of `fourier_resample` for host-side preprocessing."""
    x = np.moveaxis(np.asarray(x, dtype=np.float64), axis, -1)
    nx = x.shape[-1]
    X = np.fft.rfft(x, axis=-1)
    Y = _resample_spectrum(X, nx, num, np)
    y = np.fft.irfft(Y, num, axis=-1) * (float(num) / float(nx))
    return np.moveaxis(y, -1, axis)


def resample_signal(
    signal_data: np.ndarray,
    original_fs: int,
    target_fs: int,
    backend: str = "numpy",
):
    """Resample a [T] or [T, A] signal from original_fs to target_fs.

    Output length is int(len * target_fs / original_fs), matching reference
    preprocess.py:72-74. Multi-axis signals are resampled along time (axis 0)
    in one batched transform rather than the reference's per-column loop.
    """
    signal_data = np.asarray(signal_data)
    num = int(len(signal_data) * (target_fs / original_fs))
    if backend == "numpy":
        return fourier_resample_np(signal_data, num, axis=0)
    if backend == "jax":
        return fourier_resample(jnp.asarray(signal_data), num, axis=0)
    raise ValueError(f"Unknown backend: {backend!r}")
