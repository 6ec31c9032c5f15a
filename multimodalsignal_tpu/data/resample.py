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


class StreamingPolyResampler:
    """Causal polyphase FIR resampler for live feeds (e.g. 700 -> 128 Hz).

    The batch pipeline owns whole-recording FFT resampling (scipy parity,
    reference preprocess.py:70-75) — but a Fourier resample needs the entire
    signal and cannot run causally. A live acquisition front-end instead
    uses the classical polyphase decimator/interpolator: up/down =
    target/original reduced by their gcd (128/700 -> 32/175), one
    Kaiser-windowed-sinc lowpass designed at the upsampled rate with
    scipy.signal.resample_poly's default parameters (cutoff 1/max(up,down),
    half-length 10*max(up,down), beta 5.0), applied CAUSALLY: output k uses
    input samples <= floor(k*down/up) only, so the stream is delayed by the
    filter's group delay

        delay_sec = half_len / (up * original_fs)
        (= 1750 / (32*700) ~= 78 ms for 700 -> 128 Hz)

    relative to the zero-phase batch resampler. `delay_out_samples` reports
    that delay in output samples; downstream windowing that tolerates a
    sub-window shift (60 s windows vs 78 ms) can ignore it.

    Outputs are CHUNKING-INVARIANT: feeding the same signal in any chunk
    sizes yields bit-identical output (pinned in tests/test_streaming.py),
    and the full-stream output equals scipy.signal.upfirdn(h, x, up, down)
    truncated to the causal prefix (same filter, same math).
    """

    def __init__(self, original_fs: int, target_fs: int,
                 num_channels: int = 1, beta: float = 5.0,
                 half_len_mult: int = 10):
        import math

        g = math.gcd(int(original_fs), int(target_fs))
        self.up = int(target_fs) // g
        self.down = int(original_fs) // g
        self.original_fs = int(original_fs)
        self.target_fs = int(target_fs)
        self.num_channels = int(num_channels)
        if self.up == self.down:  # identity (already at target rate)
            self._h = None
            self.delay_out_samples = 0.0
            self.delay_sec = 0.0
            return
        max_rate = max(self.up, self.down)
        half_len = half_len_mult * max_rate
        n = np.arange(-half_len, half_len + 1, dtype=np.float64)
        # Windowed-sinc lowpass at cutoff 1/max_rate of the upsampled
        # Nyquist, unity DC gain, then *up to undo zero-stuffing attenuation
        # (exactly scipy.signal.resample_poly's design).
        h = np.sinc(n / max_rate) / max_rate * np.kaiser(2 * half_len + 1, beta)
        h = h / h.sum() * self.up
        self._h = h
        self.delay_sec = half_len / (self.up * self.original_fs)
        self.delay_out_samples = self.delay_sec * self.target_fs
        # Polyphase partition: y[k] = sum_j hp[p_k, j] * x[n_k - j] with
        # p_k = (k*down) % up, n_k = (k*down) // up. Phase rows are padded
        # to a common tap count L.
        L = -(-len(h) // self.up)
        hp = np.zeros((self.up, L), dtype=np.float64)
        for p in range(self.up):
            taps = h[p::self.up]
            hp[p, : len(taps)] = taps
        self._hp = hp
        self._L = L
        # State: ring of the last L-1 input samples (zero history at t=0 ==
        # zero-padded signal start), absolute input/output counters.
        self._hist = np.zeros((L - 1, self.num_channels), dtype=np.float64)
        self._hist_start = -(L - 1)  # absolute index of _hist[0]
        self._n_in = 0               # total input samples consumed
        self._k_out = 0              # next output index

    def push(self, chunk: np.ndarray) -> np.ndarray:
        """Feed [n] or [n, C] input samples; returns every output sample
        whose causal support is now complete, shape [m, C] float64."""
        chunk = np.asarray(chunk, dtype=np.float64)
        if chunk.ndim == 1:
            chunk = chunk[:, None]
        if chunk.shape[1] != self.num_channels:
            raise ValueError(
                f"chunk has {chunk.shape[1]} channels, resampler expects "
                f"{self.num_channels}")
        if self._h is None:
            return chunk
        buf = np.concatenate([self._hist, chunk])       # [L-1+n, C]
        buf_start = self._hist_start                     # abs idx of buf[0]
        self._n_in += len(chunk)

        # Output k needs input up to n_k = floor(k*down/up); emit all k with
        # n_k < n_in.
        k_hi = (self._n_in * self.up + self.down - 1) // self.down
        # ceil(n_in*up/down) gives first k with n_k >= n_in; emit up to it.
        ks = np.arange(self._k_out, k_hi, dtype=np.int64)
        out = np.empty((len(ks), self.num_channels), dtype=np.float64)
        if len(ks):
            n_k = (ks * self.down) // self.up
            p_k = (ks * self.down) % self.up
            # Gather [m, L, C] windows x[n_k - j], j = 0..L-1.
            idx = n_k[:, None] - np.arange(self._L)[None, :] - buf_start
            win = buf[idx]                               # [m, L, C]
            out = np.einsum("mlc,ml->mc", win, self._hp[p_k])
            self._k_out = int(ks[-1]) + 1
        # Keep exactly the last L-1 samples as history for the next push.
        self._hist = buf[len(buf) - (self._L - 1):]
        self._hist_start = buf_start + len(buf) - (self._L - 1)
        return out


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
