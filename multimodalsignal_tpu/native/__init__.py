"""Native host-data engine: C++ windowing/normalization via ctypes.

Builds window_engine.cpp with g++ on first use (cached as a .so next to the
source; rebuilt when the source changes) and exposes numpy-friendly wrappers.
Everything degrades gracefully: `available()` is False when no compiler or
the build fails, and callers fall back to the NumPy implementations in
data/windowing.py / data/dataset.py — which remain the behavioral reference.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "window_engine.cpp"
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build(lib_path: Path) -> bool:
    for extra in (["-fopenmp"], []):  # openmp if the toolchain has it
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               *extra, str(_SRC), "-o", str(lib_path)]
        try:
            result = subprocess.run(cmd, capture_output=True, timeout=120)
        except (OSError, subprocess.TimeoutExpired):
            return False
        if result.returncode == 0:
            return True
    return False


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:12]
    lib_path = _SRC.parent / f"libwindow_engine-{digest}.so"
    if not lib_path.exists() and not _build(lib_path):
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        return None
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.sliding_windows_f32.argtypes = [f32p, i64, i64, i64p, i64, i64, f32p]
    lib.sliding_windows_f32.restype = None
    lib.normalize_windows_f32.argtypes = [f32p, i64, i64, i64, f64p, f64p, u8p]
    lib.normalize_windows_f32.restype = None
    lib.channel_stats_f32.argtypes = [f32p, i64, i64, i64, u8p, f64p, f64p]
    lib.channel_stats_f32.restype = None
    lib.pack_subject_f32.argtypes = [f32p, i64, i64, i64, i64p, i64, u8p,
                                     u8p, u8p, ctypes.c_double, f32p]
    lib.pack_subject_f32.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def sliding_windows_f32(signal: np.ndarray, starts: np.ndarray,
                        window: int) -> np.ndarray:
    """[T, C] float32 + starts [N] -> [N, window, C] (native gather)."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    signal = np.ascontiguousarray(signal, dtype=np.float32)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    t_total, channels = signal.shape
    # The C++ gather does raw memcpy with no bounds check; an out-of-range
    # start (e.g. a quest CSV whose end time overruns the recording) must
    # fail loudly like the NumPy fallback's IndexError, not read garbage.
    if len(starts) and (int(starts.min()) < 0
                        or int(starts.max()) + window > t_total):
        raise IndexError(
            f"window [{int(starts.max())}, {int(starts.max()) + window}) "
            f"out of bounds for signal of length {t_total}"
        )
    out = np.empty((len(starts), window, channels), dtype=np.float32)
    lib.sliding_windows_f32(signal, t_total, channels, starts,
                            len(starts), window, out)
    return out


def pack_subject_f32(x: np.ndarray, chan_idx: np.ndarray,
                     log1p_mask: np.ndarray, stat_rows: np.ndarray,
                     keep_rows: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Fused channel-select + per-channel z-score + transpose:
    [W, T, C_all] float32 (mmap-friendly) -> [keep, C_sel, T] normalized.

    stat_rows picks the windows whose per-channel mean/std define the
    z-score (all-windows or Base-only, reference dataset.py:37-48 /
    void/dataset.py:30-55); keep_rows picks the emitted windows. Two
    streaming passes in C++ instead of the NumPy pipeline's ~5 array copies.
    """
    lib = _load()
    assert lib is not None, "native engine unavailable"
    assert x.dtype == np.float32 and x.flags["C_CONTIGUOUS"]
    w_total, t_len, c_all = x.shape
    stat = np.ascontiguousarray(stat_rows, dtype=np.uint8)
    keep = np.ascontiguousarray(keep_rows, dtype=np.uint8)
    idx = np.ascontiguousarray(chan_idx, dtype=np.int64)
    assert stat.shape == keep.shape == (w_total,)
    assert stat.any(), "stat_rows must select at least one window"
    if len(idx) and (idx.min() < 0 or idx.max() >= c_all):
        raise IndexError(f"channel index out of range for C_all={c_all}")
    out = np.empty((int(keep.sum()), len(idx), t_len), dtype=np.float32)
    lib.pack_subject_f32(
        x, w_total, t_len, c_all, idx, len(idx),
        np.ascontiguousarray(log1p_mask, dtype=np.uint8), stat, keep,
        float(eps), out,
    )
    return out


def channel_stats_f32(windows: np.ndarray, log1p_mask: np.ndarray):
    """Per-channel (mean, std) of [N, W, C] float32 windows, with optional
    log1p per channel (population std, like the reference's numpy .std())."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    windows = np.ascontiguousarray(windows, dtype=np.float32)
    n, w, c = windows.shape
    mask = np.ascontiguousarray(log1p_mask, dtype=np.uint8)
    mean = np.empty(c, dtype=np.float64)
    std = np.empty(c, dtype=np.float64)
    lib.channel_stats_f32(windows, n, w, c, mask, mean, std)
    return mean, std


def normalize_windows_f32(windows: np.ndarray, mean: np.ndarray,
                          std: np.ndarray, log1p_mask: np.ndarray) -> np.ndarray:
    """In-place per-channel z-score of [N, W, C] float32 windows; returns the
    same array."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    assert windows.dtype == np.float32 and windows.flags["C_CONTIGUOUS"]
    n, w, c = windows.shape
    lib.normalize_windows_f32(
        windows, n, w, c,
        np.ascontiguousarray(mean, dtype=np.float64),
        np.ascontiguousarray(std, dtype=np.float64),
        np.ascontiguousarray(log1p_mask, dtype=np.uint8),
    )
    return windows
