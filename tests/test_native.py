"""Native C++ window engine: builds with g++, matches the NumPy reference
implementations bitwise (gather) / to float32 precision (normalization)."""

import numpy as np
import pytest

from multimodalsignal_tpu import native
from multimodalsignal_tpu.data.windowing import sliding_windows

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ unavailable or build failed")


def test_sliding_windows_matches_numpy(rng):
    signal = rng.standard_normal((5000, 4)).astype(np.float32)
    starts = np.arange(0, 5000 - 640, 177, dtype=np.int64)
    want = sliding_windows(signal, starts, 640)
    got = native.sliding_windows_f32(signal, starts, 640)
    np.testing.assert_array_equal(got, want)


def test_channel_stats_and_normalize(rng):
    windows = (rng.standard_normal((30, 128, 3)) * 3 + 5).astype(np.float32)
    windows = np.abs(windows)  # log1p-safe
    mask = np.array([0, 1, 0], dtype=np.uint8)

    mean, std = native.channel_stats_f32(windows, mask)
    x64 = windows.astype(np.float64)
    for c in range(3):
        vals = np.log1p(x64[:, :, c]) if mask[c] else x64[:, :, c]
        assert mean[c] == pytest.approx(vals.mean(), rel=1e-9)
        assert std[c] == pytest.approx(vals.std(), rel=1e-7)

    got = native.normalize_windows_f32(windows.copy(), mean, std + 1e-8, mask)
    for c in range(3):
        vals = np.log1p(x64[:, :, c]) if mask[c] else x64[:, :, c]
        want = ((vals - mean[c]) / (std[c] + 1e-8)).astype(np.float32)
        np.testing.assert_allclose(got[:, :, c], want, rtol=1e-5, atol=1e-6)


def test_matches_dataset_normalize_subject(rng):
    """Native stats+normalize must agree with data.dataset.normalize_subject
    ("all" scheme, EDA log1p) within float32 round-off."""
    from multimodalsignal_tpu.data.dataset import normalize_subject

    x = np.abs(rng.standard_normal((20, 256, 3)) + 2).astype(np.float32)
    names = ["chest_ECG", "chest_EDA", "chest_Resp"]
    want = normalize_subject(x, np.ones(20, dtype=np.int64), names, "all")

    mask = np.array([n == "chest_EDA" for n in names], dtype=np.uint8)
    mean, std = native.channel_stats_f32(x, mask)
    got = native.normalize_windows_f32(x.copy(), mean, std + 1e-8, mask)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sliding_windows_bounds_check(rng):
    """The native gather must reject out-of-range starts loudly (IndexError)
    instead of memcpy-ing past the signal buffer."""
    import pytest

    from multimodalsignal_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    sig = rng.standard_normal((100, 3)).astype(np.float32)
    with pytest.raises(IndexError):
        native.sliding_windows_f32(sig, np.asarray([0, 90], np.int64), window=20)
    with pytest.raises(IndexError):
        native.sliding_windows_f32(sig, np.asarray([-1], np.int64), window=20)


def test_normalize_subject_native_production_path(rng):
    """normalize_subject auto-routes float32 inputs through the C++ engine
    (the production call sites: pack_corpus/build_dataset load float32 npy);
    it must agree with the NumPy float64 oracle to float32 round-off, for
    both normalization schemes."""
    from multimodalsignal_tpu.data.dataset import normalize_subject

    x = np.abs(rng.standard_normal((24, 128, 3)) + 2).astype(np.float32)
    y_raw = rng.integers(1, 5, 24)
    names = ["chest_ECG", "chest_EDA", "chest_Resp"]
    for scheme in ("all", "baseline"):
        got = normalize_subject(x, y_raw, names, scheme)  # auto -> native
        want = normalize_subject(x, y_raw, names, scheme, use_native=False)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # No baseline windows -> all-data fallback, still matching.
    y_nobase = np.full(24, 2)
    got = normalize_subject(x, y_nobase, names, "baseline")
    want = normalize_subject(x, y_nobase, names, "baseline", use_native=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
