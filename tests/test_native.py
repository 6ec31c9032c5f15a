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


def test_pack_subject_fused_matches_pipeline(rng, tmp_path):
    """The fused C++ pack (mmap + select + z-score + transpose) must agree
    with the NumPy pipeline (select -> normalize_subject -> keep -> transpose)
    to float32 precision, for both normalization schemes and a keep-filtering
    classification mode."""
    from multimodalsignal_tpu.data.dataset import (
        _pack_subject_fused,
        map_labels,
        normalize_subject,
    )

    w, t, c_all = 12, 64, 5
    names_all = ["chest_ACC_x", "chest_ECG", "chest_EDA", "chest_Resp",
                 "chest_Temp"]
    chans = ["chest_ECG", "chest_EDA", "chest_Resp"]
    idx = [names_all.index(c) for c in chans]
    x = (rng.standard_normal((w, t, c_all)) ** 2).astype(np.float32)
    y_raw = rng.integers(1, 5, size=w).astype(np.int64)
    y_raw[:3] = 1  # guarantee Base windows for the baseline scheme
    np.save(tmp_path / "S2_X.npy", x)
    np.save(tmp_path / "S2_y.npy", y_raw)

    for mode in ("stress_binary", "amusement_binary"):
        for scheme in ("all", "baseline"):
            got = _pack_subject_fused(tmp_path, "S2", idx, chans, mode, scheme)
            assert got is not None
            sid, x_got, y_got = got
            y, keep = map_labels(y_raw, mode)
            x_norm = normalize_subject(x[:, :, idx], y_raw, chans, scheme,
                                       use_native=False)
            want = x_norm[keep].transpose(0, 2, 1)
            assert sid == "S2"
            np.testing.assert_array_equal(y_got, y[keep])
            np.testing.assert_allclose(x_got, want, rtol=2e-5, atol=2e-5,
                                       err_msg=f"{mode}/{scheme}")


def test_pack_corpus_fused_vs_numpy_path(rng, tmp_path, monkeypatch):
    """pack_corpus output must not depend on whether the native fused path
    is taken."""
    from multimodalsignal_tpu.data import dataset as ds

    w, t, c_all = 8, 32, 3
    names_all = ["chest_ECG", "chest_EDA", "chest_Resp"]
    for sid, seed in (("S2", 0), ("S3", 1)):
        r = np.random.default_rng(seed)
        np.save(tmp_path / f"{sid}_X.npy",
                (r.standard_normal((w, t, c_all)) ** 2).astype(np.float32))
        np.save(tmp_path / f"{sid}_y.npy", r.integers(1, 5, w).astype(np.int64))

    fused = ds.pack_corpus(tmp_path, ["S2", "S3"], names_all, names_all)
    monkeypatch.setattr(ds, "_pack_subject_fused",
                        lambda *a, **k: None)
    plain = ds.pack_corpus(tmp_path, ["S2", "S3"], names_all, names_all)
    assert fused.subjects == plain.subjects
    np.testing.assert_array_equal(fused.y, plain.y)
    np.testing.assert_array_equal(fused.mask, plain.mask)
    np.testing.assert_allclose(fused.x, plain.x, rtol=2e-5, atol=2e-5)


def test_log1p_total_below_minus_one(rng, tmp_path):
    """FFT-resampled EDA can ring below -1 at artifact steps; the log1p
    z-score must stay finite (floored at -1+1e-6) and NumPy/native/fused
    paths must agree (reference dataset.py:40-44 would NaN here)."""
    from multimodalsignal_tpu.data.dataset import (
        _pack_subject_fused,
        normalize_subject,
    )

    w, t = 6, 32
    chans = ["chest_ECG", "chest_EDA"]
    x = rng.standard_normal((w, t, 2)).astype(np.float32)
    x[:, :5, 1] = -1.8  # sub--1 EDA ringing
    y_raw = np.ones(w, np.int64)

    out_np = normalize_subject(x, y_raw, chans, "all", use_native=False)
    out_nat = normalize_subject(x, y_raw, chans, "all", use_native=True)
    assert np.isfinite(out_np).all() and np.isfinite(out_nat).all()
    np.testing.assert_allclose(out_nat, out_np, rtol=2e-5, atol=2e-5)

    np.save(tmp_path / "S2_X.npy", x)
    np.save(tmp_path / "S2_y.npy", y_raw)
    got = _pack_subject_fused(tmp_path, "S2", [0, 1], chans,
                              "stress_binary", "all")
    assert got is not None
    _, x_fused, _ = got
    assert np.isfinite(x_fused).all()
    np.testing.assert_allclose(x_fused, out_np.transpose(0, 2, 1),
                               rtol=2e-5, atol=2e-5)
