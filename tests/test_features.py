"""Handcrafted feature extraction sanity on signals with known physiology."""

import numpy as np
import pytest

from multimodalsignal_tpu.data.features import (
    FEATURE_NAMES,
    detect_r_peaks,
    extract_handcrafted_features,
    resp_features,
    sample_entropy,
)

FS = 128
T = 60 * FS


def _ecg(hr_bpm=70.0, fs=FS, seconds=60, jitter=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    phase = (t * hr_bpm / 60.0) % 1.0
    if jitter:
        phase = ((t + jitter * np.cumsum(rng.standard_normal(len(t))) / fs) * hr_bpm / 60.0) % 1.0
    return np.exp(-((phase - 0.5) ** 2) / (2 * 0.003)) + 0.02 * rng.standard_normal(len(t))


def test_r_peak_rate():
    ecg = _ecg(hr_bpm=72.0)
    peaks = detect_r_peaks(ecg, FS)
    # 72 bpm over 60 s -> ~72 beats
    assert 68 <= len(peaks) <= 76
    rr = np.diff(peaks) / FS
    assert abs(np.median(rr) - 60.0 / 72.0) < 0.05


def test_resp_rate():
    t = np.arange(T) / FS
    resp = np.sin(2 * np.pi * (15.0 / 60.0) * t) + 0.05 * np.random.default_rng(0).standard_normal(T)
    feats = resp_features(resp, FS)
    assert abs(feats["RESP_Rate_Mean"] - 15.0) < 1.5
    assert feats["RESP_RRV_SDNN"] >= 0


def test_sample_entropy_regular_vs_random():
    rng = np.random.default_rng(0)
    regular = np.tile([800.0, 810.0], 30)
    random = rng.uniform(600, 1000, 60)
    assert sample_entropy(random) > sample_entropy(regular)


def test_extract_full_window_names_and_nan_contract():
    rng = np.random.default_rng(1)
    t = np.arange(T) / FS
    window = {
        "chest_ECG": _ecg(65.0),
        "chest_EDA": 2.0 + 0.3 * np.sin(2 * np.pi * 0.02 * t) + 0.01 * rng.standard_normal(T),
        "chest_Resp": np.sin(2 * np.pi * 0.25 * t),
        "chest_EMG": 0.05 * rng.standard_normal(T),
    }
    feats = extract_handcrafted_features(window, FS)
    assert tuple(feats) == FEATURE_NAMES
    for k in ("HRV_RMSSD", "HRV_SDNN", "EMG_Amplitude_Mean", "RESP_Rate_Mean"):
        assert np.isfinite(feats[k]), k
    assert feats["EMG_Amplitude_Mean"] == pytest.approx(np.mean(np.abs(window["chest_EMG"])))

    # Garbage ECG -> HRV features NaN, others still computed (reference
    # preprocess.py:92-95 NaNs only the failing group).
    window["chest_ECG"] = np.zeros(T)
    feats = extract_handcrafted_features(window, FS)
    assert np.isnan(feats["HRV_RMSSD"])
    assert np.isfinite(feats["EMG_Amplitude_Mean"])


def test_hrv_distinguishes_stress():
    """Higher HR + lower variability (stress) must separate from baseline."""
    calm = extract_handcrafted_features({"chest_ECG": _ecg(62.0, jitter=0.02, seed=2)}, FS)
    stressed = extract_handcrafted_features({"chest_ECG": _ecg(95.0, jitter=0.002, seed=3)}, FS)
    assert np.isfinite(calm["HRV_SDNN"]) and np.isfinite(stressed["HRV_SDNN"])
    assert stressed["HRV_SDNN"] < calm["HRV_SDNN"]
