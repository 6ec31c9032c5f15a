"""The packed-corpus disk cache (dataset.pack_corpus `cache=`).

pack_corpus output is fold- and run-invariant for fixed inputs, so it is
memoized under <data_path>/.pack_cache keyed on the pack inputs plus the
source npy files' (mtime_ns, size). These tests pin: bit-identical replay
without touching the loaders, invalidation when a source file changes,
the disable switch, and LRU pruning that never evicts the newest entry.
"""

import os

import numpy as np
import pytest

from multimodalsignal_tpu.data import dataset as D

CHANNELS = ["chest_ECG", "chest_EDA", "chest_Resp"]


def _write_subject(data_dir, sid, n, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 64, len(CHANNELS))).astype(np.float32)
    y = rng.integers(1, 5, size=n).astype(np.int64)
    np.save(data_dir / f"{sid}_X.npy", x)
    np.save(data_dir / f"{sid}_y.npy", y)


@pytest.fixture()
def data_dir(tmp_path):
    d = tmp_path / "chest_raw"
    d.mkdir()
    _write_subject(d, "S2", 11, seed=2)
    _write_subject(d, "S3", 7, seed=3)
    return d


def _pack(data_dir, cache, channels=CHANNELS):
    return D.pack_corpus(data_dir, ["S2", "S3"], list(channels), CHANNELS,
                         "stress_binary", "all", cache=cache)


def test_cache_hit_is_bit_identical_and_skips_loaders(data_dir, monkeypatch):
    fresh = _pack(data_dir, cache=True)
    assert (data_dir / ".pack_cache").is_dir()

    def boom(*a, **k):
        raise AssertionError("cache hit must not touch subject loaders")

    monkeypatch.setattr(D, "load_subject_windows", boom)
    monkeypatch.setattr(D, "_pack_subject_fused", boom)
    cached = _pack(data_dir, cache=True)
    assert cached.subjects == fresh.subjects
    np.testing.assert_array_equal(np.asarray(cached.x), fresh.x)
    np.testing.assert_array_equal(cached.y, fresh.y)
    np.testing.assert_array_equal(cached.mask, fresh.mask)


def test_source_change_invalidates(data_dir):
    stale = _pack(data_dir, cache=True)
    _write_subject(data_dir, "S2", 11, seed=99)  # same shape, new content
    fresh = _pack(data_dir, cache=True)
    assert not np.array_equal(np.asarray(fresh.x), np.asarray(stale.x))
    # and the repack of the unchanged subject still matches
    np.testing.assert_array_equal(fresh.y[1], stale.y[1])


def test_cache_disabled_writes_nothing(data_dir):
    _pack(data_dir, cache=False)
    assert not (data_dir / ".pack_cache").exists()


def test_env_switch_disables(data_dir, monkeypatch):
    monkeypatch.setenv("MMS_PACK_CACHE", "0")
    _pack(data_dir, cache=None)
    assert not (data_dir / ".pack_cache").exists()


def test_lru_prune_keeps_newest(data_dir, monkeypatch):
    # Cap far below one entry: every write evicts all OLDER entries but
    # must keep the entry just written.
    monkeypatch.setenv("MMS_PACK_CACHE_GB", "1e-6")
    _pack(data_dir, cache=True)
    _pack(data_dir, cache=True, channels=CHANNELS[:2])  # second key
    entries = [e for e in (data_dir / ".pack_cache").iterdir() if e.is_dir()]
    assert len(entries) == 1
    # and the surviving entry is the most recent one: packing the second
    # subset again is a hit (loaders untouched)
    def boom(*a, **k):
        raise AssertionError("expected a cache hit for the newest entry")

    monkeypatch.setattr(D, "load_subject_windows", boom)
    monkeypatch.setattr(D, "_pack_subject_fused", boom)
    _pack(data_dir, cache=True, channels=CHANNELS[:2])


def test_hybrid_pack_uses_cache(data_dir, tmp_path, monkeypatch):
    # pack_hybrid_corpus routes its raw stream through pack_corpus: the
    # second hybrid pack must serve raw windows from cache while the
    # feature stream is re-read (features are cheap and stay uncached).
    feat_dir = tmp_path / "chest_feature"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    for sid, n in (("S2", 11), ("S3", 7)):
        y = np.load(data_dir / f"{sid}_y.npy")
        np.save(feat_dir / f"{sid}_X.npy",
                rng.normal(size=(n, 4)).astype(np.float32))
        np.save(feat_dir / f"{sid}_y.npy", y)
    (feat_dir / "_feature_names.txt").write_text("f0\nf1\nf2\nf3\n")

    kw = dict(classification_mode="stress_binary", normalization="all")
    first = D.pack_hybrid_corpus(data_dir, feat_dir, ["S2", "S3"],
                                 CHANNELS, CHANNELS, **kw)
    fused_calls = []
    orig = D._pack_subject_fused

    def counting(*a, **k):
        fused_calls.append(a)
        return orig(*a, **k)

    monkeypatch.setattr(D, "_pack_subject_fused", counting)
    second = D.pack_hybrid_corpus(data_dir, feat_dir, ["S2", "S3"],
                                  CHANNELS, CHANNELS, **kw)
    assert fused_calls == []  # raw stream came from the cache
    np.testing.assert_array_equal(np.asarray(second.x), np.asarray(first.x))
    np.testing.assert_array_equal(second.feat, first.feat)
