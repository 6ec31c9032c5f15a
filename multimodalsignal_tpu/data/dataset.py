"""Dataset layer: windowed npy files -> dense, normalized device arrays.

Parity targets:
  * reference dataset.py:8-65 (`WesadDataset`): per-subject channel selection,
    label mapping, per-subject z-score over all windows with a log1p transform
    for chest_EDA, concatenation across subjects, (C, T) sample layout.
  * reference void/dataset.py:30-55: baseline-referenced normalization
    (stats from Base-only windows, all-data fallback).
  * reference void/dataset.py:161-171: feature-vector baseline z-score
    (std + 1e-3).
  * the `amusement_binary` mode reference main.py:195 requires but
    dataset.py:34 raises on — implemented first-class here: keep only
    Base/Fun windows, Base->0, Fun->1 (SURVEY.md §3.4).

There is no DataLoader: the whole LOSO corpus is small enough for HBM, so
datasets are plain [N, C, T] float arrays plus labels, and the packed
[S, Wmax, ...] form (`PackedCorpus`) feeds the vmapped/sharded fold sweep with
padding masks for ragged per-subject window counts.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from pathlib import Path

import numpy as np

EDA_CHANNEL = "chest_EDA"
# Floor for the EDA log1p (keeps it defined when FFT resampling rings below
# -1 at artifact steps); mirrored by the C++ engine (window_engine.cpp).
_LOG1P_FLOOR = -1.0 + 1e-6
NORMALIZATION_SCHEMES = ("all", "baseline", "none")


def read_channel_names(data_path: Path | str) -> list[str]:
    """Read the _channel_names.txt contract (reference main.py:81-82)."""
    with open(Path(data_path) / "_channel_names.txt") as f:
        return [line.strip() for line in f if line.strip()]


def read_preprocess_meta(data_path: Path | str) -> dict | None:
    """Read the _preprocess_meta.json the preprocessor writes next to the
    windowed npy files (fs/window/stride contract for serving-time replays);
    None for data produced before the meta file existed."""
    import json

    path = Path(data_path) / "_preprocess_meta.json"
    if not path.exists():
        return None
    return json.loads(path.read_text())


def experiment_preprocess_meta(cfg) -> dict | None:
    """The preprocess meta a run dir should embed in config.json: the raw
    (or raw-align, for hybrid) windowing contract, merged — for hybrid runs
    — with the feature tree's extractor version stamp so deployment can
    detect train/serve feature skew (data/features.py
    FEATURE_EXTRACTOR_VERSION)."""
    hybrid = cfg.model.name == "hybrid_cnn_gru"
    raw_path = cfg.raw_align_path if hybrid else cfg.data_path
    meta = read_preprocess_meta(raw_path)
    if hybrid:
        feat_meta = read_preprocess_meta(cfg.feature_path) or {}
        if "feature_extractor_version" in feat_meta:
            meta = dict(meta or {})
            meta["feature_extractor_version"] = (
                feat_meta["feature_extractor_version"])
    return meta


def load_subject_windows(data_path: Path | str, sid: str):
    """Load one subject's (X [N, T, C_all], y_raw [N]) or None if missing
    (reference dataset.py:20-22 warns and skips)."""
    data_path = Path(data_path)
    x_file = data_path / f"{sid}_X.npy"
    y_file = data_path / f"{sid}_y.npy"
    if not x_file.exists() or not y_file.exists():
        print(f"Warning: Skipping subject {sid} for data, file not found.")
        return None
    return np.load(x_file), np.load(y_file)


def map_labels(y_raw: np.ndarray, mode: str) -> tuple[np.ndarray, np.ndarray]:
    """Map original labels {1:Base,2:TSST,3:Fun,4:Medi} per classification mode.

    Returns (y_mapped, keep_mask). For stress_binary/ternary every window is
    kept (reference dataset.py:29-32); amusement_binary keeps only Base/Fun.
    The legacy name "binary" (reference void/dataset.py:97, the pre-rename
    stress mode) is accepted as an alias for stress_binary.
    """
    if mode == "binary":
        mode = "stress_binary"
    if mode == "stress_binary":
        return np.where(y_raw == 2, 1, 0).astype(np.int32), np.ones(len(y_raw), bool)
    if mode == "ternary":
        y = np.where(y_raw == 1, 0, np.where(y_raw == 3, 1, np.where(y_raw == 2, 2, 0)))
        return y.astype(np.int32), np.ones(len(y_raw), bool)
    if mode == "amusement_binary":
        keep = np.isin(y_raw, (1, 3))
        return np.where(y_raw == 3, 1, 0).astype(np.int32), keep
    raise ValueError(f"Unknown classification_mode: {mode}")


def normalize_subject(
    x: np.ndarray,
    y_raw: np.ndarray,
    channel_names: list[str],
    scheme: str = "all",
    use_native: bool | None = None,
) -> np.ndarray:
    """Per-subject normalization of [N, T, C] windows (float64 stats).

    scheme="all":      z-score per channel over all windows; chest_EDA gets
                       log1p first and its own log-domain stats
                       (reference dataset.py:37-48, eps 1e-8).
    scheme="baseline": stats from Base-only (y_raw==1) windows with all-data
                       fallback when a subject has no Base windows
                       (reference void/dataset.py:30-55).
    scheme="none":     passthrough (for pre-normalized or synthetic data).

    use_native=None (auto) routes float32 inputs through the C++ engine's
    channel_stats_f32/normalize_windows_f32 when available (double-precision
    accumulation over the float32 data; agrees with the NumPy path to
    float32 round-off — tests/test_native.py); float64 inputs and
    use_native=False take the NumPy float64 oracle below.
    """
    if scheme == "none":
        return x.astype(np.float32)
    if scheme not in NORMALIZATION_SCHEMES:
        raise ValueError(f"Unknown normalization scheme: {scheme}")
    if use_native is None:
        use_native = np.asarray(x).dtype == np.float32
    if use_native:
        out = _normalize_subject_native(x, y_raw, channel_names, scheme)
        if out is not None:
            return out
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x, dtype=np.float32)
    if scheme == "baseline":
        ref = x[y_raw == 1] if (y_raw == 1).any() else x
        if not (y_raw == 1).any():
            print("Warning: no baseline windows; falling back to all-data stats.")
    else:
        ref = x
    for c, name in enumerate(channel_names):
        if name == EDA_CHANNEL:
            # Total log1p: FFT resampling can ring below -1 at sharp
            # artifact steps (physically impossible for conductance, but
            # present in resampled corrupted recordings); the reference
            # would NaN here (dataset.py:40-44 on real data never does).
            log_all = np.log1p(np.maximum(x[:, :, c], _LOG1P_FLOOR))
            log_ref = np.log1p(np.maximum(ref[:, :, c], _LOG1P_FLOOR))
            mean, std = log_ref.mean(), log_ref.std() + 1e-8
            out[:, :, c] = ((log_all - mean) / std).astype(np.float32)
        else:
            mean, std = ref[:, :, c].mean(), ref[:, :, c].std() + 1e-8
            out[:, :, c] = ((x[:, :, c] - mean) / std).astype(np.float32)
    return out


def _normalize_subject_native(
    x: np.ndarray, y_raw: np.ndarray, channel_names: list[str], scheme: str
) -> np.ndarray | None:
    """C++-engine z-score of float32 windows; None -> caller falls back to
    the NumPy path (engine unavailable or any native failure)."""
    try:
        from multimodalsignal_tpu import native

        if not native.available():
            return None
        xw = np.ascontiguousarray(x, dtype=np.float32)
        log1p_mask = np.array(
            [name == EDA_CHANNEL for name in channel_names], dtype=np.uint8
        )
        if scheme == "baseline":
            if (y_raw == 1).any():
                ref = np.ascontiguousarray(xw[y_raw == 1])
            else:
                print("Warning: no baseline windows; "
                      "falling back to all-data stats.")
                ref = xw
        else:
            ref = xw
        mean, std = native.channel_stats_f32(ref, log1p_mask)
        return native.normalize_windows_f32(xw.copy(), mean, std + 1e-8,
                                            log1p_mask)
    except Exception:
        return None


def channel_norm_stats(
    samples: np.ndarray, channel_names: list[str]
) -> tuple[np.ndarray, np.ndarray]:
    """Per-channel (mean, std) over a flat [M, C] sample span, in the
    training transform domain (log1p for chest_EDA, floored; eps 1e-8 on
    std) — the streaming/serving form of the statistics normalize_subject
    computes over a window batch. normalize_subject(x, 'all') is identical
    to apply_channel_norm(x, names, *channel_norm_stats(flat_samples))
    when flat_samples is x's own [N*T, C] view (tested)."""
    x = np.asarray(samples, np.float64)
    mean = np.empty(x.shape[1])
    std = np.empty(x.shape[1])
    for c, name in enumerate(channel_names):
        col = x[:, c]
        if name == EDA_CHANNEL:
            col = np.log1p(np.maximum(col, _LOG1P_FLOOR))
        mean[c] = col.mean()
        std[c] = col.std() + 1e-8
    return mean, std


def apply_channel_norm(
    x: np.ndarray, channel_names: list[str],
    mean: np.ndarray, std: np.ndarray,
) -> np.ndarray:
    """Normalize [..., C]-last windows with externally-computed stats (see
    channel_norm_stats); chest_EDA is log1p-transformed first."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x, dtype=np.float32)
    for c, name in enumerate(channel_names):
        col = x[..., c]
        if name == EDA_CHANNEL:
            col = np.log1p(np.maximum(col, _LOG1P_FLOOR))
        out[..., c] = ((col - mean[c]) / std[c]).astype(np.float32)
    return out


def normalize_features(
    x_feat: np.ndarray, y_raw: np.ndarray, scheme: str = "baseline"
) -> np.ndarray:
    """Feature-vector [N, F] normalization (reference void/dataset.py:161-171,
    eps 1e-3, baseline-referenced with all-data fallback)."""
    x_feat = np.asarray(x_feat, dtype=np.float64)
    if scheme == "none":
        return x_feat.astype(np.float32)
    ref = x_feat[y_raw == 1] if (scheme == "baseline" and (y_raw == 1).any()) else x_feat
    mean = ref.mean(axis=0)
    std = ref.std(axis=0) + 1e-3
    return ((x_feat - mean) / std).astype(np.float32)


@dataclass
class WindowDataset:
    """Dense dataset: x [N, C, T] float32 (channels-first, matching the model
    input and the reference's __getitem__ permute, dataset.py:63), y [N] int32."""

    x: np.ndarray
    y: np.ndarray
    subjects: tuple[str, ...]

    def __len__(self) -> int:
        return len(self.y)


def build_dataset(
    data_path: Path | str,
    subjects: list[str],
    channels_to_use: list[str],
    all_channel_names: list[str],
    classification_mode: str = "stress_binary",
    normalization: str = "all",
) -> WindowDataset:
    """Functional equivalent of constructing the reference WesadDataset."""
    channel_indices = [all_channel_names.index(ch) for ch in channels_to_use]
    xs, ys, loaded = [], [], []
    for sid in subjects:
        item = load_subject_windows(data_path, sid)
        if item is None:
            continue
        x_raw, y_raw = item
        x_sel = x_raw[:, :, channel_indices]
        y, keep = map_labels(y_raw, classification_mode)
        x_norm = normalize_subject(x_sel, y_raw, channels_to_use, normalization)
        xs.append(x_norm[keep])
        ys.append(y[keep])
        loaded.append(sid)
    if not xs:
        raise ValueError(
            f"No data loaded for subjects: {subjects}. Check paths and data existence."
        )
    x = np.concatenate(xs, axis=0).transpose(0, 2, 1)  # [N, C, T]
    y = np.concatenate(ys, axis=0)
    return WindowDataset(np.ascontiguousarray(x), y, tuple(loaded))


@dataclass
class HybridWindowDataset:
    """Paired raw windows + handcrafted features (reference
    void/dataset.py:72-198): x_raw [N, C, T], x_feat [N, F], y [N].

    The model/trainer consume it as the pytree input (x_raw, x_feat) — the
    JAX form of the reference's ((raw, feat), y) batch tuples
    (void/dataset.py:191-198, trainer.py:130-146)."""

    x_raw: np.ndarray
    x_feat: np.ndarray
    y: np.ndarray
    subjects: tuple[str, ...]

    def __len__(self) -> int:
        return len(self.y)

    @property
    def x(self):
        return (self.x_raw, self.x_feat)


def read_feature_names(feature_path: Path | str) -> list[str]:
    with open(Path(feature_path) / "_feature_names.txt") as f:
        return [line.strip() for line in f if line.strip()]


def build_hybrid_dataset(
    raw_align_path: Path | str,
    feature_path: Path | str,
    subjects: list[str],
    channels_to_use: list[str],
    all_channel_names: list[str],
    features_to_use: list[str] | None = None,
    classification_mode: str = "stress_binary",
    normalization: str = "baseline",
) -> HybridWindowDataset:
    """Functional equivalent of the reference HybridDataset
    (void/dataset.py:72-186): per-subject baseline-referenced normalization of
    BOTH streams (raw with EDA log1p, features with the 1e-3 epsilon), and
    the reference's invariants enforced — raw-align and feature sample counts
    and mapped labels must agree exactly (void/dataset.py:182-186)."""
    channel_indices = [all_channel_names.index(ch) for ch in channels_to_use]
    all_feature_names = read_feature_names(feature_path)
    feat_idx = (
        [all_feature_names.index(f) for f in features_to_use]
        if features_to_use
        else list(range(len(all_feature_names)))
    )

    raw_parts, feat_parts, y_parts, y_feat_parts, loaded = [], [], [], [], []
    for sid in subjects:
        raw_item = load_subject_windows(raw_align_path, sid)
        feat_item = load_subject_windows(feature_path, sid)
        if raw_item is None or feat_item is None:
            continue
        x_raw, y_raw = raw_item
        x_feat, y_feat_raw = feat_item

        x_sel = x_raw[:, :, channel_indices]
        y, keep = map_labels(y_raw, classification_mode)
        x_norm = normalize_subject(x_sel, y_raw, channels_to_use, normalization)
        raw_parts.append(x_norm[keep].transpose(0, 2, 1))
        y_parts.append(y[keep])

        y_feat, keep_feat = map_labels(y_feat_raw, classification_mode)
        # Features use the same scheme as the raw stream (the reference's
        # HybridDataset normalizes both baseline-referenced,
        # void/dataset.py:161-171; scheme "all" z-scores both).
        x_feat_norm = normalize_features(x_feat[:, feat_idx], y_feat_raw,
                                         normalization)
        feat_parts.append(x_feat_norm[keep_feat])
        y_feat_parts.append(y_feat[keep_feat])
        loaded.append(sid)

    if not raw_parts:
        raise ValueError(f"No hybrid data loaded for subjects: {subjects}.")
    x_raw_all = np.concatenate(raw_parts, axis=0)
    x_feat_all = np.concatenate(feat_parts, axis=0)
    y_all = np.concatenate(y_parts, axis=0)
    y_feat_all = np.concatenate(y_feat_parts, axis=0)
    assert x_raw_all.shape[0] == x_feat_all.shape[0], (
        f"raw sample count ({x_raw_all.shape[0]}) != "
        f"feature sample count ({x_feat_all.shape[0]})!"
    )
    assert np.array_equal(y_all, y_feat_all), "raw vs feature labels differ!"
    return HybridWindowDataset(
        np.ascontiguousarray(x_raw_all), x_feat_all, y_all, tuple(loaded)
    )


@dataclass
class PackedCorpus:
    """All subjects padded to a common window count for the sharded fold sweep.

    x    [S, Wmax, C, T] float32, normalized per subject
    y    [S, Wmax] int32 (mapped labels; padded rows hold 0)
    mask [S, Wmax] bool (True = real window surviving the mode's keep filter)
    feat [S, Wmax, F] float32 handcrafted features aligned window-for-window
         with x, or None for raw-only corpora (hybrid sweeps only —
         pack_hybrid_corpus)
    """

    x: np.ndarray
    y: np.ndarray
    mask: np.ndarray
    subjects: tuple[str, ...]
    feat: np.ndarray | None = None

    @property
    def num_subjects(self) -> int:
        return self.x.shape[0]

    def flat(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Flattened [S*Wmax, C, T] view plus labels and mask, for fold-level
        gather indexing (subject s, window w -> s * Wmax + w)."""
        s, wmax = self.x.shape[:2]
        return (
            self.x.reshape(s * wmax, *self.x.shape[2:]),
            self.y.reshape(s * wmax),
            self.mask.reshape(s * wmax),
        )

    def flat_feat(self) -> np.ndarray | None:
        """Flattened [S*Wmax, F] feature view (same indexing as flat())."""
        if self.feat is None:
            return None
        s, wmax = self.feat.shape[:2]
        return self.feat.reshape(s * wmax, self.feat.shape[2])


def _pack_arrays_native(x_raw, y_raw, channel_indices, channels_to_use,
                        classification_mode, normalization):
    """Native fused select+normalize+transpose (native.pack_subject_f32) on
    in-memory or mmap'd arrays — two streaming passes instead of ~5 NumPy
    array copies. Returns (x [keep, C, T] float32, y [keep]) or None when the
    engine is unavailable / the scheme is not a plain z-score (the NumPy path
    remains the behavioral oracle, equality covered by tests/test_native.py)."""
    if normalization not in ("all", "baseline"):
        return None
    try:
        from multimodalsignal_tpu import native

        if not native.available():
            return None
        if x_raw.dtype != np.float32 or x_raw.ndim != 3:
            return None
        y, keep = map_labels(y_raw, classification_mode)
        if normalization == "baseline" and (y_raw == 1).any():
            stat_rows = y_raw == 1
        else:
            if normalization == "baseline":
                print("Warning: no baseline windows; "
                      "falling back to all-data stats.")
            stat_rows = np.ones(len(y_raw), bool)
        log1p_mask = np.asarray(
            [name == EDA_CHANNEL for name in channels_to_use], np.uint8
        )
        x_packed = native.pack_subject_f32(
            x_raw, np.asarray(channel_indices), log1p_mask, stat_rows, keep
        )
        return x_packed, y[keep]
    except Exception as exc:  # pragma: no cover - defensive fallback
        print(f"Warning: native fused pack failed ({exc}); "
              "using the NumPy path.")
        return None


def _pack_arrays(x_raw, y_raw, channel_indices, channels_to_use,
                 classification_mode, normalization):
    """One subject's select+map+normalize+transpose from in-memory arrays:
    the native fused pack when available, else the NumPy oracle path.
    Returns (x [keep, C, T], y [keep])."""
    fused = _pack_arrays_native(x_raw, y_raw, channel_indices,
                                channels_to_use, classification_mode,
                                normalization)
    if fused is not None:
        return fused
    x_sel = x_raw[:, :, channel_indices]
    y, keep = map_labels(y_raw, classification_mode)
    x_norm = normalize_subject(x_sel, y_raw, channels_to_use, normalization)
    return x_norm[keep].transpose(0, 2, 1), y[keep]


def _pack_subject_fused(data_path, sid, channel_indices, channels_to_use,
                        classification_mode, normalization):
    """Native fast path for pack_corpus: mmap the subject's X npy and run
    _pack_arrays_native. Returns (sid, x, y) or None (NumPy fallback)."""
    if normalization not in ("all", "baseline"):
        return None
    data_path = Path(data_path)
    x_file = data_path / f"{sid}_X.npy"
    y_file = data_path / f"{sid}_y.npy"
    if not x_file.exists() or not y_file.exists():
        # load_subject_windows prints the skip warning on the fallback
        # path; staying silent here avoids a duplicate message.
        return None
    try:
        x_raw = np.load(x_file, mmap_mode="r")
        y_raw = np.load(y_file)
    except Exception:  # pragma: no cover - unreadable file; loader warns
        return None
    fused = _pack_arrays_native(x_raw, y_raw, channel_indices,
                                channels_to_use, classification_mode,
                                normalization)
    if fused is None:
        return None
    return (sid, *fused)


def _stack_packed(per_subject) -> PackedCorpus:
    """Pad per-subject (sid, x [n, C, T], y [n]) tuples to a common window
    count and stack into one PackedCorpus."""
    wmax = max(x.shape[0] for _, x, _ in per_subject)
    s = len(per_subject)
    c, t = per_subject[0][1].shape[1:]
    x_out = np.zeros((s, wmax, c, t), dtype=np.float32)
    y_out = np.zeros((s, wmax), dtype=np.int32)
    mask = np.zeros((s, wmax), dtype=bool)
    sids = []
    for i, (sid, x, y) in enumerate(per_subject):
        n = x.shape[0]
        x_out[i, :n] = x
        y_out[i, :n] = y
        mask[i, :n] = True
        sids.append(sid)
    return PackedCorpus(x_out, y_out, mask, tuple(sids))


# Bump when the packed layout or normalization math changes: invalidates
# every existing on-disk pack cache entry.
_PACK_CACHE_VERSION = 1


def _pack_cache_key(data_path, subjects, channels_to_use,
                    classification_mode, normalization) -> str:
    """Key for one packed corpus: the exact pack inputs plus the
    (mtime_ns, size) of every subject npy file, so re-running the
    preprocessor (or changing the subject set / channels / mode / scheme)
    can never serve a stale pack."""
    import hashlib
    import json

    data_path = Path(data_path)
    states = []
    for sid in subjects:
        for suffix in ("X", "y"):
            f = data_path / f"{sid}_{suffix}.npy"
            try:
                st = f.stat()
                states.append([sid, suffix, st.st_mtime_ns, st.st_size])
            except OSError:
                states.append([sid, suffix, None, None])
    payload = json.dumps([
        _PACK_CACHE_VERSION, list(subjects), list(channels_to_use),
        classification_mode, normalization, states,
    ])
    return hashlib.sha256(payload.encode()).hexdigest()[:24]


def _pack_cache_load(cache_dir: Path, key: str) -> PackedCorpus | None:
    """Load a cached pack, or None. x comes back memory-mapped read-only —
    the sweep only reads it (device_put streams it to HBM)."""
    import json

    entry = cache_dir / key
    try:
        info = json.loads((entry / "meta.json").read_text())
        x = np.load(entry / "x.npy", mmap_mode="r")
        y = np.load(entry / "y.npy")
        mask = np.load(entry / "mask.npy")
        try:
            entry.touch()  # LRU recency for _prune_pack_cache
        except OSError:
            pass  # read-only cache dir: the hit is still a hit
        return PackedCorpus(x, y, mask, tuple(info["subjects"]))
    except OSError:
        return None
    except Exception as exc:  # corrupt entry: drop it, repack
        print(f"Warning: dropping corrupt pack cache entry {entry} ({exc})")
        import shutil

        shutil.rmtree(entry, ignore_errors=True)
        return None


def _pack_cache_store(cache_dir: Path, key: str, corpus: PackedCorpus,
                      max_bytes: int) -> None:
    """Write an entry atomically (tmp dir + rename); never raises — a
    read-only data dir or full disk just leaves the run uncached."""
    import json
    import os
    import shutil

    tmp = cache_dir / f".tmp-{key}-{os.getpid()}"
    try:
        tmp.mkdir(parents=True, exist_ok=True)
        np.save(tmp / "x.npy", np.ascontiguousarray(corpus.x))
        np.save(tmp / "y.npy", corpus.y)
        np.save(tmp / "mask.npy", corpus.mask)
        (tmp / "meta.json").write_text(json.dumps(
            {"version": _PACK_CACHE_VERSION,
             "subjects": list(corpus.subjects)}))
        if (cache_dir / key).exists():
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            os.rename(tmp, cache_dir / key)
    except OSError as exc:
        print(f"Warning: pack cache write failed ({exc}); run stays uncached.")
        shutil.rmtree(tmp, ignore_errors=True)
        return
    _prune_pack_cache(cache_dir, max_bytes)


def _prune_pack_cache(cache_dir: Path, max_bytes: int) -> None:
    """Evict least-recently-used entries until the cache fits max_bytes."""
    import shutil

    try:
        entries = [e for e in cache_dir.iterdir()
                   if e.is_dir() and not e.name.startswith(".tmp-")]
        sized = []
        for e in entries:
            size = sum(f.stat().st_size for f in e.iterdir() if f.is_file())
            sized.append((e.stat().st_mtime_ns, size, e))
        sized.sort(reverse=True)  # newest first
        total = 0
        for i, (mtime, size, e) in enumerate(sized):
            total += size
            # The newest entry always survives (it is the one the caller
            # just wrote or read); older ones go once the cap is exceeded.
            if i > 0 and total > max_bytes:
                shutil.rmtree(e, ignore_errors=True)
    except OSError:
        pass


def _pack_cache_enabled(cache: bool | None) -> bool:
    import os

    if cache is not None:
        return cache
    return os.environ.get("MMS_PACK_CACHE", "1") != "0"


def pack_corpus(
    data_path: Path | str,
    subjects: list[str],
    channels_to_use: list[str],
    all_channel_names: list[str],
    classification_mode: str = "stress_binary",
    normalization: str = "all",
    workers: int | None = None,
    cache: bool | None = None,
) -> PackedCorpus:
    """Load + normalize every subject once and pad to [S, Wmax, C, T].

    Normalization is strictly per subject (reference dataset.py:37-48), so
    stats never leak across folds — one packed corpus serves all LOSO folds.

    Subjects pack in a thread pool: the native fused pack
    (native.pack_subject_f32) releases the GIL and the NumPy path is
    BLAS/IO-bound, so staging scales with host cores (half the single-chip
    end-to-end wall was serial pack — benchmarks/RESULTS.md). Results are
    order-deterministic regardless of worker count.

    The result is also memoized on disk under <data_path>/.pack_cache,
    keyed on the pack inputs and source-file mtimes/sizes, because the
    per-subject normalize+pack is fold- and run-invariant: re-running the
    same experiment (or another grid point on the same channel subset)
    replaces ~90-150 s of 1-core staging with an mmap load. `cache=False`
    or MMS_PACK_CACHE=0 disables; MMS_PACK_CACHE_GB bounds the LRU
    (default 16).
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    use_cache = _pack_cache_enabled(cache)
    cache_dir = Path(data_path) / ".pack_cache"
    key = None
    if use_cache:
        key = _pack_cache_key(data_path, subjects, channels_to_use,
                              classification_mode, normalization)
        hit = _pack_cache_load(cache_dir, key)
        if hit is not None:
            print(f"  pack cache hit: {cache_dir / key}")
            return hit

    channel_indices = [all_channel_names.index(ch) for ch in channels_to_use]

    def pack_one(sid):
        fused = _pack_subject_fused(
            data_path, sid, channel_indices, channels_to_use,
            classification_mode, normalization,
        )
        if fused is not None:
            return fused
        item = load_subject_windows(data_path, sid)
        if item is None:
            return None
        x_raw, y_raw = item
        x_sel = x_raw[:, :, channel_indices]
        y, keep = map_labels(y_raw, classification_mode)
        x_norm = normalize_subject(x_sel, y_raw, channels_to_use, normalization)
        return sid, x_norm[keep].transpose(0, 2, 1), y[keep]

    if workers is None:
        workers = min(8, len(subjects))
    if workers > 1 and len(subjects) > 1:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            packed = list(ex.map(pack_one, subjects))  # order-preserving
    else:
        packed = [pack_one(sid) for sid in subjects]
    per_subject = [p for p in packed if p is not None]
    if not per_subject:
        raise ValueError(f"No data loaded for subjects: {subjects}.")
    corpus = _stack_packed(per_subject)
    if use_cache:
        max_bytes = int(float(os.environ.get("MMS_PACK_CACHE_GB", "16"))
                        * (1 << 30))
        _pack_cache_store(cache_dir, key, corpus, max_bytes)
    return corpus


def from_pickles_meta(channels_to_use, preprocess_cfg=None) -> tuple[list[str], dict]:
    """(all_channel_names, preprocess_meta) that pickle staging of this
    channel set produces — the meta dict matches the preprocess CLI's
    _preprocess_meta.json (the serving-time windowing contract)."""
    from multimodalsignal_tpu.config import (
        ALL_CHANNEL_NAMES,
        WRIST_CHANNEL_NAMES,
        PreprocessConfig,
    )

    if preprocess_cfg is None:
        preprocess_cfg = PreprocessConfig(
            targets=("raw",),
            include_wrist=any(ch.startswith("wrist_") for ch in channels_to_use),
        )
    all_channel_names = list(ALL_CHANNEL_NAMES)
    if preprocess_cfg.include_wrist:
        all_channel_names += list(WRIST_CHANNEL_NAMES)
    meta = {
        "original_fs": preprocess_cfg.original_chest_fs,
        "fs": preprocess_cfg.raw_fs,
        "window_sec": preprocess_cfg.raw_window_sec,
        "stride_sec": preprocess_cfg.raw_stride_sec,
        "include_wrist": preprocess_cfg.include_wrist,
    }
    return all_channel_names, meta


def pack_corpus_from_pickles(
    wesad_root: Path | str,
    subjects: list[str],
    channels_to_use: list[str],
    classification_mode: str = "stress_binary",
    normalization: str = "all",
    preprocess_cfg=None,
    workers: int | None = None,
    cache: bool | None = None,
    subject_cache: dict | None = None,
) -> tuple[PackedCorpus, list[str], dict]:
    """Stage the sharded sweep's corpus straight from raw WESAD pickles.

    Fuses preprocess (resample + window, data/preprocess.py) with the corpus
    pack in memory, skipping the intermediate npy round-trip entirely — on
    this project's measured host the two-step pipeline writes + re-reads
    ~2.8 GB through an ~81 MB/s buffered-write ceiling that dwarfs the 36 s
    of actual preprocessing compute (benchmarks/RESULTS.md "Complete
    pipeline"). Bit-identical to preprocess-CLI-then-pack_corpus (pinned by
    tests/test_from_pickles.py): preprocess_subject produces the same float32
    windows the npy files would hold, and _pack_arrays is the same
    select/normalize/pack both paths share.

    Returns (corpus, all_channel_names, preprocess_meta) — the meta dict
    matches what the preprocess CLI persists in _preprocess_meta.json (the
    serving-time windowing contract).

    `subject_cache` (optional dict) memoizes each subject's preprocessed
    windows across calls — the hierarchical sweep packs three corpora
    (M1 / M2 / union) from the same pickles and preprocesses each subject
    once. Keyed on (sid, include_wrist); the caller owns the lifetime.
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    from multimodalsignal_tpu.config import PreprocessConfig
    from multimodalsignal_tpu.data.preprocess import preprocess_subject

    if preprocess_cfg is None:
        preprocess_cfg = PreprocessConfig(
            wesad_root=str(wesad_root),
            targets=("raw",),
            subjects=tuple(subjects),
            include_wrist=any(ch.startswith("wrist_") for ch in channels_to_use),
        )
    all_channel_names, meta = from_pickles_meta(channels_to_use, preprocess_cfg)
    unknown = [ch for ch in channels_to_use if ch not in all_channel_names]
    if unknown:
        raise ValueError(
            f"Unknown channels {unknown}; from-pickles staging produces "
            f"{all_channel_names}."
        )
    channel_indices = [all_channel_names.index(ch) for ch in channels_to_use]

    use_cache = _pack_cache_enabled(cache)
    cache_dir = Path(wesad_root) / ".pack_cache"
    key = None
    if use_cache:
        key = _pickles_cache_key(wesad_root, subjects, channels_to_use,
                                 classification_mode, normalization, meta)
        hit = _pack_cache_load(cache_dir, key)
        if hit is not None:
            print(f"  pack cache hit: {cache_dir / key}")
            return hit, all_channel_names, meta

    def pack_one(sid):
        memo_key = (sid, preprocess_cfg.include_wrist)
        if subject_cache is not None and memo_key in subject_cache:
            item = subject_cache[memo_key]
        else:
            result = preprocess_subject(sid, preprocess_cfg)
            item = None
            if result is not None:
                x_raw, y_raw = result["raw"]
                item = (np.ascontiguousarray(x_raw, dtype=np.float32), y_raw)
            if subject_cache is not None:
                subject_cache[memo_key] = item
        if item is None:
            return None
        x, y = _pack_arrays(
            item[0], item[1],
            channel_indices, channels_to_use, classification_mode,
            normalization,
        )
        return sid, x, y

    if workers is None:
        workers = min(8, len(subjects))
    if workers > 1 and len(subjects) > 1:
        # The per-subject DSP is NumPy/scipy whose kernels release the GIL;
        # on multi-core hosts subjects overlap (1-core hosts: no harm).
        with ThreadPoolExecutor(max_workers=workers) as ex:
            packed = list(ex.map(pack_one, subjects))  # order-preserving
    else:
        packed = [pack_one(sid) for sid in subjects]
    per_subject = [p for p in packed if p is not None]
    if not per_subject:
        raise ValueError(f"No pickles loaded for subjects: {subjects}.")
    corpus = _stack_packed(per_subject)
    if use_cache:
        max_bytes = int(float(os.environ.get("MMS_PACK_CACHE_GB", "16"))
                        * (1 << 30))
        _pack_cache_store(cache_dir, key, corpus, max_bytes)
    return corpus, all_channel_names, meta


def _pickles_cache_key(wesad_root, subjects, channels_to_use,
                       classification_mode, normalization, meta) -> str:
    """Pack-cache key for pickle-staged corpora: the pack inputs, the
    preprocess parameters, and the (mtime_ns, size) of every subject's pkl
    and quest csv."""
    import hashlib
    import json

    root = Path(wesad_root)
    states = []
    for sid in subjects:
        for f in (root / sid / f"{sid}.pkl", root / sid / f"{sid}_quest.csv"):
            try:
                st = f.stat()
                states.append([f.name, st.st_mtime_ns, st.st_size])
            except OSError:
                states.append([f.name, None, None])
    payload = json.dumps([
        _PACK_CACHE_VERSION, "pickles", list(subjects),
        list(channels_to_use), classification_mode, normalization,
        meta, states,
    ])
    return hashlib.sha256(payload.encode()).hexdigest()[:24]


def pack_hybrid_corpus(
    raw_align_path: Path | str,
    feature_path: Path | str,
    subjects: list[str],
    channels_to_use: list[str],
    all_channel_names: list[str],
    features_to_use: list[str] | None = None,
    classification_mode: str = "stress_binary",
    normalization: str = "all",
    workers: int | None = None,
) -> PackedCorpus:
    """pack_corpus over the raw-align target, plus the aligned handcrafted
    feature stream — the sharded-sweep form of build_hybrid_dataset (reference
    void/dataset.py:72-198). The reference's invariants are enforced per
    subject: raw-align and feature window counts and mapped labels must agree
    exactly (void/dataset.py:182-186), so pool indices address both streams.
    """
    corpus = pack_corpus(
        raw_align_path, subjects, channels_to_use, all_channel_names,
        classification_mode, normalization, workers,
    )
    all_feature_names = read_feature_names(feature_path)
    feat_idx = (
        [all_feature_names.index(f) for f in features_to_use]
        if features_to_use
        else list(range(len(all_feature_names)))
    )
    s, wmax = corpus.y.shape
    feat_out = np.zeros((s, wmax, len(feat_idx)), dtype=np.float32)
    for i, sid in enumerate(corpus.subjects):
        item = load_subject_windows(feature_path, sid)
        if item is None:
            raise ValueError(
                f"Subject {sid} has raw-align data but no feature files "
                f"under {feature_path}."
            )
        x_feat, y_feat_raw = item
        y_feat, keep = map_labels(y_feat_raw, classification_mode)
        xf = normalize_features(x_feat[:, feat_idx], y_feat_raw, normalization)
        xf, yk = xf[keep], y_feat[keep]
        n = int(corpus.mask[i].sum())
        if len(yk) != n or not np.array_equal(yk, corpus.y[i, :n]):
            raise ValueError(
                f"raw-align vs feature streams disagree for {sid}: "
                f"{n} raw windows vs {len(yk)} feature windows (or labels "
                "differ) — regenerate both preprocess targets together."
            )
        feat_out[i, :n] = xf
    return dataclasses.replace(corpus, feat=feat_out)
