"""Online (streaming) classification of a live multichannel signal feed.

The reference and the batch inference path (`experiments/predict.py`) both
assume a complete recording. A deployment watching a subject live cannot
wait for the end: this module classifies windows as they complete.

    sc = StreamingClassifier.for_predictor(predictor, calib_sec=120)
    for chunk in feed:            # [n, C] float at the model's target rate,
        for ev in sc.push(chunk): # channels in cfg.channels_to_use order
            print(ev.t_start_sec, ev.label, ev.probs)

Semantics (all documented divergences from the batch path are inherent to
streaming, not implementation shortcuts):

* Input may be at the model's target rate (e.g. 128 Hz) OR at a native
  acquisition rate (`input_fs=700` for a raw chest feed): whole-signal FFT
  resampling (the batch path's scipy-parity method, reference
  preprocess.py:70-75) is not causally computable, so native-rate feeds go
  through a causal polyphase front-end
  (`data.resample.StreamingPolyResampler`) with a fixed Kaiser-sinc filter
  and a documented ~78 ms group delay — sub-stride, so window k of the
  stream still corresponds to window k of the batch pipeline (prediction
  parity pinned in tests/test_streaming.py).
* Per-subject normalization statistics cannot come from the full recording
  (it hasn't happened yet). The stream opens with a **calibration period**
  (`calib_sec`): those samples fix the per-channel stats (same transform
  domain as training: chest_EDA log1p, eps 1e-8 —
  `data/dataset.py::channel_norm_stats`), then every window — including the
  ones inside the calibration span — is classified with the frozen stats.
  Given identical stats, streaming and batch classification agree exactly
  (tested window-for-window).
* Events fire in order, one per stride, as soon as a window's last sample
  arrives (plus calibration latency for the earliest windows).
* **Hybrid checkpoints** (`hybrid_cnn_gru`) stream too: handcrafted features
  are per-window and causal (each reads only its own 60 s of signal —
  reference preprocess.py:77-123), so every completed window's features are
  extracted live from the UNNORMALIZED feed. The feed must then carry the
  model channels PLUS the four feature sensors (`sc.feed_channels` gives the
  exact column order); feature z-score statistics are frozen on the windows
  fully contained in the calibration span (the batch path uses all-recording
  feature stats, which are not causally computable — the same stats-source
  divergence the raw stream already documents), so `calib_sec` must cover at
  least two full windows (window_sec + stride_sec) — one lone window would
  freeze a zero feature std.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from multimodalsignal_tpu.data.dataset import (
    apply_channel_norm,
    channel_norm_stats,
)
from multimodalsignal_tpu.experiments.predict import CLASS_NAMES


@dataclass
class StreamEvent:
    """One classified window."""

    index: int           # 0-based window number
    t_start_sec: float
    t_end_sec: float
    label: str
    probs: np.ndarray    # [num_classes]


class StreamingClassifier:
    """Incremental windowed classification with calibration-frozen stats."""

    def __init__(self, predictor, channel_names: list[str],
                 target_fs: int, window_sec: int, stride_sec: int,
                 calib_sec: float = 120.0, batch_size: int = 64,
                 input_fs: int | None = None):
        if calib_sec <= 0:
            raise ValueError("calib_sec must be positive")
        self.predictor = predictor
        self.channel_names = list(channel_names)
        self.is_hybrid = bool(getattr(predictor, "is_hybrid", False))
        # Hybrid feeds must carry the feature sensors alongside the model
        # channels; feed_channels is the required chunk column order (for a
        # raw model it equals channel_names).
        if self.is_hybrid:
            from multimodalsignal_tpu.data.features import (
                FEATURE_SENSOR_CHANNELS,
            )

            self.feature_names = tuple(predictor.feature_names)
            self.feed_channels = self.channel_names + [
                s for s in FEATURE_SENSOR_CHANNELS
                if s not in self.channel_names]
            self._feat_cols = [self.feed_channels.index(s)
                               for s in FEATURE_SENSOR_CHANNELS]
            if calib_sec < window_sec + stride_sec:
                # One lone calibration window would freeze feats.std() == 0
                # (z-scores divided by the bare 1e-3 epsilon -> ~1000x
                # inflated model inputs); require >= 2 complete windows so
                # the frozen std reflects actual feature variance.
                raise ValueError(
                    f"hybrid streaming needs calib_sec >= window_sec + "
                    f"stride_sec ({window_sec + stride_sec}) to freeze "
                    f"feature statistics over at least two complete "
                    f"windows; got {calib_sec}")
        else:
            self.feature_names = ()
            self.feed_channels = self.channel_names
            self._feat_cols = []
        self.input_fs = int(input_fs) if input_fs else int(target_fs)
        if self.input_fs != target_fs:
            from multimodalsignal_tpu.data.resample import (
                StreamingPolyResampler,
            )

            self._resampler = StreamingPolyResampler(
                self.input_fs, target_fs,
                num_channels=len(self.feed_channels))
        else:
            self._resampler = None
        self.target_fs = target_fs
        self.window_samples = window_sec * target_fs
        self.stride_samples = stride_sec * target_fs
        self.calib_samples = int(round(calib_sec * target_fs))
        self.batch_size = batch_size
        self.class_names = CLASS_NAMES[predictor.cfg.classification_mode] \
            if hasattr(predictor, "cfg") else tuple(predictor.class_names)
        self._chunks: list[np.ndarray] = []
        self._n = 0                 # total samples received
        self._buf: np.ndarray | None = None
        self._buf_offset = 0        # absolute sample index of _buf[0]
        self._next_window = 0       # next window index to classify
        self.stats: tuple[np.ndarray, np.ndarray] | None = None
        self.feat_stats: tuple[np.ndarray, np.ndarray] | None = None

    @classmethod
    def for_predictor(cls, predictor, calib_sec: float = 120.0,
                      batch_size: int = 64,
                      input_fs: int | None = None) -> "StreamingClassifier":
        """Wire geometry + channel order from a Predictor/EnsemblePredictor
        (cfg-backed) or an export.ExportedPredictor (meta-backed).
        input_fs: the live feed's native rate (e.g. 700 for a raw chest
        stream); omitted = feed already at the model's target rate."""
        meta = getattr(predictor, "meta", None)
        if meta is not None:
            return cls(predictor, list(meta["channels"]), meta["target_fs"],
                       meta["window_sec"], meta["stride_sec"],
                       calib_sec=calib_sec, batch_size=batch_size,
                       input_fs=input_fs)
        return cls(
            predictor, list(predictor.cfg.channels_to_use),
            predictor.target_fs, predictor.window_sec, predictor.stride_sec,
            calib_sec=calib_sec, batch_size=batch_size, input_fs=input_fs,
        )

    # -- feed -------------------------------------------------------------------
    def push(self, chunk: np.ndarray) -> list[StreamEvent]:
        """Feed [n, C] samples at `input_fs` (native-rate feeds are causally
        resampled to the model rate first); returns the windows completed by
        this chunk (empty while the calibration span is still filling)."""
        chunk = np.atleast_2d(np.asarray(chunk, dtype=np.float32))
        if chunk.shape[1] != len(self.feed_channels):
            raise ValueError(
                f"chunk has {chunk.shape[1]} channels, stream expects "
                f"{len(self.feed_channels)} ({self.feed_channels})")
        if not np.isfinite(chunk).all():
            raise ValueError("chunk contains NaN/Inf")
        if self._resampler is not None:
            chunk = self._resampler.push(chunk).astype(np.float32)
            if len(chunk) == 0:
                return []
        self._chunks.append(chunk)
        self._n += len(chunk)

        if self.stats is None:
            if self._n < self.calib_samples:
                return []
            # Calibration closes: freeze per-channel stats on exactly the
            # calibration span (deterministic w.r.t. chunking). For hybrid
            # feeds only the model channels (the leading columns) are
            # z-scored; the trailing feature-sensor columns stay raw.
            self._consolidate()
            calib = self._buf[: self.calib_samples]
            self.stats = channel_norm_stats(
                calib[:, : len(self.channel_names)], self.channel_names)
            if self.is_hybrid:
                self.feat_stats = self._freeze_feature_stats(calib)
        return self._classify_ready()

    def flush(self) -> list[StreamEvent]:
        """End of stream: classify any final complete windows (a partial
        trailing window is dropped, matching the batch path's windowing)."""
        if self.stats is None:
            return []
        return self._classify_ready()

    # -- internals ---------------------------------------------------------------
    def _window_features(self, windows: np.ndarray) -> np.ndarray:
        """Unnormalized feed windows [k, T, C_feed] -> raw feature matrix
        [k, F_selected] (the offline feature target's math: float64 sensor
        windows, NaN groups zero-filled, reference preprocess.py:211)."""
        from multimodalsignal_tpu.data.features import (
            FEATURE_NAMES,
            FEATURE_SENSOR_CHANNELS,
            extract_features_batch,
        )

        channel_windows = {
            s: np.ascontiguousarray(windows[:, :, c].astype(np.float64))
            for s, c in zip(FEATURE_SENSOR_CHANNELS, self._feat_cols)
        }
        feats = extract_features_batch(channel_windows, self.target_fs)
        feats = np.nan_to_num(feats, nan=0.0, posinf=0.0, neginf=0.0)
        idx = [FEATURE_NAMES.index(f) for f in self.feature_names]
        return feats[:, idx]

    def _freeze_feature_stats(self, calib: np.ndarray):
        """Feature z-score stats from the windows fully contained in the
        calibration span (normalize_features' 1e-3 epsilon — the batch path's
        all-recording stats are not causally computable)."""
        starts = np.arange(0, len(calib) - self.window_samples + 1,
                           self.stride_samples)
        wins = np.stack([calib[s : s + self.window_samples] for s in starts])
        feats = self._window_features(wins).astype(np.float64)
        return feats.mean(axis=0), feats.std(axis=0) + 1e-3

    def _consolidate(self) -> None:
        parts = ([self._buf] if self._buf is not None else []) + self._chunks
        self._buf = np.concatenate(parts) if len(parts) > 1 else parts[0]
        self._chunks = []

    def _classify_ready(self) -> list[StreamEvent]:
        self._consolidate()
        events: list[StreamEvent] = []
        windows = []
        first = self._next_window
        while (self._next_window * self.stride_samples - self._buf_offset
               + self.window_samples) <= len(self._buf):
            s = self._next_window * self.stride_samples - self._buf_offset
            windows.append(self._buf[s : s + self.window_samples])
            self._next_window += 1
        if not windows:
            return events
        # Samples before the next window's start are never read again: trim
        # them so a long-lived feed stays O(window) in memory instead of
        # retaining (and re-concatenating) the entire history every push.
        cut = min(self._next_window * self.stride_samples - self._buf_offset,
                  len(self._buf))
        if cut > 0:
            # `windows` holds views into the old buffer; they are consumed by
            # np.stack below, after which the old allocation is released.
            self._buf = self._buf[cut:].copy()
            self._buf_offset += cut
        mean, std = self.stats
        stacked = np.stack(windows)                       # [k, T, C_feed]
        win = apply_channel_norm(stacked[:, :, : len(self.channel_names)],
                                 self.channel_names, mean, std)  # [k, T, C]
        x = np.ascontiguousarray(win.transpose(0, 2, 1))  # [k, C, T]
        if self.is_hybrid:
            f_mean, f_std = self.feat_stats
            feats = self._window_features(stacked)
            x_feat = ((feats - f_mean) / f_std).astype(np.float32)
            x = (x, x_feat)
        probs = self.predictor.predict_windows(x, self.batch_size)
        for j, p in enumerate(probs):
            idx = first + j
            s_sec = idx * self.stride_samples / self.target_fs
            events.append(StreamEvent(
                index=idx, t_start_sec=s_sec,
                t_end_sec=s_sec + self.window_samples / self.target_fs,
                label=self.class_names[int(p.argmax())],
                probs=np.asarray(p),
            ))
        return events
