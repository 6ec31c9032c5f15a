"""Inference: load a trained fold checkpoint and classify a raw recording.

The reference stops at cross-validation — there is no way to apply a trained
model to new data (SURVEY.md §1: no serving/API layer). This closes that gap:

    python -m multimodalsignal_tpu.experiments.predict \
        --checkpoint output/.../fold_test_on_S2/best_model.msgpack \
        --config output/.../config.json \
        --pkl WESAD/S16/S16.pkl            # raw WESAD recording
        --out predictions.json

or programmatically::

    predictor = Predictor.from_run(run_dir, fold="S2")
    result = predictor.predict_recording(pkl_path)

Pipeline per recording: resample 700->128 Hz, slide 60 s / 10 s windows over
the WHOLE recording (no protocol file needed at inference time), apply the
training normalization scheme with the recording's own statistics (the
reference normalizes per subject, dataset.py:37-48 — at inference the subject
is the recording), then one jitted batch forward.
"""

from __future__ import annotations

import argparse
import json
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodalsignal_tpu.config import (
    ALL_CHANNEL_NAMES,
    CHEST_SENSORS,
    ExperimentConfig,
    config_from_dict,
)
from multimodalsignal_tpu.data.dataset import normalize_subject
from multimodalsignal_tpu.data.resample import resample_signal
from multimodalsignal_tpu.data.windowing import sliding_windows, window_starts
from multimodalsignal_tpu.data.wesad_io import chest_signals, load_pkl
from multimodalsignal_tpu.models import build_model
from multimodalsignal_tpu.train.checkpoints import restore_state
from multimodalsignal_tpu.train.trainer import TrainState, init_train_state
from multimodalsignal_tpu.train.optim import make_optimizer

CLASS_NAMES = {
    "stress_binary": ("non_stress", "stress"),
    "amusement_binary": ("baseline", "amusement"),
    "ternary": ("baseline", "amusement", "stress"),
}


@dataclass
class PredictionResult:
    starts_sec: np.ndarray   # [N] window start times in seconds
    labels: np.ndarray       # [N] argmax class ids
    probs: np.ndarray        # [N, num_classes]
    class_names: tuple[str, ...]

    def to_json(self) -> str:
        return json.dumps({
            "class_names": list(self.class_names),
            "windows": [
                {
                    "start_sec": float(t),
                    "label": self.class_names[int(l)],
                    "probs": [round(float(p), 6) for p in row],
                }
                for t, l, row in zip(self.starts_sec, self.labels, self.probs)
            ],
        }, indent=2)


def _recording_grid(
    pkl_path: Path | str,
    channels_to_use: list[str],
    original_fs: int,
    target_fs: int,
) -> tuple[np.ndarray, list[str]]:
    """Raw WESAD pickle -> resampled channel grid [T', C_all] + its names.

    Always contains the full 8-channel chest block (so handcrafted features
    can read their sensors even when the model uses a channel subset);
    appends the wrist block only when a wrist channel is requested."""
    data = load_pkl(pkl_path)
    chest = chest_signals(data)
    cols = []
    for sensor in CHEST_SENSORS:
        sig = np.asarray(chest[sensor])
        if sig.ndim == 1:
            sig = sig[:, None]
        cols.append(resample_signal(sig, original_fs, target_fs))
    full = np.concatenate(cols, axis=1)  # [T', 8]

    # Wrist-channel checkpoints (data/preprocess.py --include-wrist):
    # append the wrist block on the chest grid, exactly as preprocessing
    # does, with the same zero-fill fallback for chest-only recordings.
    names = list(ALL_CHANNEL_NAMES)
    if any(ch not in ALL_CHANNEL_NAMES for ch in channels_to_use):
        from multimodalsignal_tpu.config import WRIST_CHANNEL_NAMES
        from multimodalsignal_tpu.data.preprocess import _resample_wrist
        from multimodalsignal_tpu.data.wesad_io import wrist_signals

        wrist = wrist_signals(data)
        if wrist is None:
            print(f"Warning: {pkl_path} has no wrist data; "
                  f"wrist channels filled with zeros.")
            block = np.zeros((full.shape[0], len(WRIST_CHANNEL_NAMES)))
        else:
            block = _resample_wrist(wrist, target_fs, full.shape[0])
        full = np.concatenate([full, block], axis=1)
        names += list(WRIST_CHANNEL_NAMES)
    return full, names


def _inference_norm_scheme(normalization: str) -> str:
    """Map the training scheme to its inference-time equivalent."""
    if normalization == "baseline":
        # Training stats came from Base-protocol windows only
        # (void/dataset.py:30-55); an unlabeled recording has no Base
        # segment, so the closest available statistics are all-window —
        # a distribution shift the caller should know about.
        print(
            "WARNING: model was trained with 'baseline' (Base-windows-"
            "only) normalization statistics; at inference the recording "
            "has no protocol labels, so all-window statistics are used "
            "instead. Expect a shifted input distribution.",
            flush=True,
        )
        return "all"
    return normalization


def recording_to_windows(
    pkl_path: Path | str,
    channels_to_use: list[str],
    normalization: str,
    original_fs: int = 700,
    target_fs: int = 128,
    window_sec: int = 60,
    stride_sec: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
    """Raw WESAD pickle -> normalized [N, C, T] windows + start times (s).

    The standalone serving pipeline: resample, slide windows over the whole
    recording (no protocol file at inference time), normalize with the
    recording's own statistics. Shared by `Predictor` (checkpoint serving)
    and `export.ExportedPredictor` (artifact serving — its meta.json carries
    exactly these parameters)."""
    full, names = _recording_grid(pkl_path, channels_to_use, original_fs,
                                  target_fs)
    window_samples = window_sec * target_fs
    stride_samples = stride_sec * target_fs
    starts = window_starts(0, full.shape[0], window_samples, stride_samples)
    x = _normalized_raw_windows(full, names, channels_to_use, normalization,
                                starts, window_samples)
    return x, starts / target_fs


def _normalized_raw_windows(full, names, channels_to_use, normalization,
                            starts, window_samples) -> np.ndarray:
    """Shared raw serving stream: select channels, window, normalize with
    the recording's own per-subject statistics, -> [N, C, T]. ONE
    implementation for both raw and hybrid serving so the pipelines cannot
    desynchronize (test_recording_to_hybrid_windows_contract pins parity).
    Per-recording normalization = the training scheme's per-subject
    statistics (all windows; no labels exist at inference time)."""
    ch_idx = [names.index(ch) for ch in channels_to_use]
    win = sliding_windows(full[:, ch_idx].astype(np.float32), starts,
                          window_samples)  # [N, T, C]
    y_dummy = np.ones(len(win), dtype=np.int64)
    scheme = _inference_norm_scheme(normalization)
    win = normalize_subject(win, y_dummy, list(channels_to_use), scheme)
    return np.ascontiguousarray(win.transpose(0, 2, 1))  # [N, C, T]


def recording_to_hybrid_windows(
    pkl_path: Path | str,
    channels_to_use: list[str],
    normalization: str,
    features_to_use: list[str] | None = None,
    original_fs: int = 700,
    target_fs: int = 128,
    window_sec: int = 60,
    stride_sec: int = 10,
) -> tuple[tuple[np.ndarray, np.ndarray], np.ndarray]:
    """Raw WESAD pickle -> ((raw [N, C, T], feat [N, F]), start times).

    The hybrid deployment pipeline, mirroring training (data/preprocess.py
    feature target + dataset.build_hybrid_dataset): handcrafted features are
    extracted per window from the UNNORMALIZED resampled feature sensors
    (chest ECG/EDA/EMG/Resp — always available in the chest grid regardless
    of the model's channel subset), NaN groups zero-filled (reference
    preprocess.py:211 fillna(0)), then z-scored with the recording's own
    all-window statistics (normalize_features' 1e-3 epsilon). The raw stream
    is windowed and normalized exactly like `recording_to_windows`. Both
    streams share one window grid, so counts align by construction (the
    raw-align padding the offline pipeline needs, preprocess.py:224-240,
    is a no-op here)."""
    from multimodalsignal_tpu.data.dataset import normalize_features
    from multimodalsignal_tpu.data.features import (
        FEATURE_NAMES,
        FEATURE_SENSOR_CHANNELS,
        extract_features_batch,
    )

    full, names = _recording_grid(pkl_path, channels_to_use, original_fs,
                                  target_fs)
    window_samples = window_sec * target_fs
    stride_samples = stride_sec * target_fs
    starts = window_starts(0, full.shape[0], window_samples, stride_samples)

    x_raw = _normalized_raw_windows(full, names, channels_to_use,
                                    normalization, starts, window_samples)
    y_dummy = np.ones(len(x_raw), dtype=np.int64)
    scheme = _inference_norm_scheme(normalization)

    # Feature stream: float64 unnormalized sensor windows, exactly like the
    # offline feature target (preprocess.py gathers the 4 feature channels
    # before any normalization).
    channel_windows = {
        ch: sliding_windows(full[:, names.index(ch)].astype(np.float64),
                            starts, window_samples)
        for ch in FEATURE_SENSOR_CHANNELS
    }
    feats = extract_features_batch(channel_windows, target_fs)
    feats = np.nan_to_num(feats, nan=0.0, posinf=0.0, neginf=0.0)
    if features_to_use:
        idx = [FEATURE_NAMES.index(f) for f in features_to_use]
        feats = feats[:, idx]
    x_feat = normalize_features(feats, y_dummy, scheme)
    return (x_raw, x_feat), starts / target_fs


def _num_windows(x) -> int:
    """Window count of a raw [N, C, T] batch or a hybrid (raw, feat) pair."""
    return int((x[0] if isinstance(x, (tuple, list)) else x).shape[0])


def _pad_batch(x, pad: int):
    """Zero-pad the leading (window) axis of every leaf."""
    return jax.tree_util.tree_map(
        lambda a: np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)]),
        x)


def hybrid_feature_names(cfg: ExperimentConfig) -> tuple[str, ...]:
    """The feature columns a hybrid_cnn_gru checkpoint expects, in order."""
    from multimodalsignal_tpu.data.features import FEATURE_NAMES

    return tuple(cfg.features_to_use) or FEATURE_NAMES


def _init_sample(cfg: ExperimentConfig):
    """Shape-only init input for checkpoint restore templates: a raw window
    batch, or the (raw, feat) pair for hybrid checkpoints. Window length is
    irrelevant to param shapes."""
    raw = jnp.zeros((1, len(cfg.channels_to_use), 128 * 60), jnp.float32)
    if cfg.model.name == "hybrid_cnn_gru":
        return raw, jnp.zeros((1, len(hybrid_feature_names(cfg))), jnp.float32)
    return raw


def _check_feature_extractor_version(meta: dict) -> None:
    """Train/serve skew guard for hybrid checkpoints: the cached features
    the model trained on must come from the SAME extractor math as the
    features this package computes live at inference (data/features.py
    FEATURE_EXTRACTOR_VERSION; e.g. round 5 moved HRV spectra from linear
    to PCHIP tachogram interpolation — ~24% larger HF power)."""
    from multimodalsignal_tpu.data.features import FEATURE_EXTRACTOR_VERSION

    trained = meta.get("feature_extractor_version")
    if trained is None:
        import warnings

        warnings.warn(
            "hybrid checkpoint carries no feature_extractor_version stamp "
            "(preprocessed before the stamp existed); live features are "
            f"v{FEATURE_EXTRACTOR_VERSION} and may be skewed vs training — "
            "re-preprocess the feature target and retrain to clear this",
            stacklevel=3)
    elif int(trained) != FEATURE_EXTRACTOR_VERSION:
        raise ValueError(
            f"hybrid checkpoint was trained on feature extractor "
            f"v{trained} but this package computes v"
            f"{FEATURE_EXTRACTOR_VERSION} features live at inference; "
            "re-preprocess the feature target and retrain (or serve with "
            "the matching package version)")


class Predictor:
    """Jitted windowed inference for one trained model.

    Model-family aware: for `hybrid_cnn_gru` checkpoints (reference
    void/dataset.py:72-198 / trainer.py:130-146 tuple batches) every window
    batch is the pytree (x_raw [N, C, T], x_feat [N, F]) and
    `windows_from_recording` extracts + normalizes both streams
    (recording_to_hybrid_windows)."""

    def __init__(self, cfg: ExperimentConfig, state: TrainState,
                 original_fs: int = 700, target_fs: int = 128,
                 window_sec: int = 60, stride_sec: int = 10):
        self.cfg = cfg
        self.state = state
        self.original_fs = original_fs
        self.target_fs = target_fs
        self.window_sec = window_sec
        self.stride_sec = stride_sec
        self.is_hybrid = cfg.model.name == "hybrid_cnn_gru"
        self.feature_names = hybrid_feature_names(cfg) if self.is_hybrid else ()
        self.model = build_model(cfg.model, cfg.num_classes)
        self._predict = jax.jit(self._predict_fn)

    def _predict_fn(self, params, batch_stats, x):
        logits = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return jax.nn.softmax(logits, axis=-1)

    # -- constructors ---------------------------------------------------------
    @classmethod
    def from_cfg_and_checkpoint(cls, cfg: ExperimentConfig,
                                checkpoint: Path | str,
                                preprocess_meta: dict | None = None) -> "Predictor":
        """Build from an in-memory config + checkpoint file. preprocess_meta
        (the run's embedded _preprocess_meta.json) carries the training-time
        resample/window/stride so serving replays them instead of assuming
        700->128 Hz / 60 s / 10 s."""
        model = build_model(cfg.model, cfg.num_classes)
        tx = make_optimizer(cfg.trainer.learning_rate, cfg.trainer.weight_decay)
        # Template for restore: param shapes are T-independent, any window
        # length works for the init sample.
        template = init_train_state(model, jax.random.PRNGKey(0),
                                    _init_sample(cfg), tx)
        state = restore_state(checkpoint, template)
        meta = preprocess_meta or {}
        if cfg.model.name == "hybrid_cnn_gru":
            _check_feature_extractor_version(meta)
        return cls(
            cfg, state,
            original_fs=int(meta.get("original_fs", 700)),
            target_fs=int(meta.get("fs", 128)),
            window_sec=int(meta.get("window_sec", 60)),
            stride_sec=int(meta.get("stride_sec", 10)),
        )

    @classmethod
    def from_files(cls, checkpoint: Path | str, config: Path | str) -> "Predictor":
        raw = json.loads(Path(config).read_text())
        cfg = config_from_dict(ExperimentConfig, raw)
        return cls.from_cfg_and_checkpoint(cfg, checkpoint,
                                           raw.get("preprocess_meta"))

    @classmethod
    def from_run(cls, run_dir: Path | str, fold: str) -> "Predictor":
        run_dir = Path(run_dir)
        return cls.from_files(
            run_dir / f"fold_test_on_{fold}" / "best_model.msgpack",
            run_dir / "config.json",
        )

    # -- inference ------------------------------------------------------------
    def windows_from_recording(self, pkl_path: Path | str):
        """Raw WESAD pickle -> normalized windows + start times. Raw models
        get [N, C, T]; hybrid models get the pytree ([N, C, T], [N, F])."""
        if self.is_hybrid:
            return recording_to_hybrid_windows(
                pkl_path, list(self.cfg.channels_to_use),
                self.cfg.normalization, list(self.feature_names),
                self.original_fs, self.target_fs, self.window_sec,
                self.stride_sec,
            )
        return recording_to_windows(
            pkl_path, list(self.cfg.channels_to_use), self.cfg.normalization,
            self.original_fs, self.target_fs, self.window_sec,
            self.stride_sec,
        )

    def predict_windows(self, x, batch_size: int = 64) -> np.ndarray:
        """[N, C, T] (or the hybrid pytree) -> probs [N, num_classes]
        (fixed-size padded batches so one compiled program serves any
        recording length)."""
        n = _num_windows(x)
        probs = []
        for i in range(0, n, batch_size):
            xb = jax.tree_util.tree_map(lambda a: a[i : i + batch_size], x)
            pad = batch_size - _num_windows(xb)
            if pad:
                xb = _pad_batch(xb, pad)
            p = self._predict(self.state.params, self.state.batch_stats,
                              jax.tree_util.tree_map(jnp.asarray, xb))
            probs.append(np.asarray(p)[: batch_size - pad])
        return np.concatenate(probs, axis=0)

    def predict_recording(self, pkl_path: Path | str) -> PredictionResult:
        x, starts_sec = self.windows_from_recording(pkl_path)
        probs = self.predict_windows(x)
        return PredictionResult(
            starts_sec=starts_sec,
            labels=probs.argmax(axis=-1),
            probs=probs,
            class_names=CLASS_NAMES[self.cfg.classification_mode],
        )


class EnsemblePredictor(Predictor):
    """Every fold checkpoint of a LOSO run as ONE forward: params stacked
    along a fold axis, the model vmapped over it (a single XLA program — the
    fold ensemble rides the MXU exactly like the training sweep's fold axis,
    parallel/fold_sweep.py), probabilities averaged across folds.

    This is the deployment-shaped answer to "which fold's model do I ship?":
    the reference trains 15 models and ships none (SURVEY.md §1); here the
    cross-validated ensemble itself is servable and exportable.
    """

    def __init__(self, cfg: ExperimentConfig, states_stacked: TrainState,
                 fold_names: tuple[str, ...], **kw):
        self.fold_names = tuple(fold_names)
        super().__init__(cfg, states_stacked, **kw)
        # The forward is vmapped over the fold axis: with gru_impl="auto"
        # pick the per-direction kernels (see build_model's fold_parallel
        # note — direction batching loses at fold scale).
        self.model = build_model(cfg.model, cfg.num_classes,
                                 fold_parallel=True)

    def _predict_fn(self, params, batch_stats, x):
        def one_fold(p, bs):
            logits = self.model.apply(
                {"params": p, "batch_stats": bs}, x, train=False
            )
            return jax.nn.softmax(logits, axis=-1)

        probs = jax.vmap(one_fold)(params, batch_stats)  # [F, B, K]
        return probs.mean(axis=0)

    @classmethod
    def from_run(cls, run_dir: Path | str, fold: str = "all") -> "Predictor":
        """fold='all' -> the ensemble; a subject id -> that fold alone."""
        if fold != "all":
            return Predictor.from_run(run_dir, fold)
        run_dir = Path(run_dir)
        ckpts = sorted(run_dir.glob("fold_test_on_*/best_model.msgpack"))
        if not ckpts:
            raise FileNotFoundError(
                f"no fold_test_on_*/best_model.msgpack under {run_dir}")
        # One config parse + one restore template for all folds (the
        # per-fold checkpoints share the run's architecture); building a
        # full Predictor per fold would re-init the model F times.
        raw = json.loads((run_dir / "config.json").read_text())
        cfg = config_from_dict(ExperimentConfig, raw)
        model = build_model(cfg.model, cfg.num_classes)
        tx = make_optimizer(cfg.trainer.learning_rate,
                            cfg.trainer.weight_decay)
        template = init_train_state(model, jax.random.PRNGKey(0),
                                    _init_sample(cfg), tx)
        states = jax.tree_util.tree_map(
            lambda *leaves: np.stack(leaves),
            *(restore_state(c, template) for c in ckpts))
        meta = raw.get("preprocess_meta") or {}
        return cls(
            cfg, states,
            fold_names=tuple(c.parent.name.removeprefix("fold_test_on_")
                             for c in ckpts),
            original_fs=int(meta.get("original_fs", 700)),
            target_fs=int(meta.get("fs", 128)),
            window_sec=int(meta.get("window_sec", 60)),
            stride_sec=int(meta.get("stride_sec", 10)),
        )


class HierarchicalPredictor:
    """Composed two-stage ternary inference from a trained hierarchical run
    (the reference's flagship mode, main.py:159-247).

    M1 (stress vs non-stress) and M2 (amusement vs baseline) each see their
    own channel subset sliced from union-channel windows. Labels replicate
    the reference's hard gating exactly (main.py:241-244): stress when M1
    says stress, else M2's class. Probabilities are the product-rule
    composition [p1(non)*p2(base), p1(non)*p2(fun), p1(stress)] — coherent
    posteriors under stage independence; note their argmax can differ from
    the gated label near the M1 boundary (the gate is the parity behavior,
    the probs carry calibrated confidence).
    """

    def __init__(self, m1: Predictor, m2: Predictor):
        from multimodalsignal_tpu.experiments.hierarchical import _ordered_union

        self.m1, self.m2 = m1, m2
        union = _ordered_union(m1.cfg.channels_to_use, m2.cfg.channels_to_use)
        self.channels = tuple(union)
        self._i1 = jnp.asarray([union.index(c) for c in m1.cfg.channels_to_use],
                               jnp.int32)
        self._i2 = jnp.asarray([union.index(c) for c in m2.cfg.channels_to_use],
                               jnp.int32)
        self.class_names = CLASS_NAMES["ternary"]
        # Geometry + normalization travel with the stages (same run).
        self.target_fs = m1.target_fs
        self.original_fs = m1.original_fs
        self.window_sec = m1.window_sec
        self.stride_sec = m1.stride_sec
        self.normalization = m1.cfg.normalization
        self._predict = jax.jit(self._predict_fn)

    def _predict_fn(self, p1, bs1, p2, bs2, x):
        """x [B, C_union, T] -> (probs [B, 3], gated labels [B])."""
        x1 = jnp.take(x, self._i1, axis=1)
        x2 = jnp.take(x, self._i2, axis=1)
        pr1 = jax.nn.softmax(self.m1.model.apply(
            {"params": p1, "batch_stats": bs1}, x1, train=False), axis=-1)
        pr2 = jax.nn.softmax(self.m2.model.apply(
            {"params": p2, "batch_stats": bs2}, x2, train=False), axis=-1)
        probs = jnp.stack(
            [pr1[:, 0] * pr2[:, 0], pr1[:, 0] * pr2[:, 1], pr1[:, 1]], axis=-1)
        labels = jnp.where(jnp.argmax(pr1, axis=-1) == 1, 2,
                           jnp.argmax(pr2, axis=-1))
        return probs, labels

    @classmethod
    def from_run(cls, run_dir: Path | str, fold: str) -> "HierarchicalPredictor":
        """Load one fold's M1+M2 checkpoints from a hierarchical run dir
        (serial or sharded layout: fold_test_on_<fold>/model_m{1,2}/)."""
        import dataclasses as _dc

        from multimodalsignal_tpu.config import HierarchicalConfig

        run_dir = Path(run_dir)
        raw = json.loads((run_dir / "config.json").read_text())
        hcfg = config_from_dict(HierarchicalConfig, raw)
        meta = raw.get("preprocess_meta")
        fold_dir = run_dir / f"fold_test_on_{fold}"

        def stage(channels, model_cfg, mode, sub):
            cfg = _dc.replace(
                hcfg.base, channels_to_use=tuple(channels), model=model_cfg,
                classification_mode=mode, num_classes=2,
            )
            return Predictor.from_cfg_and_checkpoint(
                cfg, fold_dir / sub / "best_model.msgpack", meta)

        return cls(
            stage(hcfg.m1_channels, hcfg.m1_model, "stress_binary", "model_m1"),
            stage(hcfg.m2_channels, hcfg.m2_model, "amusement_binary", "model_m2"),
        )

    # -- inference (Predictor-shaped surface over the union channels) ---------
    def windows_from_recording(self, pkl_path) -> tuple[np.ndarray, np.ndarray]:
        return recording_to_windows(
            pkl_path, list(self.channels), self.normalization,
            self.original_fs, self.target_fs, self.window_sec, self.stride_sec,
        )

    def predict_windows_labeled(self, x: np.ndarray, batch_size: int = 64
                                ) -> tuple[np.ndarray, np.ndarray]:
        """[N, C_union, T] -> (product probs [N, 3], gated labels [N])."""
        n = x.shape[0]
        probs, labels = [], []
        for i in range(0, n, batch_size):
            xb = x[i : i + batch_size]
            pad = batch_size - xb.shape[0]
            if pad:
                xb = np.concatenate(
                    [xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
            p, l = self._predict(
                self.m1.state.params, self.m1.state.batch_stats,
                self.m2.state.params, self.m2.state.batch_stats,
                jnp.asarray(xb))
            probs.append(np.asarray(p)[: batch_size - pad])
            labels.append(np.asarray(l)[: batch_size - pad])
        return np.concatenate(probs), np.concatenate(labels)

    def predict_windows(self, x: np.ndarray, batch_size: int = 64) -> np.ndarray:
        return self.predict_windows_labeled(x, batch_size)[0]

    def predict_recording(self, pkl_path) -> PredictionResult:
        x, starts_sec = self.windows_from_recording(pkl_path)
        probs, labels = self.predict_windows_labeled(x)
        return PredictionResult(
            starts_sec=starts_sec, labels=labels, probs=probs,
            class_names=self.class_names,
        )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", help="one fold's best_model.msgpack")
    p.add_argument("--config", help="the run's config.json")
    p.add_argument("--run-dir",
                   help="run directory (with --fold); replaces "
                        "--checkpoint/--config")
    p.add_argument("--fold", default="all",
                   help="with --run-dir: a subject id, or 'all' for the "
                        "vmapped fold ensemble (default)")
    p.add_argument("--pkl", required=True, help="raw WESAD S*.pkl recording")
    p.add_argument("--out", default=None, help="write JSON here (default stdout)")
    args = p.parse_args(argv)
    if args.run_dir:
        if args.checkpoint or args.config:
            p.error("--run-dir replaces --checkpoint/--config")
        raw = json.loads((Path(args.run_dir) / "config.json").read_text())
        if "m1_channels" in raw:  # hierarchical run: composed two-stage
            if args.fold == "all":
                p.error("hierarchical runs need --fold <subject> "
                        "(per-fold M1+M2 composition)")
            predictor = HierarchicalPredictor.from_run(args.run_dir, args.fold)
        else:
            predictor = EnsemblePredictor.from_run(args.run_dir, args.fold)
    elif args.checkpoint and args.config:
        predictor = Predictor.from_files(args.checkpoint, args.config)
    else:
        p.error("provide --run-dir, or --checkpoint with --config")
    result = predictor.predict_recording(args.pkl)
    text = result.to_json()
    if args.out:
        Path(args.out).write_text(text)
        counts = np.bincount(result.labels, minlength=len(result.class_names))
        print(f"Wrote {len(result.labels)} window predictions to {args.out}")
        for name, c in zip(result.class_names, counts):
            print(f"  {name}: {int(c)}")
    else:
        print(text)


if __name__ == "__main__":
    main()
