"""Typed configuration layer.

The reference configures everything through module-level constants edited
in-file (reference main.py:19-67, preprocess.py:12-28, preprocess_check.py:11-26)
and passes a nested dict to its Trainer (main.py:119-121 -> trainer.py:61-65).
Here those contracts become frozen dataclasses with CLI/YAML overrides and a
config echo serialized into every run directory (preserving the reference's
cv_summary.txt config dump, main.py:131-150).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

ALL_SUBJECTS = tuple(f"S{i}" for i in range(2, 18) if i != 12)

# Chest channel layout written by preprocessing (reference preprocess.py:128-129).
CHEST_SENSORS = ("ACC", "ECG", "EDA", "EMG", "Resp", "Temp")
ALL_CHANNEL_NAMES = tuple(
    [f"chest_ACC_{ax}" for ax in "xyz"]
    + [f"chest_{c}" for c in ("ECG", "EDA", "EMG", "Resp", "Temp")]
)

# Wrist (Empatica E4) channels — an extension beyond the chest-only reference
# code (its README's wrist mentions are drift, SURVEY.md §7 quirk e). Emitted
# after the chest block when PreprocessConfig.include_wrist is set.
WRIST_SENSORS = ("ACC", "BVP", "EDA", "TEMP")
WRIST_CHANNEL_NAMES = tuple(
    [f"wrist_ACC_{ax}" for ax in "xyz"]
    + ["wrist_BVP", "wrist_EDA", "wrist_TEMP"]
)

# Raw WESAD protocol task -> original label (reference preprocess.py:28).
TASK_TO_LABEL_MAP = {"Base": 1, "TSST": 2, "Fun": 3, "Medi1": 4, "Medi2": 4}

# Classification modes (reference dataset.py:29-34 plus the `amusement_binary`
# mode main.py:195 requires but the reference dataset never implemented).
CLASSIFICATION_MODES = ("stress_binary", "ternary", "amusement_binary")


@dataclass(frozen=True)
class PreprocessConfig:
    """Mirrors reference preprocess.py:12-28."""

    wesad_root: str = "./WESAD"
    output_path: str = "./data"
    original_chest_fs: int = 700
    targets: tuple[str, ...] = ("raw", "raw-align", "feature")
    raw_fs: int = 128
    raw_window_sec: int = 60
    raw_stride_sec: int = 10
    feature_fs: int = 128
    feature_window_sec: int = 60
    feature_stride_sec: int = 10
    subjects: tuple[str, ...] = ALL_SUBJECTS
    # Also resample + window the wrist device's channels (each from its own
    # native rate) onto the same grid; channels appended after the chest
    # block. Extension beyond the chest-only reference.
    include_wrist: bool = False

    @property
    def raw_window_samples(self) -> int:
        return self.raw_window_sec * self.raw_fs

    @property
    def raw_stride_samples(self) -> int:
        return self.raw_stride_sec * self.raw_fs


@dataclass(frozen=True)
class ModelConfig:
    """Mirrors reference MODEL_PARAMS (main.py:48-55) + models.py defaults."""

    name: str = "cnn_gru_attention"  # or "cnn_gru" (no channel attention)
    cnn_out_channels: int = 32
    gru_hidden_size: int = 64
    gru_num_layers: int = 2
    dropout: float = 0.5
    reduction_ratio: int = 4  # ChannelAttention squeeze factor (models.py:12)
    # "auto" = fused Pallas kernel on TPU, lax.scan elsewhere.
    gru_impl: str = "auto"  # "auto" | "scan" | "pallas"
    # Prune the final GRU layer's backward-direction walk to a single cell
    # step — exact (the head reads only the last timestep, models.py:79).
    # False reproduces the pre-pruning op schedule bit-for-bit.
    gru_last_prune: bool = True
    dtype: str = "float32"  # compute dtype: "float32" | "bfloat16" (params f32)


@dataclass(frozen=True)
class EarlyStoppingConfig:
    """Mirrors reference trainer.py:12-39 / main.py:120.

    The reference has inverted semantics: its comparison assumes
    higher-is-better (trainer.py:27) but is fed raw val_loss (trainer.py:178),
    so "improvement" means the loss went UP. We default to the fixed
    min-val-loss behaviour; set ``legacy_inverted=True`` to replicate the
    reference bit-for-bit.
    """

    enabled: bool = True
    patience: int = 20
    delta: float = 0.0
    legacy_inverted: bool = False


@dataclass(frozen=True)
class TrainerConfig:
    """Mirrors reference main.py:60-66 + trainer.py:61-77."""

    epochs: int = 100
    batch_size: int = 64
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    early_stopping: EarlyStoppingConfig = field(default_factory=EarlyStoppingConfig)
    # ReduceLROnPlateau (reference trainer.py:72-77, torch defaults).
    lr_plateau_factor: float = 0.1
    lr_plateau_patience: int = 3
    lr_plateau_threshold: float = 1e-4
    use_class_weights: bool = False  # reference's branch is dead code (trainer.py:81)
    # Shuffle training batches each epoch (reference main.py:112 uses
    # DataLoader(shuffle=True)). False fixes the batch order to the dataset
    # order — the controlled setting for composed A/B studies against the
    # reference trainer, where torch's and JAX's shuffle streams cannot be
    # made identical (tests/test_trainer_composed_ab.py). Serial trainer
    # only; the sharded sweep always shuffles in-graph.
    shuffle: bool = True
    # Reference reloads best weights only when early stop fired (trainer.py:185);
    # we always restore the best checkpoint unless this replicates the quirk.
    legacy_restore_only_on_early_stop: bool = False
    # Mid-run resumability (absent in the reference — SURVEY.md §5): write the
    # full (train state, best state, scheduler/early-stop state, epoch) every
    # N epochs; 0 disables. `resume=True` continues from that file if present.
    checkpoint_every: int = 0
    resume: bool = False
    # Rematerialize forward activations in the sweep's backward pass
    # (jax.checkpoint): trades ~1.3x FLOPs for a large activation-memory cut —
    # needed when all folds' train steps run concurrently on one chip.
    remat: bool = True
    # Dropout-mask bit generator: "auto" = TPU hardware PRNG ("rbg") on TPU,
    # threefry elsewhere. Only the dropout stream changes — seeds, init, and
    # shuffling stay threefry — so "threefry" reproduces historical runs
    # bit-for-bit while "rbg" removes the threefry mask-generation cost
    # (154 us of a 1,994 us flagship train step; utils/rng.py).
    dropout_rng: str = "auto"  # "auto" | "threefry" | "rbg"


@dataclass(frozen=True)
class ExperimentConfig:
    """Mirrors reference main.py:19-67."""

    run_name: str = "simple_binary"
    classification_mode: str = "stress_binary"
    num_classes: int = 2
    channels_to_use: tuple[str, ...] = ("chest_ECG", "chest_EDA", "chest_Resp")
    data_path: str = "./data/chest_raw"
    output_dir: str = "./output"
    seed: int = 42
    subjects: tuple[str, ...] = ALL_SUBJECTS
    val_fraction: float = 0.2
    model: ModelConfig = field(default_factory=ModelConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    # Normalization scheme: "all" = per-subject z-score over all windows with
    # EDA log1p (reference dataset.py:37-48); "baseline" = stats from Base-only
    # windows with all-data fallback (reference void/dataset.py:30-55).
    normalization: str = "all"
    # Hybrid (raw + handcrafted feature) experiment surface (reference
    # void/dataset.py:72-198 rebuilt as models/hybrid.py): required when
    # model.name == "hybrid_cnn_gru". raw_align_path points at the
    # chest_raw_align target (windows padded to the feature count),
    # feature_path at chest_feature; features_to_use=() selects all features.
    raw_align_path: str = ""
    feature_path: str = ""
    features_to_use: tuple[str, ...] = ()
    # Stage straight from raw WESAD pickles (path to the WESAD root): the
    # sharded sweep preprocesses each subject in memory (resample + window)
    # and packs the corpus without the intermediate npy round-trip —
    # `data_path` is then ignored. Preprocessing parameters are the
    # PreprocessConfig defaults (700->128 Hz, 60 s / 10 s), wrist channels
    # are included automatically when channels_to_use asks for any wrist_*.
    from_pickles: str = ""
    # Fold execution: "serial" python loop (reference main.py:98) or "sharded"
    # — all folds as one vmapped computation over a `fold` mesh axis.
    fold_execution: str = "sharded"
    # Sharded-sweep dispatch: "per_epoch" jits one all-folds epoch program and
    # loops epochs host-side (short executions, fast compile); "segmented"
    # scans sweep_segment_epochs epochs per device execution (fewer host
    # round-trips, bounded execution length — the whole-sweep-in-one-program
    # "fused" mode was retired after its multi-minute single execution
    # crashed the tunneled runtime, benchmarks/RESULTS.md).
    sweep_dispatch: str = "per_epoch"
    # Epochs per device execution in "segmented" dispatch. Bounds each
    # execution to seconds (runtime-tolerant) while amortizing dispatch.
    sweep_segment_epochs: int = 10

    def __post_init__(self):
        if self.classification_mode not in CLASSIFICATION_MODES:
            raise ValueError(
                f"Unknown classification_mode: {self.classification_mode!r}; "
                f"expected one of {CLASSIFICATION_MODES}"
            )
        # num_classes must match the mode: a mismatch (e.g. --set
        # classification_mode=ternary with the default num_classes=2) would
        # silently clamp label 2 in the loss and drop it from the confusion
        # matrix instead of erroring.
        expected = 3 if self.classification_mode == "ternary" else 2
        if self.num_classes != expected:
            raise ValueError(
                f"num_classes={self.num_classes} inconsistent with "
                f"classification_mode={self.classification_mode!r} "
                f"(expected {expected})"
            )


def validate_experiment(cfg: "ExperimentConfig",
                        fold_execution: str | None = None) -> None:
    """Cross-field checks that span nested configs — these cannot live in
    __post_init__ because dotted overrides apply one dataclasses.replace per
    parent (model.name may legitimately arrive before raw_align_path).
    Called after all overrides are applied (main.py) and at every run entry.

    The hybrid model consumes (raw, feature) pairs; without both paths it
    would crash deep inside the trainer (a raw-only WindowDataset fed to a
    tuple-input model). Fail with guidance instead.
    """
    if cfg.trainer.dropout_rng not in ("auto", "threefry", "rbg"):
        raise ValueError(
            "trainer.dropout_rng must be 'auto', 'threefry', or 'rbg', got "
            f"{cfg.trainer.dropout_rng!r}"
        )
    if cfg.from_pickles:
        effective = fold_execution or cfg.fold_execution
        if effective != "sharded":
            raise ValueError(
                "from_pickles staging is implemented for the sharded sweep "
                "only (--execution sharded); the serial path reads the "
                "preprocessed npy contract. Run the preprocess CLI first "
                "for serial execution."
            )
        if cfg.model.name == "hybrid_cnn_gru":
            raise ValueError(
                "from_pickles staging does not support hybrid_cnn_gru "
                "(the hybrid model needs the offline 'feature' and "
                "'raw-align' preprocess targets); run the preprocess CLI "
                "and set raw_align_path/feature_path instead."
            )
    if cfg.model.name != "hybrid_cnn_gru":
        return
    if not (cfg.raw_align_path and cfg.feature_path):
        raise ValueError(
            "model.name='hybrid_cnn_gru' requires raw_align_path and "
            "feature_path (the preprocess 'raw-align' and 'feature' "
            "targets, e.g. --set raw_align_path=./data/chest_raw_align "
            "--set feature_path=./data/chest_feature)"
        )


@dataclass(frozen=True)
class HierarchicalConfig:
    """Mirrors reference main.py:22-40 (two-stage ternary classifier)."""

    run_name: str = "hierarchical_binary"
    m1_channels: tuple[str, ...] = ("chest_ECG", "chest_EDA", "chest_Resp")
    m1_model: ModelConfig = field(default_factory=ModelConfig)
    m2_channels: tuple[str, ...] = ("chest_ECG", "chest_EDA", "chest_Resp")
    m2_model: ModelConfig = field(
        default_factory=lambda: ModelConfig(gru_hidden_size=32, gru_num_layers=1)
    )
    base: ExperimentConfig = field(default_factory=ExperimentConfig)


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_jsonable(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, Path):
        return str(obj)
    return obj


def config_to_dict(cfg: Any) -> dict:
    return _to_jsonable(cfg)


def save_config(cfg: Any, path: Path | str, extra: dict | None = None) -> None:
    """Serialize a config dataclass to JSON; `extra` merges additional
    top-level keys (e.g. the data's preprocess meta) — unknown keys are
    ignored by config_from_dict, so the file stays round-trippable."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = config_to_dict(cfg)
    if extra:
        data.update({k: v for k, v in extra.items() if v is not None})
    path.write_text(json.dumps(data, indent=2) + "\n")


def load_config_file(path: Path | str) -> dict:
    """Parse a config file into a plain dict: JSON always; YAML (.yaml/.yml)
    when PyYAML is importable (the reference pins PyYAML but never imports it,
    SURVEY.md §5 — here YAML is a first-class config format)."""
    path = Path(path)
    text = path.read_text()
    if path.suffix.lower() in (".yaml", ".yml"):
        try:
            import yaml
        except ImportError as e:
            raise ImportError(
                f"{path} is YAML but PyYAML is not installed; use JSON"
            ) from e
        return yaml.safe_load(text)
    return json.loads(text)


_NESTED = {
    "model": ModelConfig,
    "trainer": TrainerConfig,
    "early_stopping": EarlyStoppingConfig,
    "base": ExperimentConfig,
    "m1_model": ModelConfig,
    "m2_model": ModelConfig,
}


def config_from_dict(cls, data: dict):
    """Rebuild a (possibly nested) config dataclass from a plain dict."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if f.name in _NESTED and isinstance(v, dict):
            v = config_from_dict(_NESTED[f.name], v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def apply_overrides(cfg, overrides: dict[str, Any]):
    """Apply dotted-path overrides, e.g. {"trainer.learning_rate": 3e-4}.

    Overrides sharing a parent are applied in ONE dataclasses.replace so
    co-dependent fields (classification_mode + num_classes) validate together
    rather than through an invalid intermediate config.
    """
    groups: dict[tuple, dict] = {}
    for key, value in overrides.items():
        parts = tuple(key.split("."))
        groups.setdefault(parts[:-1], {})[parts[-1]] = value
    for parent, kv in groups.items():
        cfg = _replace_at(cfg, parent, kv)
    return cfg


def _replace_at(cfg, parent_path: tuple, kv: dict):
    if not parent_path:
        fixed = {}
        for name, value in kv.items():
            current = getattr(cfg, name)
            if isinstance(current, tuple) and isinstance(value, (list, tuple)):
                value = tuple(value)
            elif isinstance(current, tuple) and isinstance(value, str):
                # Single-element override of a tuple field, e.g.
                # --set channels_to_use=chest_ECG (main.py:9's documented
                # syntax): a bare string would iterate per character.
                value = (value,)
            fixed[name] = value
        return dataclasses.replace(cfg, **fixed)
    child = getattr(cfg, parent_path[0])
    return dataclasses.replace(
        cfg, **{parent_path[0]: _replace_at(child, parent_path[1:], kv)}
    )
