"""Serial LOSO cross-validation orchestrator.

Parity target: reference main.py:91-156 (`run_simple_experiment`) — per held-out
subject: build train/val/test datasets, train a fresh model with early stopping,
evaluate on the held-out subject, then aggregate mean±std accuracy / weighted F1
into `cv_summary.txt` with a full config echo.

This is the functional-parity serial path (one fold at a time, reference
main.py:98). The TPU-native form — every fold as one vmapped/sharded
computation over a `fold` mesh axis — lives in parallel/fold_sweep.py and is
selected with ExperimentConfig.fold_execution="sharded".
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from multimodalsignal_tpu.config import (
    ExperimentConfig,
    config_to_dict,
    save_config,
    validate_experiment,
)
from multimodalsignal_tpu.data.dataset import (
    build_dataset,
    build_hybrid_dataset,
    experiment_preprocess_meta,
    read_channel_names,
)
from multimodalsignal_tpu.experiments.splits import loso_folds
from multimodalsignal_tpu.models import build_model
from multimodalsignal_tpu.train.trainer import Trainer


@dataclass
class FoldResult:
    subject: str
    accuracy: float
    f1_score: float
    test_loss: float = float("nan")
    best_epoch: int = -1
    epochs_run: int = -1
    wall_s: float = float("nan")


def summarize_results(results: list[FoldResult]) -> dict:
    accs = np.array([r.accuracy for r in results])
    f1s = np.array([r.f1_score for r in results])
    return {
        "mean_accuracy": float(accs.mean()),
        "std_accuracy": float(accs.std()),
        "mean_f1": float(f1s.mean()),
        "std_f1": float(f1s.std()),
        "num_folds": len(results),
    }


def write_cv_summary(path: Path, cfg: ExperimentConfig, results: list[FoldResult]) -> dict:
    """cv_summary.txt with config echo + per-fold table + mean±std
    (reference main.py:131-156 contract, English field names)."""
    summary = summarize_results(results)
    lines = ["Experiment config:"]
    for key, value in config_to_dict(cfg).items():
        lines.append(f"{key}: {value}")
    lines.append("")
    lines.append("Per-fold results:")
    for r in results:
        extra = ""
        if r.epochs_run >= 0:
            extra = f" (epochs: {r.epochs_run}, best: {r.best_epoch}"
            extra += f", test loss: {r.test_loss:.4f}" if np.isfinite(r.test_loss) else ""
            extra += f", {r.wall_s:.1f}s" if np.isfinite(r.wall_s) else ""
            extra += ")"
        lines.append(
            f"  - test {r.subject}: Accuracy = {r.accuracy:.4f}, "
            f"F1-score = {r.f1_score:.4f}{extra}"
        )
    lines.append("")
    lines.append("Final mean performance:")
    lines.append(
        f"Mean accuracy: {summary['mean_accuracy']:.4f} ± {summary['std_accuracy']:.4f}"
    )
    lines.append(
        f"Mean weighted F1: {summary['mean_f1']:.4f} ± {summary['std_f1']:.4f}"
    )
    path.write_text("\n".join(lines) + "\n")
    return summary


def balanced_class_weights(y: np.ndarray, num_classes: int) -> np.ndarray:
    """sklearn compute_class_weight('balanced') semantics: the weighting the
    reference's dead class-weight branch intended (reference trainer.py:80-97;
    the `hasattr` guard at :81 made it unreachable — functional here)."""
    counts = np.bincount(y, minlength=num_classes).astype(np.float64)
    counts = np.maximum(counts, 1.0)
    return (len(y) / (num_classes * counts)).astype(np.float32)


def run_simple_experiment(
    cfg: ExperimentConfig,
    run_output_dir: Path | str,
    all_channel_names: list[str] | None = None,
) -> tuple[list[FoldResult], dict]:
    """Run the full LOSO sweep serially; returns (per-fold results, summary)."""
    run_output_dir = Path(run_output_dir)
    run_output_dir.mkdir(parents=True, exist_ok=True)
    validate_experiment(cfg, fold_execution="serial")
    hybrid = cfg.model.name == "hybrid_cnn_gru"
    raw_path = cfg.raw_align_path if hybrid else cfg.data_path
    save_config(cfg, run_output_dir / "config.json",
                extra={"preprocess_meta": experiment_preprocess_meta(cfg)})
    if all_channel_names is None:
        all_channel_names = read_channel_names(raw_path)

    print("=" * 80)
    print(f"LOSO experiment (mode: {cfg.classification_mode}, "
          f"folds: {len(cfg.subjects)}, execution: serial"
          f"{', hybrid raw+feature' if hybrid else ''})")
    print("=" * 80)

    if hybrid:
        # Raw windows (the raw-align target, padded sample-for-sample to the
        # feature count) fused with handcrafted features — the experiment the
        # reference's dead tuple-batch machinery was built for
        # (void/dataset.py:72-198, trainer.py:130-146).
        def build_one(subjects):
            return build_hybrid_dataset(
                raw_align_path=cfg.raw_align_path,
                feature_path=cfg.feature_path,
                subjects=subjects,
                channels_to_use=list(cfg.channels_to_use),
                all_channel_names=all_channel_names,
                features_to_use=list(cfg.features_to_use) or None,
                classification_mode=cfg.classification_mode,
                normalization=cfg.normalization,
            )
    else:
        def build_one(subjects):
            return build_dataset(
                data_path=cfg.data_path,
                subjects=subjects,
                channels_to_use=list(cfg.channels_to_use),
                all_channel_names=all_channel_names,
                classification_mode=cfg.classification_mode,
                normalization=cfg.normalization,
            )

    # Normalization is strictly per subject (reference dataset.py:37-48), so
    # each subject loads + normalizes ONCE and folds assemble by
    # concatenation — the old per-fold rebuild re-staged every subject ~15x
    # per sweep. Concatenation order matches build_dataset's subject order.
    _cache: dict[str, object] = {}

    def _cached(sid: str):
        if sid not in _cache:
            try:
                _cache[sid] = build_one([sid])
            except ValueError:
                # Only the missing-subject-files case is skippable (the
                # loader warned); configuration errors (bad channel name,
                # unknown scheme) must propagate, not read as "no data".
                if (Path(raw_path) / f"{sid}_X.npy").exists():
                    raise
                _cache[sid] = None
        return _cache[sid]

    def make_ds(subjects):
        parts = [p for p in (_cached(s) for s in subjects) if p is not None]
        if not parts:
            raise ValueError(f"No data loaded for subjects: {subjects}.")
        if len(parts) == 1:
            return parts[0]
        from multimodalsignal_tpu.data.dataset import (
            HybridWindowDataset,
            WindowDataset,
        )

        subs = tuple(s for p in parts for s in p.subjects)
        if hybrid:
            return HybridWindowDataset(
                x_raw=np.concatenate([p.x_raw for p in parts]),
                x_feat=np.concatenate([p.x_feat for p in parts]),
                y=np.concatenate([p.y for p in parts]),
                subjects=subs,
            )
        return WindowDataset(
            x=np.concatenate([p.x for p in parts]),
            y=np.concatenate([p.y for p in parts]),
            subjects=subs,
        )

    results: list[FoldResult] = []
    for fold in loso_folds(cfg.subjects, cfg.val_fraction, cfg.seed):
        t0 = time.time()
        print(f"\n--- Fold: test subject {fold.test_subject} ---")
        fold_dir = run_output_dir / f"fold_test_on_{fold.test_subject}"
        fold_dir.mkdir(parents=True, exist_ok=True)

        train_ds = make_ds(list(fold.train_subjects))
        val_ds = make_ds(list(fold.val_subjects))
        test_ds = make_ds([fold.test_subject])

        class_weights = (
            balanced_class_weights(train_ds.y, cfg.num_classes)
            if cfg.trainer.use_class_weights else None
        )
        model = build_model(cfg.model, cfg.num_classes)
        trainer = Trainer(model, fold_dir, cfg.trainer, cfg.num_classes,
                          seed=cfg.seed, class_weights=class_weights)
        trainer.train(train_ds, val_ds)
        test_loss, test_acc, test_f1 = trainer.evaluate(test_ds, is_test=True)
        results.append(FoldResult(
            subject=fold.test_subject,
            accuracy=test_acc,
            f1_score=test_f1,
            test_loss=test_loss,
            best_epoch=(trainer.history[-1].epoch if trainer.history else -1),
            epochs_run=len(trainer.history),
            wall_s=time.time() - t0,
        ))

    summary = write_cv_summary(run_output_dir / "cv_summary.txt", cfg, results)
    print("\n--- Final mean performance ---")
    print(f"Mean accuracy: {summary['mean_accuracy']:.4f} ± {summary['std_accuracy']:.4f}")
    print(f"Mean weighted F1: {summary['mean_f1']:.4f} ± {summary['std_f1']:.4f}")
    print(f"Summary saved to: {run_output_dir / 'cv_summary.txt'}")
    return results, summary
