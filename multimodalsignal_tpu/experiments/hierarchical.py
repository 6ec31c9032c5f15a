"""Hierarchical two-stage ternary classification.

Parity target: reference main.py:159-247 (`run_hierarchical_experiment`):
per LOSO fold train M1 (stress vs non-stress, mode `stress_binary`) and M2
(amusement vs baseline, mode `amusement_binary`), evaluate M1 alone on the
held-out subject, then compose ternary predictions on the union-channel test
set: final = Stress(2) where M1 predicts stress, else M2's Fun(1)/Base(0).

Deliberate fixes over the reference (documented in SURVEY.md §7):
  * `amusement_binary` is a real dataset mode here (the reference's
    dataset.py:34 raises on it, so this path crashed as shipped).
  * The union channel list is ORDER-PRESERVING (the reference uses
    `list(set(...))` at main.py:222 — nondeterministic channel order).
  * A final summary (overall composed accuracy/F1 + per-fold table) is
    written; the reference accumulates predictions but writes nothing
    (main.py:245-247).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodalsignal_tpu.config import HierarchicalConfig, save_config
from multimodalsignal_tpu.data.dataset import build_dataset, read_channel_names
from multimodalsignal_tpu.experiments.splits import loso_folds
from multimodalsignal_tpu.models import build_model
from multimodalsignal_tpu.train import metrics as M
from multimodalsignal_tpu.train.trainer import Trainer


@dataclass
class HierarchicalFoldResult:
    subject: str
    m1_accuracy: float
    m1_f1: float
    composed_accuracy: float
    composed_f1: float
    num_test_windows: int
    wall_s: float


def _ordered_union(a: tuple[str, ...], b: tuple[str, ...]) -> list[str]:
    seen = dict.fromkeys(a)
    seen.update(dict.fromkeys(b))
    return list(seen)


def make_composed_predict(model_m1, model_m2, m1_idx, m2_idx):
    """Jitted composed ternary inference over the union-channel batch:
    slice each model's channel subset, argmax both, gate M2 by M1
    (reference main.py:237-244) — one fused device computation instead of
    the reference's per-batch Python list comprehension."""

    m1_idx = jnp.asarray(m1_idx, jnp.int32)
    m2_idx = jnp.asarray(m2_idx, jnp.int32)

    @jax.jit
    def predict(vars_m1, vars_m2, x_full):
        x1 = jnp.take(x_full, m1_idx, axis=1)
        x2 = jnp.take(x_full, m2_idx, axis=1)
        p1 = jnp.argmax(model_m1.apply(vars_m1, x1, train=False), axis=-1)
        p2 = jnp.argmax(model_m2.apply(vars_m2, x2, train=False), axis=-1)
        return jnp.where(p1 == 1, 2, p2)

    return predict


def run_hierarchical_experiment(
    cfg: HierarchicalConfig,
    run_output_dir: Path | str,
    all_channel_names: list[str] | None = None,
) -> tuple[list[HierarchicalFoldResult], dict]:
    base = cfg.base
    run_output_dir = Path(run_output_dir)
    run_output_dir.mkdir(parents=True, exist_ok=True)
    from multimodalsignal_tpu.data.dataset import read_preprocess_meta

    save_config(cfg, run_output_dir / "config.json",
                extra={"preprocess_meta": read_preprocess_meta(base.data_path)})
    if all_channel_names is None:
        all_channel_names = read_channel_names(base.data_path)

    print("=" * 80)
    print("Hierarchical two-stage experiment (M1 stress | M2 amusement)")
    print("=" * 80)

    union_channels = _ordered_union(cfg.m1_channels, cfg.m2_channels)
    m1_idx = [union_channels.index(ch) for ch in cfg.m1_channels]
    m2_idx = [union_channels.index(ch) for ch in cfg.m2_channels]

    results: list[HierarchicalFoldResult] = []
    all_preds: list[np.ndarray] = []
    all_true: list[np.ndarray] = []

    for fold in loso_folds(base.subjects, base.val_fraction, base.seed):
        t0 = time.time()
        print(f"\n--- Fold: test subject {fold.test_subject} ---")
        fold_dir = run_output_dir / f"fold_test_on_{fold.test_subject}"

        def _ds(subjects, channels, mode):
            return build_dataset(
                data_path=base.data_path,
                subjects=list(subjects),
                channels_to_use=list(channels),
                all_channel_names=all_channel_names,
                classification_mode=mode,
                normalization=base.normalization,
            )

        # Stage 1: M1 stress vs non-stress (reference main.py:177-190).
        print("--- Stage 1: train stress vs non-stress classifier (M1) ---")
        m1_train = _ds(fold.train_subjects, cfg.m1_channels, "stress_binary")
        m1_val = _ds(fold.val_subjects, cfg.m1_channels, "stress_binary")
        model_m1 = build_model(cfg.m1_model, num_classes=2)
        trainer_m1 = Trainer(model_m1, fold_dir / "model_m1", base.trainer,
                             num_classes=2, seed=base.seed)
        trainer_m1.train(m1_train, m1_val)

        # Stage 2: M2 amusement vs baseline (reference main.py:192-208).
        print("--- Stage 2: train amusement vs baseline classifier (M2) ---")
        m2_train = _ds(fold.train_subjects, cfg.m2_channels, "amusement_binary")
        m2_val = _ds(fold.val_subjects, cfg.m2_channels, "amusement_binary")
        if len(m2_train) == 0 or len(m2_val) == 0:
            print("Warning: no amusement_binary data for this fold; skipping.")
            continue
        model_m2 = build_model(cfg.m2_model, num_classes=2)
        trainer_m2 = Trainer(model_m2, fold_dir / "model_m2", base.trainer,
                             num_classes=2, seed=base.seed)
        trainer_m2.train(m2_train, m2_val)

        # Stage 3.1: M1 alone on the held-out subject (reference main.py:211-216).
        m1_test = _ds([fold.test_subject], cfg.m1_channels, "stress_binary")
        _, m1_acc, m1_f1 = trainer_m1.evaluate(m1_test, is_test=True)
        print(f"M1 on {fold.test_subject}: acc = {m1_acc:.4f}, F1 = {m1_f1:.4f}")

        # Stage 3.2: composed ternary inference (reference main.py:218-244).
        test_ternary = _ds([fold.test_subject], union_channels, "ternary")
        if len(test_ternary) == 0:
            print(f"Warning: no ternary test data for {fold.test_subject}.")
            continue
        predict = make_composed_predict(model_m1, model_m2, m1_idx, m2_idx)
        vars_m1 = {"params": trainer_m1.state.params,
                   "batch_stats": trainer_m1.state.batch_stats}
        vars_m2 = {"params": trainer_m2.state.params,
                   "batch_stats": trainer_m2.state.batch_stats}
        preds = np.asarray(predict(vars_m1, vars_m2, jnp.asarray(test_ternary.x)))
        true = test_ternary.y

        cm = M.confusion_matrix(jnp.asarray(true), jnp.asarray(preds), 3)
        comp_acc = float(M.accuracy_from_cm(cm))
        comp_f1 = float(M.weighted_f1_from_cm(cm))
        print(f"Composed ternary on {fold.test_subject}: "
              f"acc = {comp_acc:.4f}, F1 = {comp_f1:.4f}")
        all_preds.append(preds)
        all_true.append(true)
        results.append(HierarchicalFoldResult(
            subject=fold.test_subject,
            m1_accuracy=m1_acc, m1_f1=m1_f1,
            composed_accuracy=comp_acc, composed_f1=comp_f1,
            num_test_windows=len(true), wall_s=time.time() - t0,
        ))

    summary = _write_summary(run_output_dir, results, all_preds, all_true)
    return results, summary


def _write_summary(run_dir: Path, results, all_preds, all_true) -> dict:
    """Overall (micro, window-level) + per-fold (macro) composed metrics."""
    if not results:
        summary = {"num_folds": 0}
        (run_dir / "hierarchical_summary.txt").write_text("No folds completed.\n")
        return summary
    preds = jnp.asarray(np.concatenate(all_preds))
    true = jnp.asarray(np.concatenate(all_true))
    cm = M.confusion_matrix(true, preds, 3)
    summary = {
        "num_folds": len(results),
        "overall_accuracy": float(M.accuracy_from_cm(cm)),
        "overall_f1": float(M.weighted_f1_from_cm(cm)),
        "mean_m1_accuracy": float(np.mean([r.m1_accuracy for r in results])),
        "mean_composed_accuracy": float(np.mean([r.composed_accuracy for r in results])),
        "std_composed_accuracy": float(np.std([r.composed_accuracy for r in results])),
        "mean_composed_f1": float(np.mean([r.composed_f1 for r in results])),
    }
    lines = ["Hierarchical experiment summary", "", "Per-fold results:"]
    for r in results:
        lines.append(
            f"  - test {r.subject}: M1 acc = {r.m1_accuracy:.4f} | "
            f"composed acc = {r.composed_accuracy:.4f}, F1 = {r.composed_f1:.4f} "
            f"({r.num_test_windows} windows)"
        )
    lines += [
        "",
        f"Overall window-level accuracy: {summary['overall_accuracy']:.4f}",
        f"Overall window-level weighted F1: {summary['overall_f1']:.4f}",
        f"Mean composed accuracy: {summary['mean_composed_accuracy']:.4f} "
        f"± {summary['std_composed_accuracy']:.4f}",
        "",
        "Overall confusion matrix (rows=true, cols=pred; "
        "0=Base, 1=Fun, 2=Stress):",
        str(np.asarray(cm, dtype=int)),
    ]
    (run_dir / "hierarchical_summary.txt").write_text("\n".join(lines) + "\n")
    print(f"\nHierarchical summary saved to: {run_dir / 'hierarchical_summary.txt'}")
    return summary
