"""Experiment orchestration (L5): LOSO cross-validation, hierarchical
two-stage classification, and ablation sweeps over channels/models."""

from multimodalsignal_tpu.experiments.splits import FoldSpec, loso_folds
from multimodalsignal_tpu.experiments.loso import (
    FoldResult,
    run_simple_experiment,
    summarize_results,
    write_cv_summary,
)
from multimodalsignal_tpu.experiments.hierarchical import run_hierarchical_experiment
from multimodalsignal_tpu.experiments.predict import Predictor

__all__ = [
    "Predictor",
    "FoldSpec",
    "loso_folds",
    "FoldResult",
    "run_simple_experiment",
    "summarize_results",
    "write_cv_summary",
    "run_hierarchical_experiment",
]
