"""Data QA + exploratory analysis (L6/L7).

Ports of the reference's manually-run scripts: preprocess output checker
(reference preprocess_check.py), feature-importance ranking
(reference analyze_features.py) and feature-distribution exploration
(reference explore_feature_distributions.py) — host-side tooling, lowest
layer of TPU involvement (SURVEY.md §7 step 8)."""

from multimodalsignal_tpu.analysis.preprocess_check import PreprocessChecker

__all__ = ["PreprocessChecker"]
