"""Analysis/QA layer: preprocess checker verdicts, feature-importance
ranking, distribution-plot artifacts — over the synthetic fixture."""

import numpy as np
import pytest

from multimodalsignal_tpu.analysis.preprocess_check import PreprocessChecker
from multimodalsignal_tpu.analysis.feature_importance import (
    analyze_feature_importance,
    load_feature_corpus,
)
from multimodalsignal_tpu.analysis.feature_distributions import (
    explore_feature_distributions,
    prepare_dataframe,
)

from tests.test_preprocess import preprocessed  # noqa: F401  (fixture reuse)
from tests.conftest import SUBJECTS_SMALL


def test_checker_passes_on_good_data(preprocessed):  # noqa: F811
    checker = PreprocessChecker(preprocessed, subject_id="S2",
                                classification_mode="stress_binary")
    results = checker.run_all_checks()
    assert results == {"files": True, "shapes": True, "labels": True, "ok": True}


def test_checker_ternary_mode(preprocessed):  # noqa: F811
    results = PreprocessChecker(preprocessed, "S3", "ternary").run_all_checks()
    assert results["ok"]


def test_checker_detects_missing_subject(preprocessed):  # noqa: F811
    results = PreprocessChecker(preprocessed, "S99").run_all_checks()
    assert results == {"files": False, "ok": False}


def test_checker_detects_corruption(preprocessed, tmp_path):  # noqa: F811
    """Tampered labels must fail the label-consistency check
    (reference preprocess_check.py:142-208 semantics)."""
    import shutil

    bad = tmp_path / "data"
    shutil.copytree(preprocessed, bad)
    y_file = bad / "chest_feature" / "S2_y.npy"
    y = np.load(y_file)
    y[0] = 9  # out-of-protocol label
    np.save(y_file, y)
    results = PreprocessChecker(bad, "S2", "ternary").run_all_checks()
    assert not results["ok"]
    assert not results["labels"]


def test_feature_corpus_and_importance(preprocessed, tmp_path):  # noqa: F811
    x, y, names = load_feature_corpus(preprocessed / "chest_feature",
                                      SUBJECTS_SMALL)
    assert x.shape[1] == len(names)
    assert np.isfinite(x).all()
    rankings = analyze_feature_importance(
        preprocessed / "chest_feature", tmp_path, tuple(SUBJECTS_SMALL)
    )
    for key in ("ternary", "amusement"):
        ranking = rankings[key]
        assert len(ranking) == len(names)
        values = [v for _, v in ranking]
        assert values == sorted(values, reverse=True)
        assert all(v >= 0 for v in values)
    assert (tmp_path / "three_class_feature_importance.png").exists()
    assert (tmp_path / "amusement_feature_importance.png").exists()


def test_feature_distributions(preprocessed, tmp_path):  # noqa: F811
    df, names = prepare_dataframe(preprocessed / "chest_feature", SUBJECTS_SMALL)
    assert set(df["label"].unique()) <= {"baseline", "amusement", "stress"}
    top5 = explore_feature_distributions(
        preprocessed / "chest_feature", tmp_path, tuple(SUBJECTS_SMALL)
    )
    assert len(top5) == 5
    for artifact in ("feature_distributions_violin.png", "feature_pairplot.png",
                     "feature_projections.png"):
        assert (tmp_path / artifact).exists()


def test_checker_cli_exit_codes(preprocessed, tmp_path):  # noqa: F811
    """CLI exits 0 on healthy data, 1 on failures (scriptable QA gate)."""
    from multimodalsignal_tpu.analysis.preprocess_check import main

    with pytest.raises(SystemExit) as e:
        main(["--data", str(preprocessed), "--subject", "S2"])
    assert e.value.code == 0
    with pytest.raises(SystemExit) as e:
        main(["--data", str(preprocessed), "--subject", "S99"])
    assert e.value.code == 1
