"""L5 orchestration: LOSO splits (sklearn parity), serial experiment,
hierarchical two-stage path, CLI config plumbing — end-to-end on the
synthetic WESAD fixture."""

import json

import numpy as np
import pytest

from multimodalsignal_tpu.config import (
    EarlyStoppingConfig,
    ExperimentConfig,
    HierarchicalConfig,
    ModelConfig,
    TrainerConfig,
)
from multimodalsignal_tpu.experiments.splits import (
    _numpy_train_val_split,
    loso_folds,
    train_val_split,
)

from tests.test_preprocess import preprocessed  # noqa: F401  (fixture reuse)
from tests.conftest import SUBJECTS_SMALL

TINY_MODEL = ModelConfig(cnn_out_channels=8, gru_hidden_size=8, gru_num_layers=1)
TINY_TRAINER = TrainerConfig(
    epochs=3, batch_size=16, learning_rate=3e-3,
    early_stopping=EarlyStoppingConfig(patience=5),
)


def _tiny_cfg(preprocessed, **kw):
    defaults = dict(
        data_path=str(preprocessed / "chest_raw"),
        subjects=tuple(SUBJECTS_SMALL[:3]),
        channels_to_use=("chest_ECG", "chest_EDA", "chest_Resp"),
        model=TINY_MODEL,
        trainer=TINY_TRAINER,
    )
    defaults.update(kw)
    return ExperimentConfig(**defaults)


# ---------------------------------------------------------------------------
# Splits
# ---------------------------------------------------------------------------

def test_numpy_split_matches_sklearn():
    """The no-sklearn fallback must reproduce train_test_split exactly
    (reference main.py:103 seeds fold membership)."""
    from sklearn.model_selection import train_test_split

    subjects = [f"S{i}" for i in range(2, 18) if i != 12]
    for seed in (0, 42, 7):
        exp_train, exp_val = train_test_split(subjects, test_size=0.2, random_state=seed)
        got_train, got_val = _numpy_train_val_split(subjects, 0.2, seed)
        assert got_train == list(exp_train)
        assert got_val == list(exp_val)


def test_loso_folds_structure():
    subjects = [f"S{i}" for i in range(2, 18) if i != 12]
    folds = loso_folds(subjects, 0.2, 42)
    assert len(folds) == 15
    for fold in folds:
        members = set(fold.train_subjects) | set(fold.val_subjects)
        assert fold.test_subject not in members
        assert members | {fold.test_subject} == set(subjects)
        # 14 remaining, 20% val -> ceil = 3 val, 11 train (sklearn semantics)
        assert len(fold.val_subjects) == 3
        assert len(fold.train_subjects) == 11
    # Same seed -> same splits across folds with equal remaining sets
    f2 = loso_folds(subjects, 0.2, 42)
    assert folds == f2


def test_train_val_split_is_sklearn_when_available():
    subjects = list("abcdefghij")
    tr, va = train_val_split(subjects, 0.2, 42)
    assert sorted(tr + va) == sorted(subjects)
    assert len(va) == 2


# ---------------------------------------------------------------------------
# Serial LOSO end-to-end
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def serial_run(preprocessed, tmp_path_factory):  # noqa: F811
    from multimodalsignal_tpu.experiments.loso import run_simple_experiment

    run_dir = tmp_path_factory.mktemp("run_serial")
    cfg = _tiny_cfg(preprocessed)
    results, summary = run_simple_experiment(cfg, run_dir)
    return cfg, run_dir, results, summary


@pytest.mark.slow
def test_serial_experiment_artifacts(serial_run):
    cfg, run_dir, results, summary = serial_run
    assert len(results) == 3
    assert (run_dir / "cv_summary.txt").exists()
    assert (run_dir / "config.json").exists()
    for r in results:
        fold_dir = run_dir / f"fold_test_on_{r.subject}"
        assert (fold_dir / "training_log.txt").exists()
        assert (fold_dir / "test_confusion_matrix.png").exists()
        assert 0.0 <= r.accuracy <= 1.0
        assert 0.0 <= r.f1_score <= 1.0
    text = (run_dir / "cv_summary.txt").read_text()
    assert "Mean accuracy" in text and "classification_mode" in text
    assert summary["num_folds"] == 3
    assert summary["mean_accuracy"] == pytest.approx(
        np.mean([r.accuracy for r in results])
    )


# ---------------------------------------------------------------------------
# Hierarchical end-to-end
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_hierarchical_experiment(preprocessed, tmp_path):  # noqa: F811
    from multimodalsignal_tpu.experiments.hierarchical import (
        run_hierarchical_experiment,
    )

    base = _tiny_cfg(preprocessed, subjects=tuple(SUBJECTS_SMALL[:3]))
    cfg = HierarchicalConfig(
        m1_channels=("chest_ECG", "chest_EDA"),
        m1_model=TINY_MODEL,
        m2_channels=("chest_EDA", "chest_Resp"),
        m2_model=TINY_MODEL,
        base=base,
    )
    results, summary = run_hierarchical_experiment(cfg, tmp_path)
    assert summary["num_folds"] == 3
    assert 0.0 <= summary["overall_accuracy"] <= 1.0
    text = (tmp_path / "hierarchical_summary.txt").read_text()
    assert "confusion matrix" in text.lower()
    for r in results:
        fold_dir = tmp_path / f"fold_test_on_{r.subject}"
        assert (fold_dir / "model_m1" / "training_log.txt").exists()
        assert (fold_dir / "model_m2" / "training_log.txt").exists()
        # Composed predictions are ternary
        assert r.num_test_windows > 0


# ---------------------------------------------------------------------------
# CLI plumbing
# ---------------------------------------------------------------------------

def test_cli_config_loading(tmp_path):
    from multimodalsignal_tpu.main import build_parser, load_config

    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(json.dumps({
        "run_name": "from_file",
        "trainer": {"epochs": 7},
    }))
    args = build_parser().parse_args([
        "--config", str(cfg_file),
        "--set", "trainer.learning_rate=0.01",
        "--set", "channels_to_use=chest_ECG,chest_EDA",
        "--set", "num_classes=3",
        "--set", "classification_mode=ternary",
    ])
    cfg = load_config(args)
    assert cfg.run_name == "from_file"
    assert cfg.trainer.epochs == 7
    assert cfg.trainer.learning_rate == 0.01
    assert cfg.channels_to_use == ("chest_ECG", "chest_EDA")
    assert cfg.num_classes == 3
    assert cfg.classification_mode == "ternary"


def test_config_rejects_mode_class_mismatch():
    """classification_mode=ternary with num_classes=2 would silently clamp
    label 2 in the loss; it must error at construction instead."""
    import pytest

    from multimodalsignal_tpu.config import ExperimentConfig

    with pytest.raises(ValueError, match="num_classes"):
        ExperimentConfig(classification_mode="ternary")  # default num_classes=2
    with pytest.raises(ValueError, match="num_classes"):
        ExperimentConfig(classification_mode="stress_binary", num_classes=3)
    ExperimentConfig(classification_mode="ternary", num_classes=3)  # ok


def test_yaml_config_loading(tmp_path):
    from multimodalsignal_tpu.main import build_parser, load_config

    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(
        "run_name: from_yaml\n"
        "trainer:\n"
        "  epochs: 9\n"
        "channels_to_use: [chest_ECG]\n"
    )
    args = build_parser().parse_args(["--config", str(cfg_file)])
    cfg = load_config(args)
    assert cfg.run_name == "from_yaml"
    assert cfg.trainer.epochs == 9
    assert cfg.channels_to_use == ("chest_ECG",)


@pytest.mark.slow
def test_cli_end_to_end(preprocessed, tmp_path):  # noqa: F811
    """`python -m multimodalsignal_tpu.main` equivalent run, serial path."""
    from multimodalsignal_tpu.main import main

    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(json.dumps({
        "data_path": str(preprocessed / "chest_raw"),
        "subjects": list(SUBJECTS_SMALL[:3]),
        "model": {"cnn_out_channels": 8, "gru_hidden_size": 8, "gru_num_layers": 1},
        "trainer": {"epochs": 2, "batch_size": 16},
        "fold_execution": "serial",
    }))
    main(["--config", str(cfg_file), "--output-dir", str(tmp_path / "out")])
    runs = list((tmp_path / "out" / "simple_binary").glob("run_*"))
    assert len(runs) == 1
    assert (runs[0] / "cv_summary.txt").exists()


def test_balanced_class_weights_matches_sklearn():
    from sklearn.utils.class_weight import compute_class_weight

    from multimodalsignal_tpu.experiments.loso import balanced_class_weights

    y = np.array([0] * 30 + [1] * 10)
    got = balanced_class_weights(y, 2)
    want = compute_class_weight("balanced", classes=np.array([0, 1]), y=y)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)


def test_single_element_tuple_override():
    """--set channels_to_use=chest_ECG (main.py's documented single-channel
    syntax) must become a 1-tuple, not a string that iterates per character."""
    from multimodalsignal_tpu.config import ExperimentConfig, apply_overrides
    from multimodalsignal_tpu.main import _parse_value

    cfg = apply_overrides(
        ExperimentConfig(),
        {"channels_to_use": _parse_value("chest_ECG"),
         "subjects": _parse_value("S2,S3")},
    )
    assert cfg.channels_to_use == ("chest_ECG",)
    assert cfg.subjects == ("S2", "S3")
