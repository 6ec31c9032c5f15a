"""Ablation sweep driver: grid construction, summary artifacts, ranking."""

import json

import pytest

from multimodalsignal_tpu.config import (
    EarlyStoppingConfig,
    ExperimentConfig,
    ModelConfig,
    TrainerConfig,
)
from multimodalsignal_tpu.experiments.ablation import (
    AblationConfig,
    AblationPoint,
    _write_summary,
    run_ablation,
)

from tests.test_preprocess import preprocessed  # noqa: F401  (fixture reuse)
from tests.conftest import SUBJECTS_SMALL


def test_summary_ranking(tmp_path):
    points = [
        AblationPoint("b__cnn_gru", ("chest_ECG",), "cnn_gru", 0.7, 0.1, 0.68, 0.1, 5.0),
        AblationPoint("a__cnn_gru_attention", ("chest_ECG", "chest_EDA"),
                      "cnn_gru_attention", 0.9, 0.05, 0.88, 0.06, 9.0),
    ]
    _write_summary(tmp_path, points)
    text = (tmp_path / "ablation_summary.txt").read_text()
    # Ranked: the higher-accuracy point listed first.
    assert text.index("a__cnn_gru_attention") < text.index("b__cnn_gru")
    data = json.loads((tmp_path / "ablation_results.json").read_text())
    assert len(data) == 2
    assert data[0]["channels"] == ["chest_ECG"]


@pytest.mark.slow
def test_run_ablation_grid(preprocessed, tmp_path):  # noqa: F811
    base = ExperimentConfig(
        data_path=str(preprocessed / "chest_raw"),
        subjects=tuple(SUBJECTS_SMALL[:3]),
        model=ModelConfig(cnn_out_channels=8, gru_hidden_size=8, gru_num_layers=1),
        trainer=TrainerConfig(epochs=1, batch_size=16,
                              early_stopping=EarlyStoppingConfig(patience=3)),
    )
    cfg = AblationConfig(
        base=base,
        channel_subsets={"ecg": ("chest_ECG",)},
        models=("cnn_gru",),
    )
    points = run_ablation(cfg, tmp_path, execution="serial")
    assert len(points) == 1
    p = points[0]
    assert p.name == "ecg__cnn_gru"
    assert 0.0 <= p.mean_accuracy <= 1.0
    assert (tmp_path / "ablation_summary.txt").exists()
    assert (tmp_path / "ecg__cnn_gru" / "cv_summary.txt").exists()


def test_ablation_cli_set_overrides(preprocessed, tmp_path):  # noqa: F811
    """--set dotted overrides reach every grid point's base config (e.g. a
    full-rank attention grid: model.reduction_ratio=1)."""
    import numpy as np

    from multimodalsignal_tpu.experiments import ablation as ab

    base_cfg = {
        "data_path": str(preprocessed / "chest_raw"),
        "subjects": list(SUBJECTS_SMALL),
        "model": {"cnn_out_channels": 4, "gru_hidden_size": 4,
                  "gru_num_layers": 1},
        "trainer": {"epochs": 1, "batch_size": 16,
                    "early_stopping": {"patience": 1}},
    }
    cfg_path = tmp_path / "base.json"
    cfg_path.write_text(json.dumps(base_cfg))
    out = tmp_path / "abl"
    ab.main(["--config", str(cfg_path), "--out", str(out),
             "--execution", "serial", "--models", "cnn_gru_attention",
             "--subsets", "ecg",
             "--set", "model.reduction_ratio=1",
             "--set", "trainer.learning_rate=0.002"])
    run_dir = next(out.glob("run_*"))
    point = json.loads(
        next(run_dir.glob("*/config.json")).read_text())
    assert point["model"]["reduction_ratio"] == 1
    assert np.isclose(point["trainer"]["learning_rate"], 0.002)
