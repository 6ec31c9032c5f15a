"""Channel/model ablation sweep driver.

The reference runs ablations by hand-editing CHANNELS_TO_USE / MODEL_TO_USE
between runs (reference README.md:84-85, main.py:41-55). Here the whole grid
— channel subsets x model families x full LOSOCV — is a first-class driver
(BASELINE.json config 5): every grid point reuses the sharded fold sweep, so
one ablation run is a sequence of single-XLA-program LOSO sweeps, and the
summary table compares configurations the way the reference's README does
(multimodal fusion vs single-channel baselines, README.md:13).

CLI: python -m multimodalsignal_tpu.experiments.ablation \
        --config cfg.json --out ./output
"""

from __future__ import annotations

import argparse
import json
import time
from dataclasses import dataclass, field
from pathlib import Path

from multimodalsignal_tpu.config import (
    ExperimentConfig,
    config_from_dict,
    save_config,
)

# Named channel subsets mirroring the reference's documented ablations
# (README.md:84-85: single channels vs fusion). "fusion6" is the README's
# documented multimodal set (chest ECG/EDA/EMG/Resp + wrist BVP/EDA) — the
# config where ChannelAttention is genuinely active (C >= reduction_ratio;
# at C=3 the gate degenerates to the constant 0.5 quirk, models.py:12-21).
# Wrist subsets need preprocessing with --include-wrist.
DEFAULT_CHANNEL_SUBSETS: dict[str, tuple[str, ...]] = {
    "fusion6": ("chest_ECG", "chest_EDA", "chest_EMG", "chest_Resp",
                "wrist_BVP", "wrist_EDA"),
    "fusion4": ("chest_ECG", "chest_EDA", "chest_EMG", "chest_Resp"),
    "fusion3": ("chest_ECG", "chest_EDA", "chest_Resp"),
    "ecg": ("chest_ECG",),
    "eda": ("chest_EDA",),
    "resp": ("chest_Resp",),
    "wrist2": ("wrist_BVP", "wrist_EDA"),
}
DEFAULT_MODELS = ("cnn_gru_attention", "cnn_gru")


@dataclass
class AblationPoint:
    name: str
    channels: tuple[str, ...]
    model_name: str
    mean_accuracy: float = float("nan")
    std_accuracy: float = float("nan")
    mean_f1: float = float("nan")
    std_f1: float = float("nan")
    wall_s: float = float("nan")


@dataclass
class AblationConfig:
    base: ExperimentConfig = field(default_factory=ExperimentConfig)
    channel_subsets: dict[str, tuple[str, ...]] = field(
        default_factory=lambda: dict(DEFAULT_CHANNEL_SUBSETS)
    )
    models: tuple[str, ...] = DEFAULT_MODELS


def run_ablation(
    cfg: AblationConfig,
    run_output_dir: Path | str,
    all_channel_names: list[str] | None = None,
    execution: str = "sharded",
) -> list[AblationPoint]:
    """Run the full grid; per-point artifacts in <run>/<subset>__<model>/,
    cross-point comparison in ablation_summary.txt + ablation_results.json."""
    run_output_dir = Path(run_output_dir)
    run_output_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg.base, run_output_dir / "base_config.json")

    import dataclasses as dc

    points: list[AblationPoint] = []
    for subset_name, channels in cfg.channel_subsets.items():
        for model_name in cfg.models:
            point_name = f"{subset_name}__{model_name}"
            print("\n" + "#" * 80)
            print(f"Ablation point: {point_name} (channels={list(channels)})")
            print("#" * 80)
            point_cfg = dc.replace(
                cfg.base,
                run_name=point_name,
                channels_to_use=tuple(channels),
                model=dc.replace(cfg.base.model, name=model_name),
            )
            point_dir = run_output_dir / point_name
            t0 = time.time()
            if execution == "sharded":
                from multimodalsignal_tpu.parallel.fold_sweep import (
                    run_sharded_experiment,
                )

                _, summary = run_sharded_experiment(
                    point_cfg, point_dir, all_channel_names
                )
            else:
                from multimodalsignal_tpu.experiments.loso import (
                    run_simple_experiment,
                )

                _, summary = run_simple_experiment(
                    point_cfg, point_dir, all_channel_names
                )
            points.append(AblationPoint(
                name=point_name,
                channels=tuple(channels),
                model_name=model_name,
                mean_accuracy=summary["mean_accuracy"],
                std_accuracy=summary["std_accuracy"],
                mean_f1=summary["mean_f1"],
                std_f1=summary["std_f1"],
                wall_s=time.time() - t0,
            ))

    _write_summary(run_output_dir, points)
    return points


def _write_summary(run_dir: Path, points: list[AblationPoint]) -> None:
    ranked = sorted(points, key=lambda p: -p.mean_accuracy)
    lines = [
        "Ablation sweep summary (ranked by mean LOSO accuracy)",
        "",
        f"{'point':<32} {'accuracy':>18} {'weighted F1':>18} {'wall s':>8}",
        "-" * 80,
    ]
    for p in ranked:
        lines.append(
            f"{p.name:<32} {p.mean_accuracy:>8.4f} ± {p.std_accuracy:<7.4f} "
            f"{p.mean_f1:>8.4f} ± {p.std_f1:<7.4f} {p.wall_s:>8.1f}"
        )
    (run_dir / "ablation_summary.txt").write_text("\n".join(lines) + "\n")
    (run_dir / "ablation_results.json").write_text(json.dumps(
        [{
            "name": p.name, "channels": list(p.channels), "model": p.model_name,
            "mean_accuracy": p.mean_accuracy, "std_accuracy": p.std_accuracy,
            "mean_f1": p.mean_f1, "std_f1": p.std_f1, "wall_s": p.wall_s,
        } for p in points], indent=2) + "\n")
    print("\n" + "\n".join(lines))
    print(f"\nAblation summary saved to: {run_dir / 'ablation_summary.txt'}")


def main(argv=None) -> None:
    from multimodalsignal_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=Path, default=None,
                   help="JSON for the base ExperimentConfig")
    p.add_argument("--out", type=Path, default=Path("./output/ablation"))
    p.add_argument("--execution", choices=("serial", "sharded"), default="sharded")
    p.add_argument("--models", nargs="*", default=list(DEFAULT_MODELS))
    p.add_argument("--subsets", nargs="*", default=list(DEFAULT_CHANNEL_SUBSETS),
                   help=f"named subsets from {list(DEFAULT_CHANNEL_SUBSETS)}")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="dotted-path override on the BASE config applied to "
                        "every grid point (main.py semantics), e.g. "
                        "model.reduction_ratio=1 trainer.epochs=50")
    args = p.parse_args(argv)
    base = (config_from_dict(ExperimentConfig, json.loads(args.config.read_text()))
            if args.config else ExperimentConfig())
    if args.set:
        from multimodalsignal_tpu.config import apply_overrides
        from multimodalsignal_tpu.main import _parse_value

        base = apply_overrides(base, {
            k.strip(): _parse_value(v.strip())
            for k, _, v in (item.partition("=") for item in args.set)
        })
    cfg = AblationConfig(
        base=base,
        channel_subsets={k: DEFAULT_CHANNEL_SUBSETS[k] for k in args.subsets},
        models=tuple(args.models),
    )
    run_dir = args.out / f"run_{time.strftime('%Y%m%d_%H%M%S')}"
    run_ablation(cfg, run_dir, execution=args.execution)


if __name__ == "__main__":
    main()
