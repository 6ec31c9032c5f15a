"""Experiment CLI — the reference's `python main.py` entry point (main.py:70-88)
as a typed-config command line.

Usage:
    python -m multimodalsignal_tpu.main                      # simple LOSO (serial)
    python -m multimodalsignal_tpu.main --execution sharded  # vmapped fold sweep
    python -m multimodalsignal_tpu.main --hierarchical       # two-stage ternary
    python -m multimodalsignal_tpu.main --config cfg.json \
        --set trainer.learning_rate=3e-4 --set channels_to_use=chest_ECG

Creates output/<run_name>/run_<timestamp>/ (reference main.py:73-75), echoes
the config into it, and dispatches to the orchestrators in experiments/.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax

from multimodalsignal_tpu.config import (
    ExperimentConfig,
    HierarchicalConfig,
    apply_overrides,
    config_from_dict,
    load_config_file,
)


def _parse_value(raw: str):
    """Parse a --set value: JSON first, then comma-list, then string."""
    try:
        return json.loads(raw)
    except (json.JSONDecodeError, ValueError):
        if "," in raw:
            return tuple(v.strip() for v in raw.split(",") if v.strip())
        return raw


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--config", type=Path, default=None,
                   help="JSON or YAML config file "
                        "(ExperimentConfig / HierarchicalConfig)")
    p.add_argument("--hierarchical", action="store_true",
                   help="run the two-stage ternary experiment (reference main.py:20)")
    p.add_argument("--execution", choices=("serial", "sharded"), default=None,
                   help="fold execution strategy (overrides config)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="dotted-path config override, e.g. trainer.epochs=50")
    p.add_argument("--output-dir", type=Path, default=None,
                   help="override the run output root")
    p.add_argument("--profile-dir", type=Path, default=None,
                   help="write a jax.profiler device trace of the sharded sweep")
    p.add_argument("--seeds", nargs="+", type=int, default=None,
                   help="seed-replicated sweep: run the full LOSO at each "
                        "seed as ONE sharded program (folds x seeds lanes) "
                        "and report training-noise error bars "
                        "(parallel/replicated_sweep.py; sharded only)")
    p.add_argument("--seed-chunk", type=int, default=None,
                   help="with --seeds: at most this many seed groups per "
                        "launch, run sequentially (bounds HBM working set; "
                        "compiled program reused across launches). Auto-"
                        "halves on RESOURCE_EXHAUSTED either way.")
    p.add_argument("--from-pickles", type=Path, default=None, metavar="WESAD",
                   help="stage straight from the raw WESAD pickles at this "
                        "root: preprocess (resample + window) fuses with the "
                        "corpus pack in memory, skipping the npy round-trip "
                        "(sharded execution only; sets cfg.from_pickles)")
    return p


def load_config(args) -> ExperimentConfig | HierarchicalConfig:
    cls = HierarchicalConfig if args.hierarchical else ExperimentConfig
    if args.config is not None:
        cfg = config_from_dict(cls, load_config_file(args.config))
    else:
        cfg = cls()
    overrides = {}
    for item in args.set:
        key, _, raw = item.partition("=")
        overrides[key.strip()] = _parse_value(raw.strip())
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    if args.from_pickles is not None:
        import dataclasses

        if args.hierarchical:
            cfg = dataclasses.replace(cfg, base=dataclasses.replace(
                cfg.base, from_pickles=str(args.from_pickles)))
        else:
            cfg = dataclasses.replace(cfg, from_pickles=str(args.from_pickles))
    return cfg


def make_run_dir(cfg, output_dir: Path | None) -> Path:
    from multimodalsignal_tpu.utils.run import make_run_dir as _make

    base_cfg = cfg.base if isinstance(cfg, HierarchicalConfig) else cfg
    root = Path(output_dir) if output_dir else Path(base_cfg.output_dir)
    return _make(root, cfg.run_name)


def main(argv=None) -> None:
    from multimodalsignal_tpu.parallel import multihost
    from multimodalsignal_tpu.utils.run import enable_compilation_cache

    # Multi-host entry (SURVEY.md §5 distributed backend): when the launcher
    # sets MMS_COORDINATOR/MMS_NUM_PROCESSES/MMS_PROCESS_ID, join the
    # processes into one JAX runtime BEFORE any backend touch — the fold
    # mesh then spans every host. Set MMS_RUN_ID too so all processes agree
    # on the run directory (only process 0 writes artifacts).
    if multihost.maybe_initialize_from_env():
        print(f"[multihost] process {jax.process_index()}/"
              f"{jax.process_count()} up: {len(jax.local_devices())} local / "
              f"{len(jax.devices())} global devices", flush=True)

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    cfg = load_config(args)
    run_dir = make_run_dir(cfg, args.output_dir)
    if multihost.is_primary():
        print(f"Run directory: {run_dir}")

    if args.hierarchical:
        execution = args.execution or cfg.base.fold_execution
        if args.seeds:
            raise SystemExit(
                "--seeds is not supported with --hierarchical (the "
                "seed-replicated sweep covers the simple LOSO experiment); "
                "it would otherwise be silently ignored."
            )
        if cfg.base.from_pickles and execution != "sharded":
            raise SystemExit(
                "--from-pickles requires --execution sharded (the serial "
                "hierarchical path reads the preprocessed npy contract)"
            )
        if execution == "sharded":
            from multimodalsignal_tpu.parallel.hierarchical_sweep import (
                run_hierarchical_sharded,
            )

            run_hierarchical_sharded(cfg, run_dir)
        else:
            from multimodalsignal_tpu.experiments.hierarchical import (
                run_hierarchical_experiment,
            )

            run_hierarchical_experiment(cfg, run_dir)
        return

    from multimodalsignal_tpu.config import validate_experiment

    execution = args.execution or cfg.fold_execution
    validate_experiment(cfg, fold_execution=execution)
    if args.seeds:
        if execution != "sharded":
            raise SystemExit("--seeds requires --execution sharded "
                             "(the replicated sweep is a sharded program)")
        from multimodalsignal_tpu.parallel.replicated_sweep import (
            run_replicated_experiment,
        )

        run_replicated_experiment(cfg, tuple(args.seeds), run_dir,
                                  seed_chunk=args.seed_chunk)
        return
    if execution == "sharded":
        from multimodalsignal_tpu.parallel.fold_sweep import run_sharded_experiment

        run_sharded_experiment(cfg, run_dir, profile_dir=args.profile_dir)
    else:
        from multimodalsignal_tpu.experiments.loso import run_simple_experiment

        run_simple_experiment(cfg, run_dir)


if __name__ == "__main__":
    main()
