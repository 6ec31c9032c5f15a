"""Does the fold ensemble beat single-fold models on UNSEEN subjects?

LOSO cross-validation produces 15 models and the reference ships none
(SURVEY.md §1). `EnsemblePredictor` makes the cross-validated ensemble
deployable; this experiment measures what that buys where it matters — on
subjects NO fold ever saw:

  1. synthesize fresh benchmark-distribution subjects (BENCHMARK_HARDNESS,
     BENCHMARK_TASKS, a seed range disjoint from the training corpus's
     seed 3 + i),
  2. preprocess them exactly like the corpus (chest + wrist),
  3. evaluate every fold checkpoint AND the mean-probability ensemble on
     each new subject's windows (one vmapped forward computes all folds).

Usage:
    python benchmarks/ensemble_eval.py \
        --run-dir /tmp/bench3/output/e2e_r3f/run_... \
        [--out-root /tmp/ens_eval] [--n-subjects 4] [--seed 200]

Prints one JSON line per subject plus an aggregate line.
"""

from __future__ import annotations

import argparse
import functools
import json
from pathlib import Path

import numpy as np

print = functools.partial(print, flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", required=True)
    p.add_argument("--out-root", default="/tmp/ens_eval")
    p.add_argument("--n-subjects", type=int, default=4)
    p.add_argument("--seed", type=int, default=200,
                   help="first per-subject seed; training corpus used 3..17")
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodalsignal_tpu.data.dataset import build_dataset, read_channel_names
    from multimodalsignal_tpu.data.preprocess import (
        PreprocessConfig,
        run_preprocessing,
    )
    from multimodalsignal_tpu.data.synthetic import (
        BENCHMARK_HARDNESS,
        BENCHMARK_TASKS,
        write_synthetic_wesad,
    )
    from multimodalsignal_tpu.experiments.predict import EnsemblePredictor

    out_root = Path(args.out_root)
    subjects = [f"S{18 + i}" for i in range(args.n_subjects)]

    # -- 1+2: fresh subjects, preprocessed like the training corpus ----------
    if not all((out_root / "data" / "chest_raw" / f"{s}_X.npy").exists()
               for s in subjects):
        print(f"# synthesizing {subjects} (seeds {args.seed}.."
              f"{args.seed + args.n_subjects - 1}) + preprocessing ...")
        write_synthetic_wesad(out_root / "WESAD", subjects,
                              tasks=BENCHMARK_TASKS, seed=args.seed,
                              hardness=BENCHMARK_HARDNESS)
        run_preprocessing(PreprocessConfig(
            wesad_root=str(out_root / "WESAD"),
            output_path=str(out_root / "data"),
            subjects=tuple(subjects), include_wrist=True,
        ))

    # -- 3: all folds + ensemble in one vmapped forward ----------------------
    ens = EnsemblePredictor.from_run(args.run_dir)
    cfg = ens.cfg
    names = read_channel_names(out_root / "data" / "chest_raw")

    @jax.jit
    def fold_probs(params, batch_stats, x):
        def one_fold(p, bs):
            logits = ens.model.apply(
                {"params": p, "batch_stats": bs}, x, train=False)
            return jax.nn.softmax(logits, axis=-1)

        return jax.vmap(one_fold)(params, batch_stats)  # [F, B, K]

    n_folds = len(ens.fold_names)
    rows = []
    for sid in subjects:
        ds = build_dataset(
            data_path=out_root / "data" / "chest_raw", subjects=[sid],
            channels_to_use=list(cfg.channels_to_use),
            all_channel_names=names,
            classification_mode=cfg.classification_mode,
            normalization=cfg.normalization,
        )
        x, y = ds.x, np.asarray(ds.y)
        probs = []
        for i in range(0, len(x), args.batch):
            xb = x[i : i + args.batch]
            pad = args.batch - len(xb)
            if pad:
                xb = np.concatenate(
                    [xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
            pb = fold_probs(ens.state.params, ens.state.batch_stats,
                            jnp.asarray(xb))
            probs.append(np.asarray(pb)[:, : args.batch - pad])
        probs = np.concatenate(probs, axis=1)           # [F, N, K]
        fold_acc = (probs.argmax(-1) == y[None]).mean(axis=1)   # [F]
        ens_acc = float((probs.mean(axis=0).argmax(-1) == y).mean())
        majority = float(max(np.bincount(y)) / len(y))
        rows.append({
            "subject": sid, "windows": int(len(y)),
            "majority_floor": round(majority, 4),
            "fold_acc_mean": round(float(fold_acc.mean()), 4),
            "fold_acc_std": round(float(fold_acc.std()), 4),
            "fold_acc_min": round(float(fold_acc.min()), 4),
            "fold_acc_max": round(float(fold_acc.max()), 4),
            "ensemble_acc": round(ens_acc, 4),
            "folds_beaten_by_ensemble": int((ens_acc > fold_acc).sum()),
            "n_folds": n_folds,
        })
        print(json.dumps(rows[-1]))

    total_w = sum(r["windows"] for r in rows)

    def wmean(key):
        return sum(r[key] * r["windows"] for r in rows) / total_w

    print(json.dumps({
        "subject": "ALL (window-weighted)", "windows": total_w,
        "majority_floor": round(wmean("majority_floor"), 4),
        "fold_acc_mean": round(wmean("fold_acc_mean"), 4),
        "fold_acc_min": round(wmean("fold_acc_min"), 4),
        "fold_acc_max": round(wmean("fold_acc_max"), 4),
        "ensemble_acc": round(wmean("ensemble_acc"), 4),
    }))


if __name__ == "__main__":
    main()
