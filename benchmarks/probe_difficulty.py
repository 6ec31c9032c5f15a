"""Host-side LOSO difficulty probe for the calibrated-hard synthetic corpus.

Generating a corpus and running the full TPU fold sweep per calibration
iteration is ~10 minutes; this probe instead estimates cross-subject
separability in seconds-to-minutes on the host: per-window summary statistics
(mean/std/quantiles/first-difference std per channel) fed to a LOSO
histogram-gradient-boosting classifier. The deep CnnGruAttention model sees
strictly more (temporal structure: HRV, SCR shapes, respiration rate), so the
sweep typically lands above this floor — calibrate the Hardness knobs so the
probe sits in the high-60s/low-70s, then confirm with the real sweep.

Usage: python benchmarks/probe_difficulty.py --scale 0.5 --seed 3
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodalsignal_tpu.config import (
    ALL_CHANNEL_NAMES,
    ALL_SUBJECTS,
    WRIST_CHANNEL_NAMES,
    PreprocessConfig,
)
from multimodalsignal_tpu.data.dataset import map_labels, normalize_subject
from multimodalsignal_tpu.data.preprocess import preprocess_subject
from multimodalsignal_tpu.data.synthetic import (
    BENCHMARK_HARDNESS,
    BENCHMARK_TASKS,
    Hardness,
    write_synthetic_wesad,
)

FUSION6 = ("chest_ECG", "chest_EDA", "chest_EMG", "chest_Resp",
           "wrist_BVP", "wrist_EDA")


def window_stats(x: np.ndarray) -> np.ndarray:
    """[N, T, C] -> [N, C*6] summary features per channel."""
    feats = [
        x.mean(axis=1),
        x.std(axis=1),
        np.percentile(x, 10, axis=1),
        np.percentile(x, 90, axis=1),
        np.abs(np.diff(x, axis=1)).mean(axis=1),
        np.percentile(x, 50, axis=1),
    ]
    return np.concatenate(feats, axis=1)


def build(scale: float, seed: int, hardness: Hardness, channels, mode: str):
    tasks = tuple((t, d * scale) for t, d in BENCHMARK_TASKS)
    all_names = list(ALL_CHANNEL_NAMES) + list(WRIST_CHANNEL_NAMES)
    ch_idx = [all_names.index(c) for c in channels]
    per_subject = {}
    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp) / "WESAD"
        for sid in ALL_SUBJECTS:
            t0 = time.time()
            write_synthetic_wesad(root, [sid], tasks=tasks,
                                  seed=seed + ALL_SUBJECTS.index(sid),
                                  hardness=hardness)
            cfg = PreprocessConfig(wesad_root=str(root), targets=("raw",),
                                   include_wrist=True, subjects=(sid,))
            out = preprocess_subject(sid, cfg)
            X, y_raw = out["raw"]  # [N, T, 15]
            X = X[:, :, ch_idx]
            Xn = normalize_subject(X, y_raw, list(channels), scheme="all")
            y, keep = map_labels(y_raw, mode)
            y = y[keep]
            per_subject[sid] = (window_stats(Xn[keep]), y)
            print(f"  {sid}: {len(y)} windows  ({time.time() - t0:.1f}s)",
                  flush=True)
    return per_subject


def loso_probe(per_subject: dict) -> list[tuple[str, float]]:
    from sklearn.ensemble import HistGradientBoostingClassifier

    results = []
    sids = list(per_subject)
    for test_sid in sids:
        Xtr = np.concatenate([per_subject[s][0] for s in sids if s != test_sid])
        ytr = np.concatenate([per_subject[s][1] for s in sids if s != test_sid])
        Xte, yte = per_subject[test_sid]
        clf = HistGradientBoostingClassifier(max_iter=150, random_state=0)
        clf.fit(Xtr, ytr)
        acc = float((clf.predict(Xte) == yte).mean())
        results.append((test_sid, acc))
        print(f"  fold {test_sid}: acc {acc:.4f}", flush=True)
    return results


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=0.5,
                   help="task-duration multiplier vs the real protocol")
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--mode", default="stress_binary")
    p.add_argument("--channels", nargs="*", default=list(FUSION6))
    p.add_argument("--set", nargs="*", default=[], metavar="K=V",
                   help="Hardness field overrides, e.g. drift=1.2")
    p.add_argument("--benchmark", action="store_true",
                   help="start from BENCHMARK_HARDNESS (the published corpus "
                        "calibration) instead of Hardness() defaults")
    args = p.parse_args()

    import dataclasses

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = float(v)
    base = BENCHMARK_HARDNESS if args.benchmark else Hardness()
    hardness = dataclasses.replace(base, **overrides)
    print(f"Hardness: {hardness}")

    per_subject = build(args.scale, args.seed, hardness,
                        tuple(args.channels), args.mode)
    results = loso_probe(per_subject)
    accs = np.array([a for _, a in results])
    ys = np.concatenate([per_subject[s][1] for s in per_subject])
    maj = max(np.mean(ys == k) for k in np.unique(ys))
    print(f"\nProbe LOSO accuracy: {accs.mean():.4f} ± {accs.std():.4f} "
          f"(min {accs.min():.4f}, max {accs.max():.4f}); "
          f"majority-class floor {maj:.4f}")


if __name__ == "__main__":
    main()
