"""Seed-replicated LOSO sweep: folds x seeds as one sharded computation.

The reference reports a single LOSO run at one global seed (reference
main.py:60 SEED=42, main.py:71-72) — its headline 82.44% carries no error bar
over training stochasticity (init + shuffle + dropout). Here the cross
product {LOSO folds} x {seeds} runs as ONE vmapped/sharded program: the fold
axis of the existing sweep (fold_sweep.py) is tiled with S copies of the fold
batch, and each copy gets the PRNG streams of a plain run at that seed —
so every seed group is bit-identical to the corresponding single-seed sweep
(pinned by tests/test_fold_sweep.py::test_replicated_sweep_matches_single_seed_runs).

This is also the scaling story past 15 folds: a v4-32 has more chips than
LOSO folds, and the seed axis multiplies independent lanes (15 folds x 4
seeds = 60 lanes) with zero cross-lane communication until the final metric
gather.

Subject splits stay FIXED across seeds (the sklearn-parity seed-42 split,
experiments/splits.py): the replication isolates *training* noise, which is
the error bar a claimed accuracy difference between model variants must
clear.

CLI::

    python -m multimodalsignal_tpu.main --execution sharded --seeds 42 43 44
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import numpy as np
from jax.sharding import Mesh

from multimodalsignal_tpu.config import ExperimentConfig
from multimodalsignal_tpu.parallel import multihost
from multimodalsignal_tpu.parallel.fold_sweep import (
    FoldBatch,
    build_fold_batch,
    run_fold_sweep,
    stage_corpus,
)
from multimodalsignal_tpu.train import metrics as M


def replicate_fold_batch(fb: FoldBatch, num_seeds: int) -> FoldBatch:
    """Tile every fold-axis array S times: lane s*Fp+f is fold f under seed
    group s. The index pools are seed-invariant (splits are fixed); only the
    RNG streams differ per group (run_fold_sweep's `seeds` argument)."""
    tile = lambda a: np.concatenate([a] * num_seeds, axis=0)
    return FoldBatch(
        train_pool=tile(fb.train_pool), n_train=tile(fb.n_train),
        val_pool=tile(fb.val_pool), n_val=tile(fb.n_val),
        test_pool=tile(fb.test_pool), n_test=tile(fb.n_test),
        fold_valid=tile(fb.fold_valid),
        test_subjects=fb.test_subjects,
    )


def make_replicated_mesh(
    num_folds: int, num_seeds: int, devices=None
) -> tuple[Mesh, int]:
    """1-D `fold` mesh; returns (mesh, per-group padded fold count Fp) with
    Fp*num_seeds divisible by the device count (lanes shard evenly)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    d = len(devices)
    fp = num_folds
    while (fp * num_seeds) % d:
        fp += 1
    return Mesh(devices, axis_names=("fold",)), fp


def _acc_f1_matrices(result, fb: FoldBatch, num_seeds: int,
                     per_group: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-(seed, real fold) accuracy/F1 [S, F] from a stacked [S*Fp, ...]
    sweep result (padding folds dropped)."""
    num_real = len(fb.test_subjects)
    acc = np.zeros((num_seeds, num_real))
    f1 = np.zeros((num_seeds, num_real))
    for s in range(num_seeds):
        for f in range(num_real):
            cm = np.asarray(result.test_cm)[s * per_group + f]
            acc[s, f] = float(M.accuracy_from_cm(cm))
            f1[s, f] = float(M.weighted_f1_from_cm(cm))
    return acc, f1


def summarize_from_matrices(acc: np.ndarray, f1: np.ndarray,
                            seeds: tuple[int, ...],
                            subjects: tuple[str, ...]) -> dict:
    """Variance decomposition of a per-(seed, fold) accuracy/F1 matrix.

    Returns per-seed fold accuracies/F1s plus the numbers a paper needs:
    grand mean, the across-seed std of the per-seed means (training-noise
    error bar on the headline number), and the mean per-fold across-seed
    std (how seed-sensitive individual subjects are)."""
    seed_means = acc.mean(axis=1)
    return {
        "seeds": list(seeds),
        "subjects": list(subjects),
        "accuracy": acc.tolist(),
        "f1": f1.tolist(),
        "per_seed_mean_accuracy": seed_means.tolist(),
        "per_seed_mean_f1": f1.mean(axis=1).tolist(),
        "grand_mean_accuracy": float(acc.mean()),
        "grand_mean_f1": float(f1.mean()),
        # ddof=1: an error bar from S samples of the run-level mean.
        "seed_std_of_mean_accuracy": float(seed_means.std(ddof=1))
        if len(seeds) > 1 else 0.0,
        "mean_fold_seed_std": float(acc.std(axis=0, ddof=1).mean())
        if len(seeds) > 1 else 0.0,
        "fold_std_of_mean_accuracy": float(acc.mean(axis=0).std()),
    }


def summarize_replicated(result, fb: FoldBatch, seeds: tuple[int, ...],
                         per_group: int) -> dict:
    """Variance decomposition of one stacked [S*Fp, ...] sweep result."""
    acc, f1 = _acc_f1_matrices(result, fb, len(seeds), per_group)
    return summarize_from_matrices(acc, f1, seeds, fb.test_subjects)


def write_seed_summary(path: Path, cfg: ExperimentConfig, summary: dict) -> None:
    seeds = summary["seeds"]
    lines = [
        "Seed-replicated LOSO sweep summary",
        "=" * 60,
        f"model: {cfg.model.name} | channels: {list(cfg.channels_to_use)} | "
        f"mode: {cfg.classification_mode}",
        f"seeds: {seeds} (subject splits fixed; init/shuffle/dropout vary)",
        "",
        f"{'seed':>6} {'mean accuracy':>16} {'mean weighted F1':>18}",
        "-" * 60,
    ]
    for i, s in enumerate(seeds):
        lines.append(
            f"{s:>6} {summary['per_seed_mean_accuracy'][i]:>16.4f} "
            f"{summary['per_seed_mean_f1'][i]:>18.4f}"
        )
    lines += [
        "-" * 60,
        f"grand mean accuracy: {summary['grand_mean_accuracy']:.4f}",
        f"  across-seed std of the run mean (training noise): "
        f"±{summary['seed_std_of_mean_accuracy']:.4f}",
        f"  across-fold std of the seed-averaged accuracy (subject shift): "
        f"±{summary['fold_std_of_mean_accuracy']:.4f}",
        f"  mean per-fold across-seed std: "
        f"±{summary['mean_fold_seed_std']:.4f}",
        f"grand mean weighted F1: {summary['grand_mean_f1']:.4f}",
    ]
    path.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


def run_replicated_experiment(
    cfg: ExperimentConfig,
    seeds: tuple[int, ...],
    run_output_dir: Path | str,
    all_channel_names: list[str] | None = None,
    devices=None,
    seed_chunk: int | None = None,
) -> dict:
    """Pack once, sweep folds x seeds as one sharded program, write
    seed_summary.{txt,json} + the per-(seed,fold) accuracy matrix.

    seed_chunk: run at most this many seed groups per launch, sequentially.
    The seed axis multiplies HBM-resident training state; on one v5e chip
    (16 GB) the flagship 15-fold corpus fits 90 f32 lanes' params but OOMs
    on the backward's streamed gate activations — 6 bf16 seed groups fit,
    6 f32 groups do not (measured 2026-08-18). Chunking bounds the working
    set to `15 * seed_chunk` lanes while reusing the compiled program across
    launches (identical shapes -> jit cache hit), and past the
    linear-scaling knee it is also FASTER: lockstep epochs cost 8.5 s at 45
    lanes vs 29 s at 90 on one chip. Seed groups are independent programs,
    so chunking changes no group's semantics; exact bitwise results match
    the chunk-sized program, not the monolithic one (both sit inside the
    documented lane-count numerics band, benchmarks/BENCHMARK.md).

    On an XLA RESOURCE_EXHAUSTED launch failure the sweep automatically
    restarts with the per-launch seed count halved (down to 1 group)."""
    from multimodalsignal_tpu.config import validate_experiment

    t0 = time.time()
    validate_experiment(cfg, fold_execution="sharded")
    if seed_chunk is not None and seed_chunk < 1:
        raise ValueError(f"seed_chunk must be >= 1, got {seed_chunk}")
    run_output_dir = Path(run_output_dir)
    run_output_dir.mkdir(parents=True, exist_ok=True)
    corpus = stage_corpus(cfg, run_output_dir, all_channel_names,
                          save_extra={"replicate_seeds": list(seeds)})
    chunk = min(seed_chunk or len(seeds), len(seeds))
    staging_s = time.time() - t0
    accs, f1s, chunk_walls = [], [], []
    fb = None
    remaining = list(seeds)
    launch_idx = 0
    while remaining:  # OOM retry re-chunks ONLY the not-yet-run seeds
        chunk_seeds = tuple(remaining[:chunk])
        total = launch_idx + -(-len(remaining) // chunk)
        tc = time.time()
        try:
            mesh, per_group = make_replicated_mesh(
                len(corpus.subjects), len(chunk_seeds), devices
            )
            fb = build_fold_batch(corpus, list(cfg.subjects),
                                  cfg.val_fraction, cfg.seed,
                                  pad_folds_to=per_group)
            rfb = replicate_fold_batch(fb, len(chunk_seeds))
            if multihost.is_primary():
                print("=" * 80)
                print(f"Seed-replicated sweep "
                      f"[launch {launch_idx + 1}/{total}]: "
                      f"{len(fb.test_subjects)} folds x {len(chunk_seeds)} "
                      f"seeds = {len(fb.test_subjects) * len(chunk_seeds)} "
                      f"lanes (padded to {rfb.train_pool.shape[0]}) over "
                      f"{mesh.devices.size} devices "
                      f"[{mesh.devices.flat[0].platform}]")
                if launch_idx == 0:
                    print(f"  staging: {staging_s:.1f}s")
                print("=" * 80)
            result = run_fold_sweep(corpus, rfb, cfg, mesh,
                                    seeds=chunk_seeds)
            a, f = _acc_f1_matrices(result, fb, len(chunk_seeds),
                                    per_group)
            accs.append(a)
            f1s.append(f)
            chunk_walls.append(time.time() - tc)
            remaining = remaining[len(chunk_seeds):]
            launch_idx += 1
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or chunk <= 1:
                raise
            chunk = -(-chunk // 2)
            print(f"Launch hit RESOURCE_EXHAUSTED; keeping the "
                  f"{launch_idx} completed launch(es) and retrying the "
                  f"remaining {len(remaining)} seeds with "
                  f"seed_chunk={chunk}. Consider model.dtype=bfloat16.")

    summary = summarize_from_matrices(
        np.concatenate(accs, axis=0), np.concatenate(f1s, axis=0),
        tuple(seeds), fb.test_subjects,
    )
    summary["wall_s"] = time.time() - t0
    summary["seed_chunk"] = chunk
    summary["launch_walls_s"] = [round(w, 2) for w in chunk_walls]
    # Every process holds the gathered results; only the primary writes
    # (multi-host convention, parallel/multihost.py).
    if multihost.is_primary():
        write_seed_summary(run_output_dir / "seed_summary.txt", cfg, summary)
        (run_output_dir / "seed_summary.json").write_text(
            json.dumps(summary, indent=2) + "\n"
        )
        np.savez(
            run_output_dir / "seed_fold_matrix.npz",
            accuracy=np.asarray(summary["accuracy"]),
            f1=np.asarray(summary["f1"]),
            seeds=np.asarray(seeds),
            subjects=np.asarray(fb.test_subjects),
        )
        print(f"\nReplicated sweep wall-clock: {summary['wall_s']:.2f}s")
    return summary
