"""Sharded hierarchical experiment: two fold sweeps + vmapped composed eval.

The serial hierarchical path (experiments/hierarchical.py, mirroring reference
main.py:159-247) trains 2 models x 15 folds one at a time. Here it becomes
exactly TWO sharded computations — an M1 (stress vs non-stress) fold sweep and
an M2 (amusement vs baseline) fold sweep — followed by one jitted, vmapped
composed ternary evaluation that slices each model's channel subset from the
union-channel test windows and gates M2 by M1 (reference main.py:237-244)
using every fold's best-restored parameters at once.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodalsignal_tpu.config import HierarchicalConfig, save_config
from multimodalsignal_tpu.parallel import multihost
from multimodalsignal_tpu.data.dataset import (
    from_pickles_meta,
    pack_corpus,
    pack_corpus_from_pickles,
    read_channel_names,
    read_preprocess_meta,
)
from multimodalsignal_tpu.experiments.hierarchical import (
    HierarchicalFoldResult,
    _ordered_union,
    _write_summary,
)
from multimodalsignal_tpu.models import build_model
from multimodalsignal_tpu.parallel.fold_sweep import (
    _export_fold_checkpoint,
    _sequential_grid,
    build_fold_batch,
    make_fold_mesh,
    run_fold_sweep,
)
from multimodalsignal_tpu.train import metrics as M


def run_hierarchical_sharded(
    cfg: HierarchicalConfig,
    run_output_dir: Path | str,
    all_channel_names: list[str] | None = None,
    devices=None,
) -> tuple[list[HierarchicalFoldResult], dict]:
    base = cfg.base
    t0 = time.time()
    run_output_dir = Path(run_output_dir)
    run_output_dir.mkdir(parents=True, exist_ok=True)
    if base.from_pickles:
        # Fused preprocess+pack per (channels, mode) corpus; the shared memo
        # preprocesses each subject's pickle once across the M1/M2/union packs.
        _subject_memo: dict = {}
        _, meta = from_pickles_meta(
            _ordered_union(cfg.m1_channels, cfg.m2_channels))
        if multihost.is_primary():
            save_config(cfg, run_output_dir / "config.json",
                        extra={"preprocess_meta": meta})
    else:
        if multihost.is_primary():
            save_config(cfg, run_output_dir / "config.json",
                        extra={"preprocess_meta": read_preprocess_meta(base.data_path)})
        if all_channel_names is None:
            all_channel_names = read_channel_names(base.data_path)

    def stage(channels, mode):
        if base.from_pickles:
            corpus, _, _ = pack_corpus_from_pickles(
                base.from_pickles, list(base.subjects), list(channels),
                mode, base.normalization, subject_cache=_subject_memo,
            )
            return corpus
        return pack_corpus(
            base.data_path, list(base.subjects), list(channels),
            all_channel_names, mode, base.normalization,
        )

    if multihost.is_primary():
        print("=" * 80)
        print("Sharded hierarchical experiment: 2 fold sweeps + composed eval")
        print("=" * 80)

    def sweep(channels, mode, model_cfg, tag):
        corpus = stage(channels, mode)
        mesh, padded = make_fold_mesh(len(corpus.subjects), devices)
        fb = build_fold_batch(corpus, list(base.subjects), base.val_fraction,
                              base.seed, pad_folds_to=padded)
        if multihost.is_primary():
            print(f"\n--- Sweep {tag}: mode={mode}, "
                  f"channels={list(channels)} ---")
        point_cfg = dataclasses.replace(
            base, channels_to_use=tuple(channels), classification_mode=mode,
            num_classes=2, model=model_cfg,
        )
        result = run_fold_sweep(corpus, fb, point_cfg, mesh)
        return result, fb, mesh, point_cfg

    m1_result, fb1, mesh, m1_cfg = sweep(cfg.m1_channels, "stress_binary",
                                         cfg.m1_model, "M1")
    m2_result, _, _, m2_cfg = sweep(cfg.m2_channels, "amusement_binary",
                                    cfg.m2_model, "M2")

    # Composed ternary evaluation over the union-channel test windows.
    union = _ordered_union(cfg.m1_channels, cfg.m2_channels)
    m1_idx = jnp.asarray([union.index(ch) for ch in cfg.m1_channels], jnp.int32)
    m2_idx = jnp.asarray([union.index(ch) for ch in cfg.m2_channels], jnp.int32)
    corpus_u = stage(union, "ternary")
    padded = fb1.train_pool.shape[0]
    fb_u = build_fold_batch(corpus_u, list(base.subjects), base.val_fraction,
                            base.seed, pad_folds_to=padded)
    x_flat, y_flat, _ = corpus_u.flat()
    x = jnp.asarray(x_flat, jnp.float32)
    y = jnp.asarray(y_flat, jnp.int32)

    # This composed eval (and the M1/M2 training sweeps it follows) vmap
    # over folds: "auto" resolves to the per-direction kernels here.
    model_m1 = build_model(cfg.m1_model, 2, fold_parallel=True)
    model_m2 = build_model(cfg.m2_model, 2, fold_parallel=True)
    batch = base.trainer.batch_size
    steps_te = max(-(-int(fb_u.n_test.max()) // batch), 1)

    def composed_eval(x, y, p1, bs1, p2, bs2, te_pool, n_te):
        """One fold's composed ternary confusion matrix (vmapped over folds;
        x/y passed as arguments — closing over them would bake the whole
        corpus into the program as a constant)."""
        idx, w = _sequential_grid(jnp.asarray(te_pool), jnp.asarray(n_te),
                                  steps_te, batch)

        def step(cm, inp):
            bi, wb = inp
            xb = x[bi]
            x1 = jnp.take(xb, m1_idx, axis=1)
            x2 = jnp.take(xb, m2_idx, axis=1)
            pred1 = jnp.argmax(model_m1.apply(
                {"params": p1, "batch_stats": bs1}, x1, train=False), axis=-1)
            pred2 = jnp.argmax(model_m2.apply(
                {"params": p2, "batch_stats": bs2}, x2, train=False), axis=-1)
            preds = jnp.where(pred1 == 1, 2, pred2)
            return cm + M.confusion_matrix(y[bi], preds, 3, wb), None

        cm, _ = jax.lax.scan(step, jnp.zeros((3, 3)), (idx, w))
        return cm

    with mesh:
        cms = jax.jit(
            jax.vmap(composed_eval, in_axes=(None, None) + (0,) * 6)
        )(
            x, y,
            m1_result.final_params, m1_result.final_batch_stats,
            m2_result.final_params, m2_result.final_batch_stats,
            jnp.asarray(fb_u.test_pool), jnp.asarray(fb_u.n_test),
        )
    cms = np.asarray(cms)

    results: list[HierarchicalFoldResult] = []
    all_preds_cm = np.zeros((3, 3))
    for i, subject in enumerate(fb_u.test_subjects):
        m1_cm = jnp.asarray(m1_result.test_cm[i])
        cm = jnp.asarray(cms[i])
        results.append(HierarchicalFoldResult(
            subject=subject,
            m1_accuracy=float(M.accuracy_from_cm(m1_cm)),
            m1_f1=float(M.weighted_f1_from_cm(m1_cm)),
            composed_accuracy=float(M.accuracy_from_cm(cm)),
            composed_f1=float(M.weighted_f1_from_cm(cm)),
            num_test_windows=int(cms[i].sum()),
            wall_s=float("nan"),
        ))
        all_preds_cm += cms[i]

    # Export per-fold M1/M2 best-restored checkpoints in the serial path's
    # layout (fold_test_on_S*/model_m{1,2}/best_model.msgpack, experiments/
    # hierarchical.py via Trainer) so predict.HierarchicalPredictor.from_run
    # deploys sharded runs too. One bulk device->host transfer per stage.
    # Primary-only (multi-host convention, parallel/multihost.py): the
    # SweepResult states are already gathered host numpy on every process,
    # so non-primary processes skip the transfer and the writes entirely.
    if multihost.is_primary():
        host = jax.device_get({
            "p1": m1_result.final_params, "b1": m1_result.final_batch_stats,
            "p2": m2_result.final_params, "b2": m2_result.final_batch_stats,
        })
        from concurrent.futures import ThreadPoolExecutor

        def export_fold(i_subject):
            i, subject = i_subject
            fold_dir = run_output_dir / f"fold_test_on_{subject}"
            _export_fold_checkpoint(fold_dir / "model_m1", host["p1"],
                                    host["b1"], i, m1_cfg)
            _export_fold_checkpoint(fold_dir / "model_m2", host["p2"],
                                    host["b2"], i, m2_cfg)

        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(export_fold, enumerate(fb_u.test_subjects)))

    summary = _write_summary_from_cms(run_output_dir, results, all_preds_cm)
    summary["sweep_wall_s"] = time.time() - t0
    if multihost.is_primary():
        print(f"\nHierarchical sharded wall-clock: "
              f"{summary['sweep_wall_s']:.2f}s")
    return results, summary


def _write_summary_from_cms(run_dir: Path, results, total_cm: np.ndarray) -> dict:
    """Same artifact contract as the serial path's summary, computed from the
    aggregated confusion matrix instead of raw prediction lists."""
    cm = jnp.asarray(total_cm)
    summary = {
        "num_folds": len(results),
        "overall_accuracy": float(M.accuracy_from_cm(cm)),
        "overall_f1": float(M.weighted_f1_from_cm(cm)),
        "mean_m1_accuracy": float(np.mean([r.m1_accuracy for r in results])),
        "mean_composed_accuracy": float(np.mean([r.composed_accuracy for r in results])),
        "std_composed_accuracy": float(np.std([r.composed_accuracy for r in results])),
        "mean_composed_f1": float(np.mean([r.composed_f1 for r in results])),
    }
    lines = ["Hierarchical experiment summary (sharded)", "", "Per-fold results:"]
    for r in results:
        lines.append(
            f"  - test {r.subject}: M1 acc = {r.m1_accuracy:.4f} | "
            f"composed acc = {r.composed_accuracy:.4f}, F1 = {r.composed_f1:.4f} "
            f"({r.num_test_windows} windows)"
        )
    lines += [
        "",
        f"Overall window-level accuracy: {summary['overall_accuracy']:.4f}",
        f"Overall window-level weighted F1: {summary['overall_f1']:.4f}",
        f"Mean composed accuracy: {summary['mean_composed_accuracy']:.4f} "
        f"± {summary['std_composed_accuracy']:.4f}",
        "",
        "Overall confusion matrix (rows=true, cols=pred; 0=Base, 1=Fun, 2=Stress):",
        str(total_cm.astype(int)),
    ]
    if multihost.is_primary():
        (run_dir / "hierarchical_summary.txt").write_text(
            "\n".join(lines) + "\n")
        print("Hierarchical summary saved to: "
              f"{run_dir / 'hierarchical_summary.txt'}")
    return summary
