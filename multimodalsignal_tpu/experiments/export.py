"""Model export: trained checkpoint -> self-contained StableHLO artifact.

The reference has no deployment story at all (SURVEY.md §1: no serving/API
layer; checkpoints are torch state_dicts that require the model source to
load). This is the TPU-native one: `jax.export` serializes the jitted
inference function — weights baked in as constants, batch dimension
symbolic, lowered for BOTH cpu and tpu — into one versioned artifact that
runs WITHOUT this package's model code (only jax is needed to execute it):

    python -m multimodalsignal_tpu.experiments.export \
        --checkpoint output/.../fold_test_on_S2/best_model.msgpack \
        --config output/.../config.json --out model.mms

    from multimodalsignal_tpu.experiments.export import ExportedPredictor
    ep = ExportedPredictor.load("model.mms")
    probs = ep.predict_windows(x)        # [N, C, T] float32, any N

Artifact format (`.mms` = a zip): `model.stablehlo` (serialized
jax.export blob) + `meta.json` (class names, channels, window geometry,
normalization scheme, platforms — everything a serving shim needs to
validate inputs and label outputs).

The exported function always uses the portable `lax.scan` GRU: the Pallas
kernels are runtime-selected TPU code paths, parity-tested against scan
(tests/test_gru_pallas.py), and a deployable artifact must execute on any
listed platform.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import zipfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# Version 1: single-array input (raw models). Version 2: hybrid artifacts,
# whose exported callable takes a (raw, feat) pytree — a different INPUT
# CONTRACT, so hybrid exports stamp 2 and a version-1-only loader rejects
# them at load() with a clear error instead of a cryptic jax.export arity
# TypeError at call time. Raw artifacts keep stamping 1 (older loaders can
# still run them).
ARTIFACT_VERSION = 1
HYBRID_ARTIFACT_VERSION = 2
SUPPORTED_ARTIFACT_VERSIONS = (1, 2)


def _feature_version() -> int:
    from multimodalsignal_tpu.data.features import FEATURE_EXTRACTOR_VERSION

    return FEATURE_EXTRACTOR_VERSION


def export_predictor(predictor, out_path: Path | str,
                     platforms: tuple[str, ...] = ("cpu", "tpu")) -> dict:
    """Serialize `predictor`'s inference function + weights to `out_path`.

    Returns the artifact's meta dict. The batch dimension is symbolic, so
    one export serves any request size with no padding."""
    from jax import export as jexport

    from multimodalsignal_tpu.experiments.predict import CLASS_NAMES
    from multimodalsignal_tpu.models import build_model

    cfg = predictor.cfg
    # Portable compute path only (see module docstring).
    model = build_model(dataclasses.replace(cfg.model, gru_impl="scan"),
                        cfg.num_classes)
    params, batch_stats = predictor.state.params, predictor.state.batch_stats
    fold_names = getattr(predictor, "fold_names", None)

    if fold_names is not None:
        # Fold-ensemble artifact (predict.EnsemblePredictor): params carry a
        # leading fold axis; the exported program vmaps over it and averages
        # probabilities — the whole cross-validated ensemble in one blob.
        def infer(x):
            def one_fold(p, bs):
                logits = model.apply(
                    {"params": p, "batch_stats": bs}, x, train=False
                )
                return jax.nn.softmax(logits, axis=-1)

            return jax.vmap(one_fold)(params, batch_stats).mean(axis=0)
    else:
        def infer(x):
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
            return jax.nn.softmax(logits, axis=-1)

    c = len(cfg.channels_to_use)
    t = predictor.window_sec * predictor.target_fs
    (b,) = jexport.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, c, t), jnp.float32)
    feature_names = list(getattr(predictor, "feature_names", ()) or ())
    if getattr(predictor, "is_hybrid", False):
        # Hybrid artifact: the exported callable takes the (raw, feat) pair
        # the training batches used (reference trainer.py:130-146).
        spec = (spec, jax.ShapeDtypeStruct((b, len(feature_names)),
                                           jnp.float32))
    exported = jexport.export(jax.jit(infer), platforms=tuple(platforms))(spec)
    blob = exported.serialize()

    meta = {
        "artifact_version": (HYBRID_ARTIFACT_VERSION if feature_names
                             else ARTIFACT_VERSION),
        "model": cfg.model.name,
        "classification_mode": cfg.classification_mode,
        "class_names": list(CLASS_NAMES[cfg.classification_mode]),
        "channels": list(cfg.channels_to_use),
        "feature_names": feature_names,  # non-empty iff hybrid
        # Hybrid: which extractor math the artifact's features assume; the
        # loader computes features live and must match (predict.py
        # _check_feature_extractor_version rationale).
        "feature_extractor_version": _feature_version() if feature_names
                                     else None,
        "window_shape": [c, t],
        "window_sec": predictor.window_sec,
        "stride_sec": predictor.stride_sec,
        "target_fs": predictor.target_fs,
        "original_fs": predictor.original_fs,
        "normalization": cfg.normalization,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "ensemble_folds": list(fold_names) if fold_names is not None else None,
    }
    out_path = Path(out_path)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("model.stablehlo", blob)
        zf.writestr("meta.json", json.dumps(meta, indent=2))
    return meta


class ExportedPredictor:
    """Run an exported artifact. Needs jax only — no model code, no flax."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        self.class_names = tuple(meta["class_names"])
        self.is_hybrid = bool(meta.get("feature_names"))
        self.feature_names = tuple(meta.get("feature_names") or ())

    @classmethod
    def load(cls, path: Path | str) -> "ExportedPredictor":
        from jax import export as jexport

        with zipfile.ZipFile(Path(path)) as zf:
            blob = zf.read("model.stablehlo")
            meta = json.loads(zf.read("meta.json"))
        if meta.get("artifact_version") not in SUPPORTED_ARTIFACT_VERSIONS:
            raise ValueError(
                f"artifact version {meta.get('artifact_version')} not in "
                f"supported {SUPPORTED_ARTIFACT_VERSIONS} — the artifact "
                f"needs a newer package")
        fv = meta.get("feature_extractor_version")
        if meta.get("feature_names") and fv is not None \
                and int(fv) != _feature_version():
            raise ValueError(
                f"hybrid artifact assumes feature extractor v{fv}; this "
                f"package computes v{_feature_version()} features live — "
                "re-export from a retrained checkpoint or use the matching "
                "package version")
        return cls(jexport.deserialize(blob), meta)

    def predict_windows(self, x, batch_size: int | None = None
                        ) -> np.ndarray:
        """[N, C, T] float32 (or the hybrid ([N, C, T], [N, F]) pair) ->
        probs [N, num_classes]. Symbolic batch: any N executes without
        padding or recompilation per shape (batch_size is accepted for
        Predictor interface compatibility and ignored)."""
        c, t = self.meta["window_shape"]
        if self.is_hybrid:
            if not isinstance(x, (tuple, list)) or len(x) != 2:
                raise ValueError(
                    "hybrid artifact expects (raw [N, C, T], feat [N, F])")
            raw = np.asarray(x[0], np.float32)
            feat = np.asarray(x[1], np.float32)
            f = len(self.feature_names)
            if raw.ndim != 3 or raw.shape[1] != c or raw.shape[2] != t:
                raise ValueError(
                    f"expected raw windows [N, {c}, {t}], got {list(raw.shape)}")
            if feat.ndim != 2 or feat.shape != (raw.shape[0], f):
                raise ValueError(
                    f"expected features [{raw.shape[0]}, {f}], "
                    f"got {list(feat.shape)}")
            return np.asarray(self._exported.call((raw, feat)))
        x = np.asarray(x, np.float32)
        if x.ndim != 3 or x.shape[1] != c or x.shape[2] != t:
            raise ValueError(
                f"expected windows [N, {c}, {t}], got {list(x.shape)}")
        return np.asarray(self._exported.call(x))

    def windows_from_recording(self, pkl_path):
        """Raw WESAD pickle -> normalized windows, replaying the artifact's
        recorded pipeline parameters (Predictor interface); hybrid artifacts
        get the (raw, feat) pair."""
        from multimodalsignal_tpu.experiments.predict import (
            recording_to_hybrid_windows,
            recording_to_windows,
        )

        m = self.meta
        if self.is_hybrid:
            return recording_to_hybrid_windows(
                pkl_path, list(m["channels"]), m["normalization"],
                list(self.feature_names), m["original_fs"], m["target_fs"],
                m["window_sec"], m["stride_sec"],
            )
        return recording_to_windows(
            pkl_path, list(m["channels"]), m["normalization"],
            m["original_fs"], m["target_fs"], m["window_sec"], m["stride_sec"],
        )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", help="one fold's best_model.msgpack")
    p.add_argument("--config", help="the run's config.json")
    p.add_argument("--run-dir",
                   help="run directory (with --fold); replaces "
                        "--checkpoint/--config")
    p.add_argument("--fold", default="all",
                   help="with --run-dir: a subject id, or 'all' for the "
                        "vmapped fold ensemble (default)")
    p.add_argument("--out", required=True, help="artifact path (.mms)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets (default cpu,tpu)")
    args = p.parse_args(argv)

    from multimodalsignal_tpu.experiments.predict import (
        EnsemblePredictor,
        Predictor,
    )

    if args.run_dir:
        if args.checkpoint or args.config:
            p.error("--run-dir replaces --checkpoint/--config")
        predictor = EnsemblePredictor.from_run(args.run_dir, args.fold)
    elif args.checkpoint and args.config:
        predictor = Predictor.from_files(args.checkpoint, args.config)
    else:
        p.error("provide --run-dir, or --checkpoint with --config")
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    meta = export_predictor(predictor, args.out, platforms)
    size_kb = Path(args.out).stat().st_size / 1024
    folds = meta.get("ensemble_folds")
    kind = f"{len(folds)}-fold ensemble" if folds else "single fold"
    print(f"Exported {meta['model']} ({meta['classification_mode']}, {kind}) "
          f"for {meta['platforms']} -> {args.out} ({size_kb:.0f} KiB)")


if __name__ == "__main__":
    main()
