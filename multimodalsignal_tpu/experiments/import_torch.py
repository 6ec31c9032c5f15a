"""Import a reference PyTorch checkpoint (`best_model.pt`) into this framework.

The reference persists its best model as a bare ``state_dict``
(reference trainer.py:38-39) of the ``CnnGruAttentionModel`` topology
(reference models.py:34-81). A user switching from the reference to this
framework should not have to retrain: this module maps those tensors onto the
flax parameter pytree (the same transplant rules the golden parity suite pins
in tests/test_torch_parity.py) and emits a standard run directory —
``best_model.msgpack`` + ``config.json`` — that every downstream surface
(``experiments.predict``, ``serving``, ``experiments.export``, the ensemble
tools) consumes as-is.

All architecture hyperparameters are inferred from tensor shapes, so the CLI
only needs what a state_dict cannot carry: the channel list and the
classification mode the model was trained with.

CLI::

    python -m multimodalsignal_tpu.experiments.import_torch \
        --pt output/run_x/fold_test_on_S2/best_model.pt \
        --channels chest_ECG chest_EDA chest_Resp \
        --mode stress_binary --out ./imported_S2

Key mapping (torch -> flax; Linear/Conv kernels transpose to column-major /
NWC as in tests/test_torch_parity.py):

    channel_attention.fc.0.weight  -> params.channel_attention.fc1.kernel (T)
    channel_attention.fc.2.weight  -> params.channel_attention.fc2.kernel (T)
    cnn_encoder.0.weight           -> params.cnn_encoder.conv1.kernel (2,1,0)
    cnn_encoder.1.*                -> bn1 scale/bias + batch_stats mean/var
    cnn_encoder.4.weight           -> params.cnn_encoder.conv2.kernel (2,1,0)
    cnn_encoder.5.*                -> bn2
    gru.weight_ih_l{k}[_reverse]   -> params.gru.l{k}_{fwd,bwd}_w_ih   (as-is)
    gru.weight_hh_l{k}[_reverse]   -> params.gru.l{k}_{fwd,bwd}_w_hh
    gru.bias_*_l{k}[_reverse]      -> params.gru.l{k}_{fwd,bwd}_b_*
    classifier.0.{weight,bias}     -> params.head1 (T)
    classifier.3.{weight,bias}     -> params.head2 (T)

The reference's degenerate channel gate (C < reduction_ratio builds
Linear(C->0)->Linear(0->C); the gate is the constant 0.5 — models.py:12-21,
replicated at models/cnn_gru.py:36-43) imports cleanly: the zero-width
tensors are dropped and the flax model applies the 0.5 constant directly.
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

import numpy as np


class TorchImportError(ValueError):
    pass


def load_torch_state_dict(pt_path: Path | str) -> dict[str, np.ndarray]:
    """Read a .pt file into {name: float32 ndarray} (torch-CPU only here)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is baked into the env
        raise TorchImportError(
            "importing a .pt checkpoint requires the (CPU) torch package"
        ) from e
    obj = torch.load(pt_path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj and not hasattr(
        obj["state_dict"], "numpy"
    ):
        obj = obj["state_dict"]  # tolerate {'state_dict': ...} wrappers
    if not isinstance(obj, dict):
        raise TorchImportError(
            f"{pt_path}: expected a state_dict, got {type(obj).__name__}"
        )
    return {
        k: np.asarray(v.detach().to(torch.float32).numpy())
        for k, v in obj.items()
        if hasattr(v, "detach")
    }


def infer_model_config(sd: dict[str, np.ndarray]):
    """Architecture hyperparameters from state_dict tensor shapes.

    Returns (ModelConfig, in_channels, num_classes)."""
    from multimodalsignal_tpu.config import ModelConfig

    def need(key: str) -> np.ndarray:
        if key not in sd:
            raise TorchImportError(
                f"state_dict is missing '{key}' — not a reference "
                f"CnnGruAttentionModel checkpoint (models.py:34-81)? "
                f"Keys present: {sorted(sd)[:8]}..."
            )
        return sd[key]

    conv1 = need("cnn_encoder.0.weight")        # [16, C, 7]
    conv2 = need("cnn_encoder.4.weight")        # [out, 16, 5]
    w_ih0 = need("gru.weight_ih_l0")            # [3H, out]
    head2 = need("classifier.3.weight")         # [classes, 64]
    in_channels = int(conv1.shape[1])
    cnn_out = int(conv2.shape[0])
    hidden = int(w_ih0.shape[0]) // 3
    num_classes = int(head2.shape[0])
    layers = len({
        m.group(1)
        for k in sd
        if (m := re.fullmatch(r"gru\.weight_ih_l(\d+)", k))
    })
    if "gru.weight_ih_l0_reverse" not in sd:
        raise TorchImportError(
            "checkpoint's GRU is unidirectional; the reference model is "
            "bidirectional (models.py:56-63) and so is this framework's"
        )

    att = sd.get("channel_attention.fc.0.weight")  # [C//r, C] (may be 0-row)
    if att is None:
        name, reduction = "cnn_gru", 4  # gateless baseline export
    elif att.shape[0] == 0:
        # Degenerate gate: any r > C reproduces torch's floor(C/r) == 0.
        name = "cnn_gru_attention"
        reduction = 4 if in_channels < 4 else in_channels + 1
    else:
        name = "cnn_gru_attention"
        reduction = in_channels // int(att.shape[0])
    return (
        ModelConfig(
            name=name,
            cnn_out_channels=cnn_out,
            gru_hidden_size=hidden,
            gru_num_layers=layers,
            reduction_ratio=reduction,
        ),
        in_channels,
        num_classes,
    )


def state_dict_to_variables(
    sd: dict[str, np.ndarray], template_variables
) -> dict:
    """Map reference state_dict tensors onto the flax variables pytree.

    `template_variables` comes from `model.init` on the inferred config;
    every template leaf must be filled by a state_dict tensor of the same
    shape, and every state_dict tensor must be consumed (BN bookkeeping
    `num_batches_tracked` and zero-width degenerate-gate tensors excepted) —
    a bidirectional shape/coverage check, not a best-effort copy.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, template_variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, template_variables.get("batch_stats", {})
    )
    consumed: set[str] = set()

    def take(key: str) -> np.ndarray:
        if key not in sd:
            raise TorchImportError(f"state_dict is missing '{key}'")
        consumed.add(key)
        return sd[key]

    def put(tree, path: tuple[str, ...], value: np.ndarray, src: str):
        node = tree
        for p in path[:-1]:
            node = node[p]
        old = node[path[-1]]
        if tuple(old.shape) != tuple(value.shape):
            raise TorchImportError(
                f"shape mismatch importing '{src}' -> params.{'.'.join(path)}: "
                f"checkpoint {tuple(value.shape)} vs model {tuple(old.shape)}"
            )
        node[path[-1]] = value.astype(old.dtype)

    if "channel_attention" in params:
        put(params, ("channel_attention", "fc1", "kernel"),
            take("channel_attention.fc.0.weight").T,
            "channel_attention.fc.0.weight")
        put(params, ("channel_attention", "fc2", "kernel"),
            take("channel_attention.fc.2.weight").T,
            "channel_attention.fc.2.weight")

    put(params, ("cnn_encoder", "conv1", "kernel"),
        take("cnn_encoder.0.weight").transpose(2, 1, 0), "cnn_encoder.0.weight")
    put(params, ("cnn_encoder", "conv2", "kernel"),
        take("cnn_encoder.4.weight").transpose(2, 1, 0), "cnn_encoder.4.weight")
    for bn_name, idx in (("bn1", 1), ("bn2", 5)):
        put(params, ("cnn_encoder", bn_name, "scale"),
            take(f"cnn_encoder.{idx}.weight"), f"cnn_encoder.{idx}.weight")
        put(params, ("cnn_encoder", bn_name, "bias"),
            take(f"cnn_encoder.{idx}.bias"), f"cnn_encoder.{idx}.bias")
        put(stats, ("cnn_encoder", bn_name, "mean"),
            take(f"cnn_encoder.{idx}.running_mean"),
            f"cnn_encoder.{idx}.running_mean")
        put(stats, ("cnn_encoder", bn_name, "var"),
            take(f"cnn_encoder.{idx}.running_var"),
            f"cnn_encoder.{idx}.running_var")

    layers = sorted({
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(r"gru\.weight_ih_l(\d+)(_reverse)?", k))
    })
    for layer in layers:
        for direction, sfx in (("fwd", ""), ("bwd", "_reverse")):
            pfx = f"l{layer}_{direction}"
            for ours, theirs in (
                ("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                ("b_ih", "bias_ih"), ("b_hh", "bias_hh"),
            ):
                put(params, ("gru", f"{pfx}_{ours}"),
                    take(f"gru.{theirs}_l{layer}{sfx}"),
                    f"gru.{theirs}_l{layer}{sfx}")

    put(params, ("head1", "kernel"), take("classifier.0.weight").T,
        "classifier.0.weight")
    put(params, ("head1", "bias"), take("classifier.0.bias"),
        "classifier.0.bias")
    put(params, ("head2", "kernel"), take("classifier.3.weight").T,
        "classifier.3.weight")
    put(params, ("head2", "bias"), take("classifier.3.bias"),
        "classifier.3.bias")

    leftovers = [
        k for k in sd
        if k not in consumed
        and not k.endswith("num_batches_tracked")
        and sd[k].size > 0  # degenerate-gate zero-width tensors
    ]
    if leftovers:
        raise TorchImportError(
            f"unmapped state_dict tensors (wrong architecture?): {leftovers}"
        )
    return {"params": params, "batch_stats": stats}


def import_torch_checkpoint(
    pt_path: Path | str,
    channels_to_use: tuple[str, ...],
    classification_mode: str,
    out_dir: Path | str,
    normalization: str = "all",
):
    """.pt state_dict -> run directory (best_model.msgpack + config.json).

    Returns (ExperimentConfig, TrainState). The emitted directory serves as a
    drop-in single-fold run: `Predictor.from_files(out/best_model.msgpack,
    out/config.json)`, `serving.serve(...)`, and `export` all accept it.
    """
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from multimodalsignal_tpu.config import ExperimentConfig, save_config
    from multimodalsignal_tpu.models import build_model
    from multimodalsignal_tpu.train.checkpoints import save_state
    from multimodalsignal_tpu.train.optim import make_optimizer
    from multimodalsignal_tpu.train.trainer import init_train_state

    sd = load_torch_state_dict(pt_path)
    model_cfg, in_channels, num_classes = infer_model_config(sd)
    if len(channels_to_use) != in_channels:
        raise TorchImportError(
            f"checkpoint was trained on {in_channels} input channels but "
            f"{len(channels_to_use)} channel names were given: "
            f"{list(channels_to_use)}"
        )
    cfg = ExperimentConfig(
        run_name=f"imported_{Path(pt_path).stem}",
        classification_mode=classification_mode,
        num_classes=num_classes,
        channels_to_use=tuple(channels_to_use),
        normalization=normalization,
        model=model_cfg,
    )

    model = build_model(cfg.model, cfg.num_classes)
    tx = make_optimizer(cfg.trainer.learning_rate, cfg.trainer.weight_decay)
    sample = jnp.zeros((1, in_channels, 128 * 60), jnp.float32)
    template = init_train_state(model, jax.random.PRNGKey(0), sample, tx)
    variables = state_dict_to_variables(
        sd, {"params": template.params, "batch_stats": template.batch_stats}
    )
    state = dc.replace(
        template,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
    )

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_state(out_dir / "best_model.msgpack", state)
    save_config(cfg, out_dir / "config.json")
    print(
        f"Imported {pt_path} -> {out_dir}/best_model.msgpack\n"
        f"  model: {model_cfg.name} (C={in_channels}, "
        f"cnn_out={model_cfg.cnn_out_channels}, H={model_cfg.gru_hidden_size}, "
        f"layers={model_cfg.gru_num_layers}, classes={num_classes})\n"
        f"  serve it:   python -m multimodalsignal_tpu.serving "
        f"--checkpoint {out_dir}/best_model.msgpack "
        f"--config {out_dir}/config.json\n"
        f"  predict:    python -m multimodalsignal_tpu.experiments.predict "
        f"--checkpoint {out_dir}/best_model.msgpack "
        f"--config {out_dir}/config.json --pkl <recording.pkl>"
    )
    return cfg, state


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pt", type=Path, required=True,
                   help="reference best_model.pt (a torch state_dict)")
    p.add_argument("--channels", nargs="+", required=True,
                   help="channel names the model was trained on, in order "
                        "(reference main.py:41-47 CHANNELS_TO_USE)")
    p.add_argument("--mode", default="stress_binary",
                   choices=("stress_binary", "ternary", "amusement_binary"),
                   help="classification mode the model was trained with")
    p.add_argument("--normalization", default="all",
                   choices=("all", "baseline", "none"))
    p.add_argument("--out", type=Path, required=True,
                   help="output run directory")
    args = p.parse_args(argv)
    import_torch_checkpoint(
        args.pt, tuple(args.channels), args.mode, args.out,
        normalization=args.normalization,
    )


if __name__ == "__main__":
    main()
