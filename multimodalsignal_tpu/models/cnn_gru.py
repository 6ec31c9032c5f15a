"""Model family: ChannelAttention, CnnGru, CnnGruAttention (flax.linen).

Parity targets:
  * ChannelAttention — reference models.py:7-31: time-mean squeeze ->
    Dense(C/r, no bias) -> ReLU -> Dense(C, no bias) -> sigmoid gate.
  * CnnGruAttentionModel — reference models.py:34-81: attention -> two
    Conv1d(+BN+ReLU+MaxPool) stages (16x temporal downsample: 7680 -> 480) ->
    bidirectional GRU -> last timestep -> Dense(64)+ReLU+Dropout+Dense(classes).
  * CnnGruModel — the "traditional fusion" baseline the README benchmarks
    against (README.md:13,81); identical trunk without the channel gate.

Public call signature takes [B, C, T] (the reference's sample layout,
dataset.py:63) and immediately moves to the TPU-native channels-last [B, T, C]
so convs map onto XLA's native NWC conv lowering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodalsignal_tpu.models.gru import BiGRU


class ChannelAttention(nn.Module):
    """Squeeze-and-excitation-style gate over signal channels."""

    reduction_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, C]
        c = x.shape[-1]
        hidden = c // self.reduction_ratio  # torch floor-division semantics
        if hidden == 0:
            # Reference quirk, replicated exactly: with C < reduction_ratio
            # torch builds Linear(C->0)->Linear(0->C), whose bias-free output
            # is all zeros, so the gate is sigmoid(0) = 0.5 for every channel
            # (this is the warning reference main.py:16 silences). The
            # headline 3-channel config runs with this constant gate; we skip
            # the dead zero-width parameters and apply 0.5 directly.
            return x * 0.5
        squeezed = x.mean(axis=1)  # AdaptiveAvgPool1d(1) over time
        y = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="fc1")(squeezed)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, :]


class ConvEncoder(nn.Module):
    """Conv1d(k7,s2)+BN+ReLU+MaxPool(3,2) -> Conv1d(k5,s2)+BN+ReLU+MaxPool(3,2).

    16x temporal downsampling before recurrence (reference models.py:45-54) —
    the architectural long-sequence trick that keeps the GRU at 480 steps.
    """

    out_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: [B, T, C]
        x = nn.Conv(16, kernel_size=(7,), strides=(2,), padding=[(3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(3,), strides=(2,), padding=[(1, 1)])
        x = nn.Conv(self.out_channels, kernel_size=(5,), strides=(2,),
                    padding=[(2, 2)], use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(3,), strides=(2,), padding=[(1, 1)])
        return x  # [B, T/16, out_channels]


class _CnnGruBase(nn.Module):
    num_classes: int = 2
    cnn_out_channels: int = 32
    gru_hidden_size: int = 64
    gru_num_layers: int = 2
    dropout: float = 0.5
    reduction_ratio: int = 4
    gru_impl: str = "scan"
    use_channel_attention: bool = True
    # Prune the final GRU layer's backward walk to one cell step (the head
    # reads only the last timestep — reference models.py:79 — so the rest of
    # that walk is dead work; see BiGRU.last_only). False reproduces the
    # pre-pruning op schedule bit-for-bit.
    gru_last_prune: bool = True
    # Compute dtype for the conv/GRU/head math; params stay float32 and the
    # logits are cast back to float32 for the loss (bfloat16 feeds the MXU at
    # twice the fp32 rate — SURVEY.md §7 / BASELINE.md perf lever).
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: [B, C, T] (reference layout) -> [B, T, C] (TPU-native)
        x = jnp.swapaxes(x, 1, 2).astype(self.dtype)
        if self.use_channel_attention:
            x = ChannelAttention(self.reduction_ratio, dtype=self.dtype,
                                 name="channel_attention")(x)
        x = ConvEncoder(self.cnn_out_channels, dtype=self.dtype,
                        name="cnn_encoder")(x, train=train)
        x = BiGRU(
            hidden_size=self.gru_hidden_size,
            num_layers=self.gru_num_layers,
            dropout=self.dropout if self.gru_num_layers > 1 else 0.0,
            impl=self.gru_impl,
            last_only=self.gru_last_prune,
            dtype=self.dtype,
            name="gru",
        )(x, train=train)
        if not self.gru_last_prune:
            x = x[:, -1, :]  # last timestep (reference models.py:79)
        x = nn.Dense(64, dtype=self.dtype, name="head1")(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="head2")(x)
        return x.astype(jnp.float32)


class CnnGruAttentionModel(_CnnGruBase):
    """Channel-attention fusion model (the reference's headline model)."""

    use_channel_attention: bool = True


class CnnGruModel(_CnnGruBase):
    """Traditional early-fusion baseline (no channel gate)."""

    use_channel_attention: bool = False


def build_model(model_cfg, num_classes: int, fold_parallel: bool = False):
    """Instantiate a model from a ModelConfig (config.py).

    fold_parallel: the caller will vmap this model over a fold axis (the
    sharded sweep, the fold ensemble). With gru_impl="auto" that picks the
    per-direction Pallas kernels instead of the direction-batched ones:
    dirbatch's pre-flipped gate streams are cheap for one fold but measured
    ~2x slower per sweep epoch at 15 folds (4.96 vs 2.57 s, fusion6 bf16 —
    benchmarks/RESULTS.md "direction-batched GRU at fold scale"), where the
    per-direction kernels handle time reversal via block index maps with
    zero data movement.
    """
    from multimodalsignal_tpu.models.hybrid import HybridCnnGruModel

    cls = {
        "cnn_gru_attention": CnnGruAttentionModel,
        "cnn_gru": CnnGruModel,
        "hybrid_cnn_gru": HybridCnnGruModel,
    }[model_cfg.name]
    gru_impl = model_cfg.gru_impl
    if gru_impl == "auto" and fold_parallel:
        gru_impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    return cls(
        num_classes=num_classes,
        cnn_out_channels=model_cfg.cnn_out_channels,
        gru_hidden_size=model_cfg.gru_hidden_size,
        gru_num_layers=model_cfg.gru_num_layers,
        dropout=model_cfg.dropout,
        reduction_ratio=model_cfg.reduction_ratio,
        gru_impl=gru_impl,
        gru_last_prune=getattr(model_cfg, "gru_last_prune", True),
        dtype=jnp.dtype(getattr(model_cfg, "dtype", "float32")),
    )
