"""Hybrid (raw + handcrafted feature) fusion model.

The reference's hybrid path is incomplete: HybridDataset yields
((x_raw, x_feat), y) batches (void/dataset.py:191-198) and the Trainer
handles tuple inputs (reference trainer.py:130-146), but no shipped model
consumes the second stream. This module completes that path: the CnnGru(Att)
trunk encodes the raw windows, a small MLP encodes the feature vector, and
the classifier head fuses both — the natural late-fusion the dead code was
built for.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from multimodalsignal_tpu.models.cnn_gru import ChannelAttention, ConvEncoder
from multimodalsignal_tpu.models.gru import BiGRU


class HybridCnnGruModel(nn.Module):
    """Input: pytree (x_raw [B, C, T], x_feat [B, F]) -> logits [B, classes]."""

    num_classes: int = 2
    cnn_out_channels: int = 32
    gru_hidden_size: int = 64
    gru_num_layers: int = 2
    dropout: float = 0.5
    reduction_ratio: int = 4
    gru_impl: str = "scan"
    use_channel_attention: bool = True
    feat_hidden: int = 32
    # Prune the final GRU layer's backward walk to one cell step (only the
    # last timestep is read below; see BiGRU.last_only).
    gru_last_prune: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        x_raw, x_feat = x
        h = jnp.swapaxes(x_raw, 1, 2).astype(self.dtype)  # [B, T, C]
        if self.use_channel_attention:
            h = ChannelAttention(self.reduction_ratio, dtype=self.dtype,
                                 name="channel_attention")(h)
        h = ConvEncoder(self.cnn_out_channels, dtype=self.dtype,
                        name="cnn_encoder")(h, train=train)
        h = BiGRU(
            hidden_size=self.gru_hidden_size,
            num_layers=self.gru_num_layers,
            dropout=self.dropout if self.gru_num_layers > 1 else 0.0,
            impl=self.gru_impl,
            last_only=self.gru_last_prune,
            dtype=self.dtype,
            name="gru",
        )(h, train=train)
        if not self.gru_last_prune:
            h = h[:, -1, :]  # [B, 2H]

        f = nn.Dense(self.feat_hidden, dtype=self.dtype, name="feat1")(
            x_feat.astype(self.dtype))
        f = nn.relu(f)

        z = jnp.concatenate([h, f], axis=-1)
        z = nn.Dense(64, dtype=self.dtype, name="head1")(z)
        z = nn.relu(z)
        z = nn.Dropout(rate=self.dropout, deterministic=not train)(z)
        z = nn.Dense(self.num_classes, dtype=self.dtype, name="head2")(z)
        return z.astype(jnp.float32)
