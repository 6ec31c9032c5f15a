from multimodalsignal_tpu.models.cnn_gru import (
    ChannelAttention,
    CnnGruAttentionModel,
    CnnGruModel,
    ConvEncoder,
    build_model,
)
from multimodalsignal_tpu.models.gru import BiGRU, gru_sequence

__all__ = [
    "ChannelAttention",
    "CnnGruAttentionModel",
    "CnnGruModel",
    "ConvEncoder",
    "BiGRU",
    "gru_sequence",
    "build_model",
]
