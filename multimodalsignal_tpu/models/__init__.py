from multimodalsignal_tpu.models.cnn_gru import (
    ChannelAttention,
    CnnGruAttentionModel,
    CnnGruModel,
    ConvEncoder,
    build_model,
)
from multimodalsignal_tpu.models.gru import BiGRU, gru_sequence
from multimodalsignal_tpu.models.hybrid import HybridCnnGruModel

__all__ = [
    "ChannelAttention",
    "CnnGruAttentionModel",
    "CnnGruModel",
    "ConvEncoder",
    "BiGRU",
    "gru_sequence",
    "build_model",
    "HybridCnnGruModel",
]
