"""Custom TPU kernels (Pallas).

The reference delegates its hot ops to cuDNN (SURVEY.md §2 "Native
components"); here the recurrent bottleneck — the bidirectional GRU over the
conv-downsampled sequence (reference models.py:56-63) — gets a fused Pallas
kernel with VMEM-resident state and a custom VJP."""

from multimodalsignal_tpu.ops.gru_pallas import gru_sequence_pallas

__all__ = ["gru_sequence_pallas"]
