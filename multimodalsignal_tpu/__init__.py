"""multimodalsignal_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
cross-subject physiological emotion/stress recognition on WESAD-style data.

Re-designed from scratch with the capabilities of the reference PyTorch stack
(17LiQi/MultimodalSignal): signal preprocessing (resampling, windowing,
handcrafted features), dataset normalization, CNN+GRU+channel-attention model
families, an early-stopping trainer, and leave-one-subject-out cross-validation
— where the TPU-native win is that all LOSO folds train as one sharded
computation over a device mesh, and the hot kernels (GRU recurrence, conv
encoder, FFT resampling) run as fused XLA/Pallas programs.

Layer map (mirrors the reference's L0-L7, see SURVEY.md §1):
  data/        L1-L2: protocol parsing, resampling, windowing, features, datasets
  models/      L3: ChannelAttention, CnnGru, CnnGruAttention (flax.linen)
  ops/         Pallas kernels (fused GRU, ...)
  train/       L4: optimizer/metrics/trainer (optax + jitted steps)
  experiments/ L5: LOSOCV + hierarchical orchestration
  parallel/    fold-sweep sharding over a jax.sharding.Mesh
  analysis/    L6-L7: preprocess checker, feature importance, EDA plots
"""

__version__ = "0.1.0"

ALL_SUBJECTS = [f"S{i}" for i in range(2, 18) if i != 12]
