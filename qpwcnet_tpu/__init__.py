"""qpwcnet_tpu — a TPU-native optical-flow framework (JAX/XLA/Pallas).

Built from scratch with capability parity to the reference `yycho0108/qpwcnet`
(TF2/Keras PWC-Net-family stack): siamese feature-pyramid encoder, 81-offset
cost-volume correlation, bilinear feature warping, coarse-to-fine multiscale
flow decoding, a frame-interpolation pretraining task, flow-aware data
augmentation, AGC normalizer-free training, and an int8 QAT path.

Design (see SURVEY.md §7):
  - NHWC only; float32 params with optional bfloat16 compute.
  - One implementation per block (Flax linen); quantization by module
    injection, not graph surgery.
  - A single documented flow convention (`qpwcnet_tpu.ops.warp`).
  - Pallas VMEM-resident kernels for the hot ops with XLA fallbacks behind
    one API.
  - Data parallelism via jax.sharding.Mesh + NamedSharding from day one.
"""

__version__ = "0.1.0"
