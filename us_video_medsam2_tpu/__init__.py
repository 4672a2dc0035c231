"""us_video_medsam2_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for promptable
medical video segmentation with a streaming memory bank.

Re-provides, TPU-first, the capability surface of the US-Video-MedSAM2 reference
(a MedSAM2/SAM2 + EfficientTAM fork): Hiera/ViT image encoders with FPN necks, the
SAM prompt encoder + two-way mask decoder, RoPE memory attention over a fixed-shape
memory bank, interactive image/video predictors whose propagation loop is a single
`jax.lax.scan`, a pjit data-parallel trainer with interactive-prompt simulation and
temporal-consistency losses, and CLI entry points for 3D CT / RECIST NPZ / video eval.

This is a ground-up JAX design, not a port: layouts are NHWC/batch-first, control
flow is static-shape, and hot ops are Pallas kernels. Reference file:line citations
in docstrings point into the upstream repo for capability parity only.
"""

__version__ = "0.1.0"
