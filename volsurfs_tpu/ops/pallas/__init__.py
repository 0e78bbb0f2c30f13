"""Pallas TPU kernels for the hot paths."""

from volsurfs_tpu.ops.pallas import fused_mlp

__all__ = ["fused_mlp"]
