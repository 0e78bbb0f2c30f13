"""Pallas TPU kernels.

Note: a fused-MLP kernel (tiny-cuda-nn FullyFusedMLP analogue) was built,
tested and benchmarked here in rounds 1-2 and then REMOVED: on v5e, plain
XLA beat it on every production MLP shape (e.g. texture 64x2 @49k samples:
0.76 ms vs 0.81 ms; @262k: 1.52 ms vs 3.12 ms) because XLA already fuses
these small chains and the kernel's 128-lane padding wastes the MXU on
32-wide layers. See RESULTS.md.
"""

from volsurfs_tpu.ops.pallas import scatter_add

__all__ = ["scatter_add"]
