"""volsurfs_tpu: a TPU-native neural-rendering framework.

Re-implements the capabilities of the VolSurfs reference system
(CVPR 2025 "Volumetric Surfaces: Representing Fuzzy Geometries with
Layered Meshes") as a JAX / XLA / Pallas framework designed for TPU:

- dense ``[num_rays, num_samples]`` sample tensors with validity masks
  instead of CSR ray packets (reference: src/RaySamplesPacked.cu),
- occupancy-grid sampling expressed as gather + cumsum + searchsorted
  instead of per-thread DDA loops (reference: kernels/volsurfs/RaySamplerGPU.cuh),
- volume rendering as masked scans that XLA fuses (reference:
  src/VolumeRendering.cu + hand-written CUDA backwards),
- MLP fields on MXU-friendly fused matmuls, bf16 where it helps,
- multi-chip scaling via jax.sharding ray-sharding (the reference is
  single-GPU only).

Four methods are provided, mirroring the reference pipeline:
``nerf``, ``surf``, ``offsets_surfs``, ``volsurfs``.
"""

__version__ = "0.1.0"

import jax as _jax

# f32 matmul precision is load-bearing, not a tuning choice: TPUs default to
# bf16 matmul inputs, and the NeuS training math takes finite-difference SDF
# gradients with eps=1e-4 (reference utils/fields_utils.py:6-80) — an offset
# far below bf16 resolution, so default-precision normals are pure noise
# (measured ~15x relative error on v5e; the eikonal loss then destroys the
# SDF). The reference is an all-float32 CUDA codebase; this matches it.
# Renderer hot paths cast to bf16/fp16 explicitly where it is safe.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")
