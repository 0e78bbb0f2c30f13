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
