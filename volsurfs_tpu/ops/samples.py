"""Dense per-ray sample containers.

The reference keeps variable-length per-ray sample lists in a CSR-packed
layout (``RaySamplesPacked``, reference include/volsurfs/RaySamplesPacked.cuh:55-80,
src/RaySamplesPacked.cu) because CUDA favours compaction. On TPU the idiomatic
layout is a dense ``[num_rays, max_samples]`` tensor pair (values + validity
mask): every op becomes a masked vectorized op or a scan along the samples
axis, shapes stay static for XLA, and the MXU sees large contiguous batches.

Invariant maintained everywhere: **valid samples form a contiguous prefix of
the samples axis and are sorted by depth z**. Invalid slots hold
``INVALID_Z`` so a plain sort restores the invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

# depth value stored in invalid sample slots; sorts after any real sample
INVALID_Z = 1e10


def batched_searchsorted(bins, queries, side: str = "right"):
    """Row-wise searchsorted: bins [R, K] (each row sorted), queries [R, S].

    jnp.searchsorted only accepts 1-D bins; vmap over rows keeps the
    O(S log K) binary search and vectorizes across rays.
    """
    return jax.vmap(
        lambda b, q: jnp.searchsorted(b, q, side=side)
    )(bins, queries).astype(jnp.int32)


@struct.dataclass
class RaySamples:
    """A batch of rays with up to S samples each (dense, masked).

    Attributes:
      z:      [R, S] sample depths along each ray (ascending; INVALID_Z pad).
      dt:     [R, S] distance to the next sample (see :func:`update_dt`).
      mask:   [R, S] bool validity mask (contiguous prefix per row).
      rays_o: [R, 3] ray origins.
      rays_d: [R, 3] ray directions (unit length).
      t_near: [R, 1] entry distance of the ray into the sampled region.
      t_far:  [R, 1] exit distance.
      max_dt: [R, 1] per-ray nominal inter-sample spacing; dt is clamped to it
              (mirrors ``ray_max_dt``, reference kernels/volsurfs/RaySamplesPackedGPU.cuh:44-67).
    """

    z: jnp.ndarray
    dt: jnp.ndarray
    mask: jnp.ndarray
    rays_o: jnp.ndarray
    rays_d: jnp.ndarray
    t_near: jnp.ndarray
    t_far: jnp.ndarray
    max_dt: jnp.ndarray

    @property
    def num_rays(self) -> int:
        return self.z.shape[0]

    @property
    def max_samples(self) -> int:
        return self.z.shape[1]

    def positions(self) -> jnp.ndarray:
        """[R, S, 3] world-space sample positions (computed, not stored)."""
        return self.rays_o[:, None, :] + self.z[..., None] * self.rays_d[:, None, :]

    def dirs(self) -> jnp.ndarray:
        """[R, S, 3] per-sample ray directions (broadcast of rays_d)."""
        return jnp.broadcast_to(
            self.rays_d[:, None, :], (*self.z.shape, 3)
        )

    def samples_per_ray(self) -> jnp.ndarray:
        """[R, 1] int32 number of valid samples per ray."""
        return jnp.sum(self.mask, axis=1, keepdims=True).astype(jnp.int32)

    def any_samples(self) -> jnp.ndarray:
        """scalar bool: does any ray have at least one valid sample."""
        return jnp.any(self.mask)


def make_empty(num_rays: int, max_samples: int) -> RaySamples:
    z = jnp.full((num_rays, max_samples), INVALID_Z, dtype=jnp.float32)
    return RaySamples(
        z=z,
        dt=jnp.zeros_like(z),
        mask=jnp.zeros_like(z, dtype=bool),
        rays_o=jnp.zeros((num_rays, 3), dtype=jnp.float32),
        rays_d=jnp.zeros((num_rays, 3), dtype=jnp.float32),
        t_near=jnp.zeros((num_rays, 1), dtype=jnp.float32),
        t_far=jnp.zeros((num_rays, 1), dtype=jnp.float32),
        max_dt=jnp.zeros((num_rays, 1), dtype=jnp.float32),
    )


def update_dt(samples: RaySamples, is_background: bool = False) -> RaySamples:
    """Recompute dt_i = clamp(z_{i+1} - z_i, 0, max_dt).

    The last valid sample of each ray gets ``clamp(t_far - z_last, 0, max_dt)``
    for foreground rays, or ``1e10`` for background rays (matching
    reference kernels/volsurfs/RaySamplesPackedGPU.cuh:49-87).
    """
    z = jnp.where(samples.mask, samples.z, INVALID_Z)
    next_z = jnp.concatenate(
        [z[:, 1:], jnp.full_like(z[:, :1], INVALID_Z)], axis=1
    )
    next_valid = jnp.concatenate(
        [samples.mask[:, 1:], jnp.zeros_like(samples.mask[:, :1])], axis=1
    )
    is_last_valid = samples.mask & ~next_valid

    dt_mid = jnp.clip(next_z - z, 0.0, samples.max_dt)
    if is_background:
        dt_last = jnp.full_like(z, 1e10)
    else:
        dt_last = jnp.clip(samples.t_far - z, 0.0, samples.max_dt)
    dt = jnp.where(is_last_valid, dt_last, dt_mid)
    dt = jnp.where(samples.mask, dt, 0.0)
    return samples.replace(dt=dt)


def sort_by_z(samples: RaySamples, values: jnp.ndarray | None = None):
    """Sort samples of each ray by depth, pushing invalid slots to the end.

    Args:
      values: optional [R, S, C] per-sample payload to permute identically.
    Returns:
      (sorted RaySamples, sorted values or None)
    """
    z_key = jnp.where(samples.mask, samples.z, INVALID_Z)
    order = jnp.argsort(z_key, axis=1)
    z = jnp.take_along_axis(z_key, order, axis=1)
    mask = jnp.take_along_axis(samples.mask, order, axis=1)
    dt = jnp.take_along_axis(samples.dt, order, axis=1)
    out = samples.replace(z=z, mask=mask, dt=dt)
    if values is None:
        return out, None
    v = jnp.take_along_axis(values, order[..., None], axis=1)
    return out, v


def combine(
    a: RaySamples,
    b: RaySamples,
    min_dist_between_samples: float,
    values_a: jnp.ndarray | None = None,
    values_b: jnp.ndarray | None = None,
):
    """Merge two sample sets per ray, sorted by z, deduplicating near-equal z.

    Dense equivalent of ``VolumeRendering.combine_ray_samples_packets``
    (reference src/VolumeRendering.cu:556-670,
    kernels/volsurfs/VolumeRenderingGPU.cuh:681-895): the merged list is
    z-sorted and a sample closer than ``min_dist_between_samples`` to its
    predecessor is dropped. Output sample capacity is S_a + S_b (static).

    Returns (combined RaySamples, combined values or None).
    """
    z = jnp.concatenate(
        [
            jnp.where(a.mask, a.z, INVALID_Z),
            jnp.where(b.mask, b.z, INVALID_Z),
        ],
        axis=1,
    )
    mask = jnp.concatenate([a.mask, b.mask], axis=1)
    order = jnp.argsort(z, axis=1)
    z = jnp.take_along_axis(z, order, axis=1)
    mask = jnp.take_along_axis(mask, order, axis=1)

    values = None
    if values_a is not None or values_b is not None:
        assert values_a is not None and values_b is not None
        values = jnp.concatenate([values_a, values_b], axis=1)
        values = jnp.take_along_axis(values, order[..., None], axis=1)

    # dedup: drop a sample closer than min_dist to the previously KEPT one —
    # the reference's sequential keep-chain semantics
    # (VolumeRenderingGPU.cuh:681-895). The recurrence (last-kept z) is
    # inherently sequential, so it runs as a lax.scan over the static sample
    # axis with an [R] carry: S is ~100, each step is a trivial elementwise
    # op, so the scan costs ~nothing next to the field evaluations.
    def dedup_step(last_kept_z, zi_mi):
        z_i, m_i = zi_mi
        keep = m_i & ((z_i - last_kept_z) >= min_dist_between_samples)
        return jnp.where(keep, z_i, last_kept_z), keep

    _, keeps = jax.lax.scan(
        dedup_step,
        jnp.full(z.shape[:1], -1e10, z.dtype),
        (z.T, mask.T),
    )
    mask = keeps.T

    # restore contiguous-prefix invariant
    z = jnp.where(mask, z, INVALID_Z)
    order2 = jnp.argsort(z, axis=1)
    z = jnp.take_along_axis(z, order2, axis=1)
    mask = jnp.take_along_axis(mask, order2, axis=1)
    if values is not None:
        values = jnp.take_along_axis(values, order2[..., None], axis=1)

    out = RaySamples(
        z=z,
        dt=jnp.zeros_like(z),
        mask=mask,
        rays_o=a.rays_o,
        rays_d=a.rays_d,
        t_near=a.t_near,
        t_far=a.t_far,
        max_dt=jnp.maximum(a.max_dt, b.max_dt),
    )
    out = update_dt(out, is_background=False)
    return out, values
