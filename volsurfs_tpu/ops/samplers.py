"""Ray sample generation (uniform, occupancy-warped, background, contraction).

TPU-native re-design of the reference CUDA samplers
(src/RaySampler.cu, kernels/volsurfs/RaySamplerGPU.cuh). The reference walks
each ray serially (one CUDA thread per ray, DDA through voxels). Here each
sampler is a dense, fully-vectorized formulation:

- uniform foreground sampling: equispaced depths with a jittered start
  (reference RaySamplerGPU.cuh compute_samples_fg, :150-280),
- occupancy-pruned sampling: the reference's two-pass DDA ("measure occupied
  arc length, then place equispaced samples inside occupied space") becomes
  gather (occupancy at K march points) + cumsum (arc length) + searchsorted
  (inverse arc-length lookup). Exactly the same sample placement in the
  K-step-discretized geometry, but one dense [R, K] computation instead of a
  divergent per-ray loop (reference RaySamplerGPU.cuh:274-489),
- background sampling: inverse-depth spacing t = 1/s - 1 from t_far to
  infinity (reference RaySamplerGPU.cuh:39-140),
- mip-NeRF-360 style scene contraction with scale 2
  (reference RaySamplerGPU.cuh:528-660).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from volsurfs_tpu.ops.samples import (
    INVALID_Z,
    RaySamples,
    batched_searchsorted,
    update_dt,
)


def _plan_sample_counts(dist, min_dist_between_samples, max_nr_samples, min_nr_samples):
    """Number of samples and spacing for a given traversal distance.

    Matches reference RaySamplerGPU.cuh:183-205 / :359-384:
    nr = clamp(dist/min_dist, 0, max); dist <= min_dist creates one sample;
    rays with fewer than min_nr samples get zero samples.
    Returns (nr [R,1] int32, const_dist [R,1] float).
    """
    nr_big = jnp.clip(
        (dist / min_dist_between_samples).astype(jnp.int32), 0, max_nr_samples
    )
    nr = jnp.where(
        dist <= 0.0,
        0,
        jnp.where(dist > min_dist_between_samples, nr_big, 1),
    )
    const_dist = jnp.where(
        nr > 0, dist / jnp.maximum(nr, 1).astype(dist.dtype), 0.0
    )
    nr = jnp.where(nr >= min_nr_samples, nr, 0)
    return nr.astype(jnp.int32), const_dist


def compute_samples_fg(
    rays_o,
    rays_d,
    t_near,
    t_far,
    min_dist_between_samples: float,
    min_nr_samples_per_ray: int,
    max_nr_samples_per_ray: int,
    key: jax.Array | None,
) -> RaySamples:
    """Equispaced foreground samples in [t_near, t_far], jittered start.

    Dense version of reference RaySamplerGPU.cuh compute_samples_fg: all
    samples of a ray share one spacing (so dt is constant), only the start
    offset is jittered (:214-221).
    """
    R = rays_o.shape[0]
    S = max_nr_samples_per_ray
    dist = t_far - t_near  # [R, 1]
    nr, const_dist = _plan_sample_counts(
        dist, min_dist_between_samples, S, min_nr_samples_per_ray
    )

    if key is not None:
        jitter = jax.random.uniform(key, (R, 1))
    else:
        jitter = jnp.zeros((R, 1))

    i = jnp.arange(S, dtype=jnp.float32)[None, :]
    z = t_near + (jitter + i) * const_dist
    mask = (i < nr.astype(jnp.float32)) & (z < t_far) & (nr > 0)
    z = jnp.clip(z, t_near, t_far)
    z = jnp.where(mask, z, INVALID_Z)

    out = RaySamples(
        z=z,
        dt=jnp.zeros_like(z),
        mask=mask,
        rays_o=rays_o,
        rays_d=rays_d,
        t_near=t_near,
        t_far=t_far,
        max_dt=const_dist,
    )
    return update_dt(out, is_background=False)


def rays_t_near_t_far_in_occupancy(
    rays_o,
    rays_d,
    t_near,
    t_far,
    occupancy_lookup,
    nr_probe_steps: int = 512,
):
    """Tighten each ray's [t_near, t_far] to its first/last occupied probe.

    TPU re-design of the reference's occupancy DDA ray clipping
    (kernels/volsurfs/OccupancyGridGPU.cuh:318-396 ``get_rays_t_near_t_far``):
    instead of a per-ray voxel walk, probe a fixed grid of step midpoints
    (one batched gather) and reduce to the first/last occupied index with
    argmax. Rays with no occupied probe collapse to an empty interval at
    t_near (0 samples downstream). Callers that gate a fine march on this
    clip must probe at least as finely as they march (same midpoint grid)
    so clipping can only tighten, never drop, spans the march would find.

    Returns (t_near' [R,1], t_far' [R,1]) with
    t_near <= t_near' <= t_far' <= t_far.
    """
    K0 = nr_probe_steps
    seg = (t_far - t_near) / K0  # [R, 1]
    k = jnp.arange(K0, dtype=jnp.float32)[None, :]
    t_mid = t_near + (k + 0.5) * seg  # [R, K0]
    pts = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
    R = rays_o.shape[0]
    occ = occupancy_lookup(pts.reshape(-1, 3)).reshape(R, K0)
    occ = occ & (seg > 0.0)
    any_occ = jnp.any(occ, axis=1, keepdims=True)
    first = jnp.argmax(occ, axis=1, keepdims=True).astype(jnp.float32)
    rev_idx = jnp.arange(K0 - 1, -1, -1, dtype=jnp.int32)
    last = (K0 - 1) - jnp.argmax(
        jnp.take(occ, rev_idx, axis=1), axis=1, keepdims=True
    ).astype(jnp.float32)
    t0 = t_near + first * seg
    t1 = t_near + (last + 1.0) * seg
    t0 = jnp.where(any_occ, t0, t_near)
    t1 = jnp.where(any_occ, t1, t_near)
    return t0, t1


def compute_samples_fg_in_occupied_regions(
    rays_o,
    rays_d,
    t_near,
    t_far,
    occupancy_lookup,
    min_dist_between_samples: float,
    min_nr_samples_per_ray: int,
    max_nr_samples_per_ray: int,
    key: jax.Array | None,
    nr_march_steps: int = 512,
    clip_to_occupancy: bool = False,
    nr_probe_steps: int | None = None,
) -> RaySamples:
    """Equispaced samples *within occupied space only*.

    The reference two-pass DDA (RaySamplerGPU.cuh:274-489) measures the
    distance a ray travels through occupied voxels, divides it into
    ``const_dist`` segments, then re-marches placing one sample per segment of
    occupied arc length (jittered start). Reformulated densely:

    1. march K fixed steps across [t_near, t_far]; look up occupancy at each
       step midpoint -> occ [R, K],
    2. occupied arc length after step k = cumsum(occ * step_len),
    3. target arc positions s_i = (jitter + i) * const_dist,
    4. invert the piecewise-linear arc-length function with searchsorted.

    Args:
      occupancy_lookup: callable [N, 3] -> [N] bool (grid occupancy & roi).
    """
    R = rays_o.shape[0]
    S = max_nr_samples_per_ray
    K = nr_march_steps

    if clip_to_occupancy:
        # occupancy pre-pass tightens the marched interval so the K fine
        # steps land at higher effective resolution (reference
        # OccupancyGridGPU.cuh:318-396 clips rays the same way before
        # sampling). The probe grid defaults to the SAME midpoint grid the
        # unclipped march would use, so every occupied midpoint the march
        # could find is also seen by the probe — clipping only tightens.
        t_near, t_far = rays_t_near_t_far_in_occupancy(
            rays_o, rays_d, t_near, t_far, occupancy_lookup,
            nr_probe_steps if nr_probe_steps is not None else K,
        )

    dist = t_far - t_near  # [R, 1]
    seg = dist / K  # [R, 1]
    k = jnp.arange(K, dtype=jnp.float32)[None, :]
    t_mid = t_near + (k + 0.5) * seg  # [R, K]
    pts = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
    occ = occupancy_lookup(pts.reshape(-1, 3)).reshape(R, K)
    occ = occ & (seg > 0.0)

    occf = occ.astype(jnp.float32)
    # associative_scan: no reduce-window (TPU fusion-emitter CHECK, see
    # ops/volume_rendering._scan_cumsum)
    arc_incl = jax.lax.associative_scan(
        jnp.add, occf * seg, axis=1
    )  # arc length at END of step k
    total_arc = arc_incl[:, -1:]

    nr, const_dist = _plan_sample_counts(
        total_arc, min_dist_between_samples, S, min_nr_samples_per_ray
    )

    if key is not None:
        jitter = jax.random.uniform(key, (R, 1))
    else:
        jitter = jnp.zeros((R, 1))

    i = jnp.arange(S, dtype=jnp.float32)[None, :]
    s_target = (jitter + i) * const_dist  # [R, S]
    # first step whose inclusive arc exceeds the target
    idx = batched_searchsorted(arc_incl, s_target, side="right")
    idx = jnp.minimum(idx, K - 1)
    arc_before = jnp.take_along_axis(arc_incl, idx, axis=1) - jnp.take_along_axis(
        occf, idx, axis=1
    ) * seg
    t_step_start = t_near + idx.astype(jnp.float32) * seg
    z = t_step_start + (s_target - arc_before)
    z = jnp.clip(z, t_near, t_far)

    mask = (i < nr.astype(jnp.float32)) & (nr > 0) & (s_target < total_arc)
    z = jnp.where(mask, z, INVALID_Z)

    out = RaySamples(
        z=z,
        dt=jnp.zeros_like(z),
        mask=mask,
        rays_o=rays_o,
        rays_d=rays_d,
        t_near=t_near,
        t_far=t_far,
        max_dt=const_dist,
    )
    return update_dt(out, is_background=False)


def compute_samples_bg(
    rays_o,
    rays_d,
    t_start,
    nr_samples_per_ray: int,
    t_far: float = 100.0,
    key: jax.Array | None = None,
) -> RaySamples:
    """Background samples with inverse-depth spacing out to t_far.

    Matches reference RaySamplerGPU.cuh:39-140 (compute_samples_bg):
    s walks from 1 to 0 in steps of 1/(N-1); t = clamp(1/(s+1e-6) - 1 +
    t_start, t_start, t_far); middle samples are jittered by lerp toward the
    previous sample.
    """
    R = rays_o.shape[0]
    N = nr_samples_per_ray
    eps = 1e-6
    delta_s = 1.0 / (N - 1)
    s = 1.0 - delta_s * jnp.arange(N, dtype=jnp.float32)[None, :]
    t = 1.0 / (s + eps) - 1.0 + t_start  # [R, N]
    t = jnp.clip(t, t_start, t_far)

    if key is not None:
        interp = jax.random.uniform(key, (R, N))
        t_prev = jnp.concatenate([t_start * jnp.ones_like(t[:, :1]), t[:, :-1]], axis=1)
        jittered = t_prev + (t - t_prev) * interp
        is_middle = (jnp.arange(N)[None, :] > 0) & (jnp.arange(N)[None, :] < N - 1)
        t = jnp.where(is_middle, jittered, t)

    dt = jnp.diff(t, axis=1, prepend=t_start * jnp.ones_like(t[:, :1]))
    max_dt = jnp.max(dt, axis=1, keepdims=True)

    mask = jnp.ones((R, N), dtype=bool)
    out = RaySamples(
        z=t,
        dt=jnp.zeros_like(t),
        mask=mask,
        rays_o=rays_o,
        rays_d=rays_d,
        t_near=jnp.broadcast_to(jnp.asarray(t_start, jnp.float32), (R, 1)),
        t_far=jnp.full((R, 1), t_far, dtype=jnp.float32),
        max_dt=max_dt,
    )
    return update_dt(out, is_background=True)


def contract_points(points, scale: float = 2.0):
    """mip-NeRF-360 style contraction (reference RaySamplerGPU.cuh:528-594).

    Points with |scale*p| <= 1 are unchanged; outside, p' = (2 - 1/n) * p / n
    with n = |scale*p| (maps all of space into the radius-2/scale ball).
    """
    norm = jnp.linalg.norm(points * scale, axis=-1, keepdims=True)
    factor = 2.0 - 1.0 / jnp.maximum(norm, 1e-12)
    contracted = factor * points / jnp.maximum(norm, 1e-12)
    return jnp.where(norm > 1.0, contracted, points)


def uncontract_points(points, scale: float = 2.0):
    """Inverse of :func:`contract_points` (reference RaySamplerGPU.cuh:596-660)."""
    norm = jnp.linalg.norm(points * scale, axis=-1, keepdims=True)
    factor = 1.0 / jnp.maximum(2.0 - norm, 1e-12)
    uncontracted = factor * points / jnp.maximum(norm, 1e-12)
    return jnp.where(norm > 1.0, uncontracted, points)


def contract_samples(samples: RaySamples, scale: float = 2.0):
    """Contract sample positions; z becomes distance from origin to the
    contracted point (reference RaySamplerGPU.cuh contract_samples_gpu).

    Returns (contracted positions [R, S, 3], contracted RaySamples whose z/dt
    reflect contracted-space spacing).
    """
    pos = samples.positions()
    cpos = contract_points(pos, scale)
    cz = jnp.linalg.norm(cpos - samples.rays_o[:, None, :], axis=-1)
    cz = jnp.where(samples.mask, cz, INVALID_Z)
    out = samples.replace(z=cz)
    out = update_dt(out, is_background=True)
    return cpos, out
