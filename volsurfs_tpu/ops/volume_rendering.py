"""Volume-rendering reductions over dense masked ray samples.

TPU-native re-design of the reference CUDA volume-rendering core
(src/VolumeRendering.cu, kernels/volsurfs/VolumeRenderingGPU.cuh and the
autograd wrappers in volsurfs_py/volume_rendering/volume_rendering_funcs.py):
every per-ray serial loop becomes a masked cumulative op along the samples
axis, differentiable through XLA's autodiff (the reference needed hand-written
CUDA backwards; XLA derives equivalent fused scans automatically).

All functions take [R, S] (or [R, S, C]) arrays plus a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from volsurfs_tpu.ops.samples import RaySamples, batched_searchsorted


def _scan_cumsum(x, axis=1):
    """Cumulative sum via lax.associative_scan: lowers to explicit
    slice/concat HLO instead of reduce-window. The TPU fusion emitter
    miscompiles the reduce-window lowering of jnp.cumsum/cumprod when
    several scans fuse across an interleaved axis (CHECK window_bounds ==
    strides in fusion_emitter.cc, hit by offsets_surfs' 5-surface render
    graph); the associative-scan form is immune and no slower."""
    return jax.lax.associative_scan(jnp.add, x, axis=axis)


def _scan_cumprod(x, axis=1):
    """Cumulative product via lax.associative_scan (see _scan_cumsum)."""
    return jax.lax.associative_scan(jnp.multiply, x, axis=axis)


def cumprod_one_minus_alpha_to_transmittance(one_minus_alpha, mask):
    """Exclusive cumulative product of (1 - alpha) along the samples axis.

    Matches reference kernels/volsurfs/VolumeRenderingGPU.cuh:28-79:
    ``T_i = prod_{j<i} oma_j`` over valid samples; ``bg_transmittance`` is the
    transmittance *at* the last valid sample (the last sample's own
    one_minus_alpha is never multiplied in).

    Args:
      one_minus_alpha: [R, S]
      mask: [R, S] bool, contiguous prefix per row.
    Returns:
      transmittance [R, S], bg_transmittance [R, 1]
    """
    oma = jnp.where(mask, one_minus_alpha, 1.0)
    inclusive = _scan_cumprod(oma, axis=1)
    transmittance = jnp.concatenate(
        [jnp.ones_like(inclusive[:, :1]), inclusive[:, :-1]], axis=1
    )
    # bg_T = T at the last valid index = prod over the first (count-1) omas.
    count = jnp.sum(mask, axis=1).astype(jnp.int32)
    last_idx = jnp.maximum(count - 1, 0)
    bg_transmittance = jnp.take_along_axis(
        transmittance, last_idx[:, None], axis=1
    )
    bg_transmittance = jnp.where(count[:, None] > 0, bg_transmittance, 1.0)
    return transmittance, bg_transmittance


def integrate(values, weights, mask):
    """Weighted sum of per-sample values along each ray.

    Dense version of integrate_with_weights_{1d,3d}
    (reference kernels/volsurfs/VolumeRenderingGPU.cuh:81-177); works for any
    channel count.

    Args:
      values:  [R, S, C]
      weights: [R, S] or [R, S, 1]
      mask:    [R, S]
    Returns: [R, C]
    """
    if weights.ndim == values.ndim:
        weights = weights[..., 0]
    w = jnp.where(mask, weights, 0.0)
    return jnp.einsum("rs,rsc->rc", w, values)


def sum_over_rays(values, mask):
    """Per-ray sum and per-sample broadcast of that sum.

    Dense version of VolumeRendering.sum_over_rays
    (reference src/VolumeRendering.cu:231+).

    Args:
      values: [R, S] or [R, S, 1]
      mask: [R, S]
    Returns: (sum_per_ray [R, 1], sum_per_sample [R, S])
    """
    if values.ndim == 3:
        values = values[..., 0]
    v = jnp.where(mask, values, 0.0)
    per_ray = jnp.sum(v, axis=1, keepdims=True)
    per_sample = jnp.broadcast_to(per_ray, values.shape)
    return per_ray, per_sample


def compute_cdf(weights, mask):
    """Exclusive cumsum of weights per ray (the sampling CDF).

    Matches reference kernels/volsurfs/VolumeRenderingGPU.cuh:412-473:
    cdf_i = sum_{j<i} w_j, and if the total weight is within 1e-3 of 1 the
    last valid entry is snapped to exactly 1.0. Invalid slots get 2.0 so a
    searchsorted over the dense row never selects them.
    """
    w = jnp.where(mask, weights if weights.ndim == 2 else weights[..., 0], 0.0)
    inclusive = _scan_cumsum(w, axis=1)
    cdf = jnp.concatenate(
        [jnp.zeros_like(inclusive[:, :1]), inclusive[:, :-1]], axis=1
    )
    total = jnp.sum(w, axis=1, keepdims=True)
    count = jnp.sum(mask, axis=1, keepdims=True).astype(jnp.int32)
    last_idx = jnp.maximum(count - 1, 0)
    snap = jnp.abs(total - 1.0) < 1e-3
    is_last = (
        jnp.arange(cdf.shape[1], dtype=jnp.int32)[None, :] == last_idx
    )
    cdf = jnp.where(snap & is_last & mask, 1.0, cdf)
    cdf = jnp.where(mask, cdf, 2.0)
    return cdf


def _map_range(x, in_start, in_end, out_start, out_end):
    """map_range_val semantics (reference volsurfs_py/utils/common.py:102-107):
    clamp input to the range; degenerate input range returns out_end."""
    x = jnp.clip(x, jnp.minimum(in_start, in_end), jnp.maximum(in_start, in_end))
    denom = in_end - in_start
    t = jnp.where(denom != 0.0, (x - in_start) / jnp.where(denom == 0.0, 1.0, denom), 1.0)
    return out_start + (out_end - out_start) * t


def importance_sample(
    samples: RaySamples,
    cdf,
    nr_importance_samples: int,
    key: jax.Array | None,
) -> RaySamples:
    """Inverse-CDF importance sampling of new depths per ray.

    Dense version of reference kernels/volsurfs/VolumeRenderingGPU.cuh:507-680:
    targets u_i = (i+1)/(n+1), optionally jittered by ±0.5/(n+1), clamped to
    (1e-6, 1-1e-6); the new depth is found by locating the first cdf entry
    above u and linearly interpolating z between the bracketing samples.

    Args:
      samples: the source samples (with cdf computed over them).
      cdf: [R, S] from :func:`compute_cdf` (invalid slots = 2.0).
      key: PRNG key for jitter, or None for deterministic midpoints.
    """
    R, S = cdf.shape
    n = nr_importance_samples
    spacing = 1.0 / (n + 1)
    u = spacing * (1.0 + jnp.arange(n, dtype=jnp.float32))[None, :]
    u = jnp.broadcast_to(u, (R, n))
    if key is not None:
        jitter = jax.random.uniform(key, (R, n), minval=-0.5, maxval=0.5)
        u = u + jitter * spacing
    u = jnp.clip(u, 1e-6, 1.0 - 1e-6)

    count = jnp.sum(samples.mask, axis=1, keepdims=True).astype(jnp.int32)
    # first index with cdf > u  (invalid slots are 2.0 > u, so the result is
    # bounded by the valid region; clamp like the reference binary search)
    imax = batched_searchsorted(cdf, u, side="right")
    imax = jnp.minimum(imax, jnp.maximum(count - 1, 0))
    imax = jnp.maximum(imax, 1)
    imin = imax - 1

    cdf_min = jnp.take_along_axis(cdf, imin, axis=1)
    cdf_max = jnp.take_along_axis(cdf, imax, axis=1)
    z_min = jnp.take_along_axis(samples.z, imin, axis=1)
    z_max = jnp.take_along_axis(samples.z, imax, axis=1)
    z_imp = _map_range(u, cdf_min, cdf_max, z_min, z_max)

    # a CDF needs at least 2 samples to bracket (the reference enforces
    # min_nr_samples_per_ray >= 3 when importance sampling; rays below that
    # would interpolate toward the INVALID_Z pad)
    valid = count >= 2
    mask = jnp.broadcast_to(valid, (R, n))
    z_imp = jnp.where(mask, z_imp, jnp.asarray(1e10, z_imp.dtype))
    # importance depths are monotone in u, so rows stay sorted
    out = RaySamples(
        z=z_imp,
        dt=jnp.zeros_like(z_imp),
        mask=mask,
        rays_o=samples.rays_o,
        rays_d=samples.rays_d,
        t_near=samples.t_near,
        t_far=samples.t_far,
        max_dt=samples.max_dt,
    )
    return out


def median_depth(samples: RaySamples, weights, threshold: float = 0.5):
    """Depth where the cumulative weight first reaches ``threshold``.

    Dense version of reference kernels/volsurfs/VolumeRenderingGPU.cuh:372-409
    (median_depth_over_rays); falls back to the last valid z if never reached.
    """
    w = jnp.where(samples.mask, weights if weights.ndim == 2 else weights[..., 0], 0.0)
    csum = _scan_cumsum(w, axis=1)
    reached = (csum >= threshold) & samples.mask
    S = samples.z.shape[1]
    first_idx = jnp.argmax(reached, axis=1)
    any_reached = jnp.any(reached, axis=1)
    count = jnp.sum(samples.mask, axis=1).astype(jnp.int32)
    last_idx = jnp.maximum(count - 1, 0)
    idx = jnp.where(any_reached, first_idx, last_idx)
    depth = jnp.take_along_axis(samples.z, idx[:, None], axis=1)
    return depth


def sdf2alpha(samples: RaySamples, sdf, logistic_beta):
    """NeuS alpha from consecutive-sample SDF pairs (for importance sampling).

    Matches reference kernels/volsurfs/VolumeRenderingGPU.cuh:185-244: for each
    valid pair (i, i+1): mid-point sdf, a clamped descent rate
    cos = clamp((sdf_{i+1}-sdf_i)/(dt_i+1e-6), -1e3, 0), section estimates
    mid ∓ cos*dt/2, and alpha_i = (Φ(prev)-Φ(next)+1e-6)/(Φ(prev)+1e-6) with
    Φ(x) = sigmoid(β x). The last valid sample of each ray gets alpha 0.

    Args:
      sdf: [R, S] or [R, S, 1]
      logistic_beta: scalar or [R, S]
    Returns: alpha [R, S]
    """
    if sdf.ndim == 3:
        sdf = sdf[..., 0]
    z = samples.z
    dt = samples.dt
    next_sdf = jnp.concatenate([sdf[:, 1:], sdf[:, -1:]], axis=1)
    next_valid = jnp.concatenate(
        [samples.mask[:, 1:], jnp.zeros_like(samples.mask[:, :1])], axis=1
    )
    pair_valid = samples.mask & next_valid

    mid_sdf = 0.5 * (sdf + next_sdf)
    cos_val = jnp.clip((next_sdf - sdf) / (dt + 1e-6), -1e3, 0.0)
    prev_esti = mid_sdf - cos_val * dt * 0.5
    next_esti = mid_sdf + cos_val * dt * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * logistic_beta)
    next_cdf = jax.nn.sigmoid(next_esti * logistic_beta)
    alpha = (prev_cdf - next_cdf + 1e-6) / (prev_cdf + 1e-6)
    return jnp.where(pair_valid, alpha, 0.0)


def neus_alpha_from_sdf_gradients(
    samples: RaySamples, sdf, gradients, cos_anneal_ratio, logistic_beta
):
    """Full NeuS alpha using analytic SDF gradients along rays.

    Matches reference
    volsurfs_py/volume_rendering/volume_rendering_modules.py:115-216
    (compute_alphas_from_logistic_beta) including the cos-annealing that keeps
    gradients alive early in training.

    Args:
      sdf:       [R, S] or [R, S, 1]
      gradients: [R, S, 3] SDF spatial gradients at the samples.
      cos_anneal_ratio: scalar in [0, 1].
      logistic_beta: scalar.
    Returns: alpha [R, S] (0 where invalid)
    """
    if sdf.ndim == 3:
        sdf = sdf[..., 0]
    dists = samples.dt
    dirs = samples.dirs()
    true_cos = jnp.sum(dirs * gradients, axis=-1)

    iter_cos = jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio) + (
        jax.nn.relu(-true_cos) * cos_anneal_ratio
    )
    iter_cos = -iter_cos  # always non-positive

    estimated_next_sdf = sdf + iter_cos * dists * 0.5
    estimated_prev_sdf = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(estimated_prev_sdf * logistic_beta)
    next_cdf = jax.nn.sigmoid(estimated_next_sdf * logistic_beta)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-6) / (prev_cdf + 1e-6), 0.0, 1.0)
    return jnp.where(samples.mask, alpha, 0.0)


def nerf_weights(samples: RaySamples, densities):
    """alpha = clip(1-exp(-sigma*dt)); weights = alpha * T.

    Matches reference volume_rendering_modules.py:94-106 (compute_weights),
    including the 1e-6 floor inside the cumprod.

    Returns: (weights [R, S], bg_transmittance [R, 1])
    """
    if densities.ndim == 3:
        densities = densities[..., 0]
    alpha = jnp.clip(1.0 - jnp.exp(-densities * samples.dt), 0.0, 1.0)
    alpha = jnp.where(samples.mask, alpha, 0.0)
    transmittance, bg_transmittance = cumprod_one_minus_alpha_to_transmittance(
        1.0 - alpha + 1e-6, samples.mask
    )
    weights = alpha * transmittance
    return weights, bg_transmittance


def neus_weights(samples: RaySamples, alpha):
    """transmittance from alphas (with the NeuS +1e-6 bias) and weights.

    Matches reference volume_rendering_modules.py:218-234.
    Returns: (weights [R, S], transmittance [R, S], bg_transmittance [R, 1])
    """
    alpha = jnp.where(samples.mask, alpha, 0.0)
    transmittance, bg_transmittance = cumprod_one_minus_alpha_to_transmittance(
        (1.0 - alpha) + 1e-6, samples.mask
    )
    weights = alpha * transmittance
    return weights, transmittance, bg_transmittance
