"""Sphere tracing for SDF surface rendering at test time.

TPU-native re-design of reference volsurfs_py/utils/sphere_tracing.py:10-170.
The reference compacts unconverged rays each iteration (dynamic shapes); here
all rays step in lockstep under a lax.while_loop with a converged mask — the
idiomatic XLA treatment, and on TPU the masked extra evaluations are free
compared to a recompaction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from volsurfs_tpu.ops.raycast import intersect_bounding_primitive


def sphere_trace(
    sdf_fn,
    rays_o,
    rays_d,
    bounding_primitive,
    nr_sphere_traces: int = 30,
    sdf_converged_tresh: float = 1e-4,
    sdf_multiplier: float = 1.0,
    unconverged_are_hits: bool = False,
    occupancy_grid=None,
    min_step: float = 0.0,
):
    """March rays along the SDF until |sdf| < threshold or they exit.

    Args:
      sdf_fn: [N, 3] -> [N, 1] (or tuple with that first).
      occupancy_grid: optional OccupancyGrid enabling grid-assisted tracing
        (reference kernels/volsurfs/OccupancyGridGPU.cuh:505-584
        ``advance_sample_to_next_occupied_voxel``): rays start at their entry
        into the tight AABB of occupied voxels, inside unoccupied voxels the
        step is at least the distance to the voxel exit — or to the exit of
        the whole 4³ block when a coarse pooled grid marks it empty too —
        and threshold hits only count in occupied voxels (spurious far-field
        zero crossings are skipped).
      min_step: floor on marching step length (0 disables). Bounds the step
        count grazing rays need; safe because crossings are bracket-refined.
    Returns dict: positions [N, 3], z [N, 1], is_hit [N], steps (scalar).
    """
    raycast = intersect_bounding_primitive(bounding_primitive, rays_o, rays_d)
    pos0 = raycast["points_near"]
    never_trace = ~raycast["is_hit"]  # rays missing the bounding primitive

    if occupancy_grid is not None:
        extent = occupancy_grid.extent
        res = occupancy_grid.res
        vox = extent / res  # [3]
        eps_skip = 1e-3 * jnp.min(vox)
        occ3 = occupancy_grid.occupancy & occupancy_grid.roi

        # Start rays at their entry into the tight AABB of occupied voxels.
        # One O(res^3) reduction shared by all rays — replacing the old
        # per-ray 512-probe occupied-span scan, which alone cost ~1.0 s
        # per 256^2 frame (measured; 33M single-bool gathers). The box is
        # looser than the exact first-occupied-voxel start, and the
        # two-level empty-space skip below crosses the residual gap in a
        # handful of near-free steps.
        idx_axes = [(1, 2), (0, 2), (0, 1)]
        lo_i, hi_i = [], []
        for ax in idx_axes:
            m = jnp.any(occ3, axis=ax)
            lo_i.append(jnp.argmax(m))
            hi_i.append(res - 1 - jnp.argmax(m[::-1]))
        lo_i = jnp.stack(lo_i)
        hi_i = jnp.stack(hi_i)
        nonempty = jnp.any(occ3)
        box_lo = (lo_i.astype(jnp.float32) / res - 0.5) * extent
        box_hi = ((hi_i.astype(jnp.float32) + 1.0) / res - 0.5) * extent
        d_safe = jnp.where(jnp.abs(rays_d) > 1e-9, rays_d, 1e-9)
        ta = (box_lo[None, :] - rays_o) / d_safe
        tb = (box_hi[None, :] - rays_o) / d_safe
        t_box_lo = jnp.max(jnp.minimum(ta, tb), axis=-1, keepdims=True)
        t_box_hi = jnp.min(jnp.maximum(ta, tb), axis=-1, keepdims=True)
        t_enter = jnp.maximum(raycast["t_near"], t_box_lo)
        t_exit_b = jnp.minimum(raycast["t_far"], t_box_hi)
        box_hit = (t_exit_b > t_enter)[:, 0] & nonempty
        pos0 = jnp.where(
            box_hit[:, None], rays_o + (t_enter + eps_skip) * rays_d, pos0
        )
        # no overlap with the occupied box -> guaranteed miss
        never_trace = never_trace | ~box_hit

        # coarse 4^3-block pooling: inside the box but far from the
        # surface, skip whole blocks per step instead of single voxels
        C = 4 if res % 4 == 0 else 1
        res_c = res // C
        coarse = occ3.reshape(res_c, C, res_c, C, res_c, C).any(axis=(1, 3, 5))

        def _exit_dist(pos, grid_res):
            """Per-ray distance to exit the current grid cell."""
            cell = extent / grid_res
            coords = jnp.floor((pos / extent + 0.5) * grid_res)
            lower = (coords / grid_res - 0.5) * extent  # [N, 3] cell corner
            d = rays_d
            t_exit = jnp.where(
                d > 0.0,
                (lower + cell - pos) / jnp.where(d > 0.0, d, 1.0),
                jnp.where(
                    d < 0.0,
                    (lower - pos) / jnp.where(d < 0.0, d, 1.0),
                    jnp.inf,
                ),
            )  # [N, 3] per-axis exit distances
            return jnp.min(t_exit, axis=-1, keepdims=True)

        def empty_space_skip(pos):
            """Exit of the current empty voxel — or of the whole 4^3 block
            when the coarse grid marks it empty too."""
            fine = _exit_dist(pos, res)
            if C == 1:
                return fine + eps_skip
            cc = jnp.clip(
                jnp.floor((pos / extent + 0.5) * res_c).astype(jnp.int32),
                0,
                res_c - 1,
            )
            block_occ = coarse[cc[:, 0], cc[:, 1], cc[:, 2]]
            skip = jnp.where(
                block_occ[:, None], fine, _exit_dist(pos, res_c)
            )
            return skip + eps_skip

    def eval_sdf(p):
        res = sdf_fn(p)
        sdf = res[0] if isinstance(res, tuple) else res
        if sdf.ndim > 1 and sdf.shape[-1] > 1:
            sdf = sdf[..., 0:1]
        return sdf

    # March parametrized by t along the ray; pos = rays_o + t * rays_d.
    # Every ray is in one of two modes:
    #   marching — classic sphere trace steps (plus empty-space skips and
    #     the min_step floor);
    #   refining — the ray has BRACKETED a sign change [t_lo, t_hi] and
    #     runs false-position (secant-bracket) iterations until
    #     |sdf| < thresh or the bracket collapses.
    # Zero-crossing capture is the TPU-side improvement over the
    # reference's naive march (reference sphere_tracing.py:10-170): a
    # learned SDF is not an exact distance function, so |sdf|-sized steps
    # routinely overshoot the surface; rays then oscillate and never reach
    # |sdf| < thresh (measured at 256²: 46% of volumetric-surface pixels
    # missed -> 13 dB renders). A sign flip between consecutive probes
    # PROVES a crossing; false-position then polishes the hit to the
    # threshold in ~2-4 extra evals that ride along with the same lockstep
    # loop the unconverged stragglers keep alive anyway (a single secant
    # interpolation of a wide bracket measures err(hit) 0.0090 vs 0.0060
    # refined — ~1 dB of the final image).
    t0_all = jnp.sum((pos0 - rays_o) * rays_d, axis=-1)

    def cond(state):
        i = state[0]
        converged = state[-1]
        return (i < nr_sphere_traces) & jnp.any(~converged)

    def body(state):
        i, t, t_lo, s_lo, t_hi, s_hi, refining, hit, converged = state
        pos = rays_o + t[:, None] * rays_d
        sdf1 = eval_sdf(pos)[:, 0]

        # marching ray whose probe turned negative: the surface is
        # bracketed between the last (positive) probe and this one
        crossed = (
            (sdf1 < 0.0) & (s_lo > 0.0) & (s_lo < 1e9) & ~refining & ~converged
        )
        # first probe already inside (start point on/inside the surface,
        # e.g. an occupied-AABB face touching geometry): immediate hit
        start_inside = (sdf1 < 0.0) & (s_lo > 1e9) & ~refining & ~converged

        thresh_hit = (
            (jnp.abs(sdf1) < sdf_converged_tresh) | start_inside
        ) & ~converged
        in_occ = None
        if occupancy_grid is not None:
            # Occupancy gates only THRESHOLD hits of marching rays
            # (spurious far-field near-zeros get skipped, as in the
            # reference's occupied-only hit rule). Bracketed rays are
            # deliberately NOT gated: a +/- flip between probes is direct
            # evidence of a surface, while the grid is a lossy
            # accelerator — measured on the 256² run, ~2/3 of the
            # crossing points the gate would veto sit in voxels the
            # trained grid wrongly marks empty (silhouette voxels
            # thresholded out), costing 3-5 dB. (The reference never
            # faces this choice: its grid-assisted path is hardcoded off
            # at sphere_tracing.py:35.)
            in_occ = occupancy_grid.check_occupancy(pos)
            thresh_hit = thresh_hit & (in_occ | refining)

        # ---- bracket update (refining rays + rays entering refinement) --
        neg = sdf1 < 0.0
        # refining: the new probe replaces the same-signed bracket end
        b_t_lo = jnp.where(refining & ~neg, t, t_lo)
        b_s_lo = jnp.where(refining & ~neg, sdf1, s_lo)
        b_t_hi = jnp.where(refining & neg, t, t_hi)
        b_s_hi = jnp.where(refining & neg, sdf1, s_hi)
        # entering: bracket = [last outside probe, this inside probe]
        b_t_hi = jnp.where(crossed, t, b_t_hi)
        b_s_hi = jnp.where(crossed, sdf1, b_s_hi)
        now_refining = refining | crossed

        # false-position probe inside the bracket (clipped toward the
        # interior so a flat end cannot stall the contraction)
        denom = jnp.maximum(b_s_lo - b_s_hi, 1e-12)
        frac = jnp.clip(b_s_lo / denom, 0.05, 0.95)
        t_secant = b_t_lo + frac * (b_t_hi - b_t_lo)
        bracket_done = (b_t_hi - b_t_lo) < 1e-5

        # ---- marching rays: classic step with floor and skips ----
        step = sdf1 * sdf_multiplier
        if min_step > 0.0:
            # Grazing rays otherwise take O(|sdf|)-sized steps through the
            # near field and pin the lockstep loop at its cap (the whole
            # frame pays for the slowest ray). A step floor bounds the
            # worst case; the crossing detector keeps it safe — a floored
            # step that lands inside the surface still flips the sign and
            # gets bracket-refined. Only rays piercing a sliver thinner
            # than min_step along the ray can slip through (penetration
            # < min_step²·curvature/8 — sub-pixel at these settings).
            step = jnp.where(step > 0.0, jnp.maximum(step, min_step), step)
        if occupancy_grid is not None:
            # empty voxel/block: free to jump at least to its exit
            step = jnp.where(
                in_occ, step, jnp.maximum(step, empty_space_skip(pos)[:, 0])
            )
        t_march = t + step

        newly_hit = (thresh_hit | (now_refining & bracket_done)) & ~converged

        # marching bookkeeping: remember this (outside) probe for the
        # next crossing test
        next_t_lo = jnp.where(now_refining, b_t_lo, t)
        next_s_lo = jnp.where(now_refining, b_s_lo, sdf1)

        t_next = jnp.where(now_refining, t_secant, t_march)
        pos_next = rays_o + t_next[:, None] * rays_d
        inside = bounding_primitive.contains(pos_next)
        newly_conv = newly_hit | (~inside & ~now_refining)

        hit = hit | newly_hit
        t_new = jnp.where(converged | newly_conv, t, t_next)
        converged = converged | newly_conv
        refining = now_refining & ~converged
        return (
            i + 1, t_new, next_t_lo, next_s_lo, b_t_hi, b_s_hi,
            refining, hit, converged,
        )

    n = rays_o.shape[0]
    init = (
        jnp.asarray(0, jnp.int32),
        t0_all,
        t0_all,
        jnp.full((n,), 1e10, jnp.float32),
        jnp.full((n,), 1e10, jnp.float32),
        jnp.full((n,), -1e10, jnp.float32),
        jnp.zeros((n,), bool),
        jnp.zeros((n,), bool),
        never_trace,
    )
    steps, t, _, _, _, _, refining, hit, converged = jax.lax.while_loop(
        cond, body, init
    )
    # rays still refining when the step cap hits have a PROVEN bracket —
    # they are hits at the current secant estimate, just less polished
    hit = hit | refining
    if unconverged_are_hits:
        hit = hit | ~converged
    pos = rays_o + t[:, None] * rays_d
    z = t[:, None]
    return {"positions": pos, "z": z, "is_hit": hit, "steps": steps}
