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
):
    """March rays along the SDF until |sdf| < threshold or they exit.

    Args:
      sdf_fn: [N, 3] -> [N, 1] (or tuple with that first).
      occupancy_grid: optional OccupancyGrid enabling grid-assisted tracing
        (reference kernels/volsurfs/OccupancyGridGPU.cuh:505-584
        ``advance_sample_to_next_occupied_voxel``): rays start at their first
        occupied probe instead of the bounding primitive, inside unoccupied
        voxels the step is at least the distance to the voxel exit (the voxel
        is known empty, so this never skips a surface), and hits only count
        in occupied voxels (spurious far-field zero crossings are skipped).
    Returns dict: positions [N, 3], z [N, 1], is_hit [N], steps (scalar).
    """
    raycast = intersect_bounding_primitive(bounding_primitive, rays_o, rays_d)
    pos0 = raycast["points_near"]
    never_trace = ~raycast["is_hit"]  # rays missing the bounding primitive

    if occupancy_grid is not None:
        from volsurfs_tpu.ops.samplers import rays_t_near_t_far_in_occupancy

        t0, t1 = rays_t_near_t_far_in_occupancy(
            rays_o, rays_d, raycast["t_near"], raycast["t_far"],
            occupancy_grid.check_occupancy,
        )
        pos0 = rays_o + t0 * rays_d
        # empty occupied span along the whole ray -> guaranteed miss
        never_trace = never_trace | (t1 <= t0)[:, 0]

        extent = occupancy_grid.extent
        res = occupancy_grid.res
        vox = extent / res  # [3]
        eps_skip = 1e-3 * jnp.min(vox)

        def empty_space_skip(pos):
            """Distance along the ray to exit the current (empty) voxel."""
            coords = jnp.floor((pos / extent + 0.5) * res)
            lower = (coords / res - 0.5) * extent  # [N, 3] voxel lower corner
            d = rays_d
            t_exit = jnp.where(
                d > 0.0,
                (lower + vox - pos) / jnp.where(d > 0.0, d, 1.0),
                jnp.where(
                    d < 0.0,
                    (lower - pos) / jnp.where(d < 0.0, d, 1.0),
                    jnp.inf,
                ),
            )  # [N, 3] per-axis exit distances
            return jnp.min(t_exit, axis=-1, keepdims=True) + eps_skip

    def eval_sdf(p):
        res = sdf_fn(p)
        sdf = res[0] if isinstance(res, tuple) else res
        if sdf.ndim > 1 and sdf.shape[-1] > 1:
            sdf = sdf[..., 0:1]
        return sdf

    def cond(state):
        i, pos, hit, converged = state
        return (i < nr_sphere_traces) & jnp.any(~converged)

    def body(state):
        i, pos, hit, converged = state
        sdf = eval_sdf(pos)
        step = sdf * sdf_multiplier
        in_occ = None
        if occupancy_grid is not None:
            in_occ = occupancy_grid.check_occupancy(pos)
            # empty voxel: free to jump at least to its exit boundary
            step = jnp.where(
                in_occ[:, None], step, jnp.maximum(step, empty_space_skip(pos))
            )
        step = jnp.where(converged[:, None], 0.0, step)
        new_pos = pos + rays_d * step
        newly_hit = (jnp.abs(sdf[:, 0]) < sdf_converged_tresh) & ~converged
        if in_occ is not None:
            newly_hit = newly_hit & in_occ
        hit = hit | newly_hit
        inside = bounding_primitive.contains(new_pos)
        converged = converged | newly_hit | ~inside
        pos = jnp.where(converged[:, None], pos, new_pos)
        # keep the hit position exact for newly hit rays
        pos = jnp.where(newly_hit[:, None], new_pos, pos)
        return i + 1, pos, hit, converged

    n = rays_o.shape[0]
    init = (
        jnp.asarray(0, jnp.int32),
        pos0,
        jnp.zeros((n,), bool),
        never_trace,
    )
    steps, pos, hit, converged = jax.lax.while_loop(cond, body, init)
    if unconverged_are_hits:
        hit = hit | ~converged
    z = jnp.linalg.norm(pos - rays_o, axis=-1, keepdims=True)
    return {"positions": pos, "z": z, "is_hit": hit, "steps": steps}
