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
):
    """March rays along the SDF until |sdf| < threshold or they exit.

    Args:
      sdf_fn: [N, 3] -> [N, 1] (or tuple with that first).
    Returns dict: positions [N, 3], z [N, 1], is_hit [N], steps (scalar).
    """
    raycast = intersect_bounding_primitive(bounding_primitive, rays_o, rays_d)
    pos0 = raycast["points_near"]

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
        step = jnp.where(converged[:, None], 0.0, sdf * sdf_multiplier)
        new_pos = pos + rays_d * step
        newly_hit = (jnp.abs(sdf[:, 0]) < sdf_converged_tresh) & ~converged
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
        ~raycast["is_hit"],  # rays missing the bounding primitive never trace
    )
    steps, pos, hit, converged = jax.lax.while_loop(cond, body, init)
    if unconverged_are_hits:
        hit = hit | ~converged
    z = jnp.linalg.norm(pos - rays_o, axis=-1, keepdims=True)
    return {"positions": pos, "z": z, "is_hit": hit, "steps": steps}
