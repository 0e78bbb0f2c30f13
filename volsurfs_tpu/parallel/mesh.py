"""Multi-chip scaling: data-parallel ray sharding over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.1/§5.8: no
torch.distributed anywhere; fleet parallelism is one-scene-per-GPU bash).
The TPU-native scalable axis is rays: shard ray batches over a 1-D ``rays``
mesh axis, replicate parameters and the occupancy grid, and let GSPMD insert
the psum for loss/gradients over ICI. Full-frame rendering shards pixels the
same way and all-gathers the tiles (which jit does implicitly when the output
sharding is replicated).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAYS_AXIS = "rays"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (RAYS_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(RAYS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ray_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a ray batch dict with each leaf sharded on its leading axis."""
    sharding = ray_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_state(state, mesh: Mesh):
    """Replicate a TrainState (params, opt state, grid, rng) on every device."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), state)


def render_rays_sharded(render_fn, state, rays_o, rays_d, mesh: Mesh):
    """Full-batch render with rays sharded across the mesh and params/grid
    replicated (the multi-chip eval path; SURVEY.md §5.8). Pads the ray count
    to a shard multiple and strips the padding from the host-side result.

    render_fn: (params, grid, rays_o, rays_d, iter_nr) -> dict of [R, ...].
    """
    import jax.numpy as jnp

    batch, n = pad_rays_to_multiple(
        {"o": jnp.asarray(rays_o), "d": jnp.asarray(rays_d)}, mesh.size
    )
    sharding = ray_sharding(mesh)
    o = jax.device_put(batch["o"], sharding)
    d = jax.device_put(batch["d"], sharding)
    state_r = replicate_state(state, mesh)
    # render_fn is expected to be jitted already (method.make_render_fn);
    # sharded inputs propagate through it via GSPMD. Do NOT re-wrap it in
    # jax.jit here: methods inject scene arrays at call time, and an outer
    # trace would capture them as HLO constants.
    out = render_fn(state_r.params, state_r.grid, o, d, state_r.iter_nr)
    return {k: np.asarray(v)[:n] for k, v in out.items()}


def pad_rays_to_multiple(rays: dict, multiple: int):
    """Pad every leaf's leading axis to a multiple (sharding needs equal
    shards); returns (padded batch, original count)."""
    n = next(iter(rays.values())).shape[0]
    padded = -(-n // multiple) * multiple
    if padded == n:
        return rays, n
    import jax.numpy as jnp

    def pad(x):
        pad_width = [(0, padded - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, mode="edge")

    return jax.tree_util.tree_map(pad, rays), n
