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
