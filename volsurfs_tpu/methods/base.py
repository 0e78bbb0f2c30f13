"""Method base utilities: train state, optimizer, chunked frame rendering.

The reference's ``BaseMethod`` (volsurfs_py/methods/base_method.py:16-552)
is an object that mutates models/optimizer in place. TPU-native re-design:
a method owns *definitions* (flax modules + hyper-params) and pure jitted
functions over an explicit ``TrainState`` pytree (params, opt state,
occupancy grid, RNG key, iteration) that is donated through the train step.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from volsurfs_tpu.ops.occupancy import OccupancyGrid
from volsurfs_tpu.utils.schedules import make_lr_schedule


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    grid: Optional[OccupancyGrid]
    key: jax.Array
    iter_nr: jnp.ndarray  # int32 scalar


def grad_norms(grads) -> dict:
    """Per-model gradient L2 norms for observability
    (reference utils/training.py:108-125 logs these to wandb)."""
    out = {}
    for name, sub in grads.items():
        leaves = jax.tree_util.tree_leaves(sub)
        sq = sum(jnp.sum(leaf.astype(jnp.float32) ** 2) for leaf in leaves)
        out[f"grad_norm/{name}"] = jnp.sqrt(sq)
    return out


def make_optimizer(hp, warmup_start_iter: int = 0):
    """FusedAdam(betas=(0.9, 0.99), eps=1e-15) + MultiStepLR(gamma 0.3) +
    linear warmup (reference base_method.py:60-94, schedulers/warmup.py)."""
    schedule = make_lr_schedule(
        hp.lr,
        hp.lr_milestones,
        gamma=0.3,
        warmup_start_iter=warmup_start_iter,
        warmup_iters=hp.nr_warmup_iters,
    )
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
        optax.scale_by_schedule(lambda step: -schedule(step)),
    )


def render_frame_chunked(
    render_rays_fn: Callable,
    rays_o,
    rays_d,
    chunk_size: int,
):
    """Render a full frame in fixed-size ray chunks (static shapes; the last
    chunk is padded). Mirrors render_rays_batchify
    (reference base_method.py:270-343)."""
    n = rays_o.shape[0]
    n_chunks = -(-n // chunk_size)
    padded = n_chunks * chunk_size
    rays_o = jnp.concatenate(
        [rays_o, jnp.zeros((padded - n, 3), rays_o.dtype)], axis=0
    )
    rays_d = jnp.concatenate(
        [rays_d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], rays_d.dtype), (padded - n, 1))],
        axis=0,
    )
    outs = []
    for i in range(n_chunks):
        sl = slice(i * chunk_size, (i + 1) * chunk_size)
        outs.append(render_rays_fn(rays_o[sl], rays_d[sl]))
    merged = jax.tree_util.tree_map(lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0), *outs)
    return jax.tree_util.tree_map(lambda x: x[:n], merged)
