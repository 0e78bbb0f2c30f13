"""Loss functions (reference volsurfs_py/utils/losses.py:6-89)."""

from __future__ import annotations

import jax.numpy as jnp

from volsurfs_tpu.utils.math import safe_norm


def loss_l1(gt, pred, mask=None):
    if mask is not None:
        return jnp.mean(jnp.abs(gt - pred) * mask)
    return jnp.mean(jnp.abs(gt - pred))


def loss_l2(gt, pred, mask=None):
    if mask is not None:
        return jnp.mean((gt - pred) ** 2 * mask)
    return jnp.mean((gt - pred) ** 2)


def sparsity_loss(densities, lambda_sparsity: float = 1.0):
    loss = jnp.mean(1.0 - jnp.exp(-lambda_sparsity * densities))
    return jnp.clip(loss, min=0.0)


def eikonal_loss(sdf_gradients, distance_scale: float = 1.0):
    err = (safe_norm(sdf_gradients, axis=-1) - distance_scale) ** 2
    return jnp.mean(err)


def entropy_loss(values):
    entropy = -values * jnp.log(values + 1e-6) - (1 - values) * jnp.log(
        1 - values + 1e-6
    )
    return jnp.mean(entropy)


def offsurface_loss(sdf):
    """exp penalty on near-zero sdf at random points
    (reference methods/surf.py:1029-1034)."""
    return jnp.mean(jnp.exp(-1e2 * jnp.abs(sdf)))


def sdf_loss_sphere(points, points_sdf, points_sdf_gradients, scene_radius,
                    sphere_center=(0.0, 0.0, 0.0), distance_scale: float = 1.0):
    """Sphere-init regression loss (reference utils/sdf_utils.py:21-41)."""
    center = jnp.asarray(sphere_center, jnp.float32)
    dist_to_center = jnp.linalg.norm(points - center, axis=-1, keepdims=True)
    dists = (dist_to_center - scene_radius) * distance_scale
    loss_dists = jnp.mean((points_sdf - dists) ** 2)
    loss_eik = jnp.mean(
        (safe_norm(points_sdf_gradients, axis=-1) - distance_scale) ** 2
    )
    loss = loss_dists * 3e3 + loss_eik * 5e1
    return loss, loss_dists, loss_eik
