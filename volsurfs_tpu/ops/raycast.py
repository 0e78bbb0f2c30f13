"""Bounding primitives (sphere / axis-aligned box) and ray intersection.

Re-implements the mvdatasets bounding-primitive surface the reference relies
on (BoundingSphere / BoundingBox with ``.intersect(rays_o, rays_d) ->
(is_hit, t_near, t_far, p_near, p_far)``, ``.get_radius()``,
``.get_random_points_inside(n)``; usage at reference
volsurfs_py/utils/raycasting.py:4-37 and utils/volsurfs_utils.py:233-266).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BoundingSphere:
    center: jnp.ndarray  # [3]
    radius: jnp.ndarray  # scalar

    def get_radius(self):
        return self.radius

    def get_center(self):
        return self.center

    def intersect(self, rays_o, rays_d):
        """Ray-sphere intersection. Rays starting inside get t_near = 0."""
        oc = rays_o - self.center[None, :]
        b = jnp.sum(oc * rays_d, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - self.radius**2
        disc = b * b - c
        is_hit = disc >= 0.0
        sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sqrt_disc
        t1 = -b + sqrt_disc
        t_near = jnp.maximum(t0, 0.0)
        t_far = jnp.maximum(t1, 0.0)
        is_hit = is_hit & (t1 > 0.0)
        t_near = jnp.where(is_hit, t_near, 0.0)
        t_far = jnp.where(is_hit, t_far, 0.0)
        p_near = rays_o + t_near[:, None] * rays_d
        p_far = rays_o + t_far[:, None] * rays_d
        return is_hit, t_near, t_far, p_near, p_far

    def get_random_points_inside(self, key, nr_points: int):
        """Uniform points inside the sphere."""
        key_dir, key_r = jax.random.split(key)
        dirs = jax.random.normal(key_dir, (nr_points, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        r = self.radius * jax.random.uniform(key_r, (nr_points, 1)) ** (1.0 / 3.0)
        return self.center[None, :] + dirs * r

    def contains(self, points):
        return jnp.linalg.norm(points - self.center[None, :], axis=-1) <= self.radius


@struct.dataclass
class BoundingBox:
    center: jnp.ndarray  # [3]
    sides: jnp.ndarray  # [3] full side lengths

    def get_radius(self):
        """Radius of the circumscribed sphere (parity with mvdatasets)."""
        return 0.5 * jnp.linalg.norm(self.sides)

    def get_center(self):
        return self.center

    def intersect(self, rays_o, rays_d):
        """Slab-test ray-AABB intersection."""
        half = 0.5 * self.sides[None, :]
        lo = self.center[None, :] - half
        hi = self.center[None, :] + half
        inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-12, 1e-12, rays_d)
        t_lo = (lo - rays_o) * inv_d
        t_hi = (hi - rays_o) * inv_d
        t_min = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
        t_max = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
        is_hit = (t_max >= t_min) & (t_max > 0.0)
        t_near = jnp.where(is_hit, jnp.maximum(t_min, 0.0), 0.0)
        t_far = jnp.where(is_hit, jnp.maximum(t_max, 0.0), 0.0)
        p_near = rays_o + t_near[:, None] * rays_d
        p_far = rays_o + t_far[:, None] * rays_d
        return is_hit, t_near, t_far, p_near, p_far

    def get_random_points_inside(self, key, nr_points: int):
        u = jax.random.uniform(key, (nr_points, 3), minval=-0.5, maxval=0.5)
        return self.center[None, :] + u * self.sides[None, :]

    def contains(self, points):
        d = jnp.abs(points - self.center[None, :])
        return jnp.all(d <= 0.5 * self.sides[None, :], axis=-1)


def make_bounding_sphere(radius: float, center=(0.0, 0.0, 0.0)) -> BoundingSphere:
    return BoundingSphere(
        center=jnp.asarray(center, jnp.float32),
        radius=jnp.asarray(radius, jnp.float32),
    )


def make_bounding_box(sides, center=(0.0, 0.0, 0.0)) -> BoundingBox:
    return BoundingBox(
        center=jnp.asarray(center, jnp.float32),
        sides=jnp.broadcast_to(jnp.asarray(sides, jnp.float32), (3,)),
    )


def intersect_bounding_primitive(bounding_primitive, rays_o, rays_d) -> dict:
    """Raycast dict matching reference volsurfs_py/utils/raycasting.py:4-37."""
    is_hit, t_near, t_far, p_near, p_far = bounding_primitive.intersect(
        rays_o, rays_d
    )
    return {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "nr_rays": rays_o.shape[0],
        "points_near": p_near,
        "points_far": p_far,
        "t_near": t_near[:, None],
        "t_far": t_far[:, None],
        "is_hit": is_hit,
    }


def reflect_rays(rays_dirs, normals_dirs):
    """r = d - 2 (d . n) n (reference volsurfs_py/utils/raycasting.py:40-61)."""
    return rays_dirs - 2.0 * jnp.sum(
        rays_dirs * normals_dirs, axis=-1, keepdims=True
    ) * normals_dirs
