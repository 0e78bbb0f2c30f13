"""Field gradients (finite difference) and SDF curvature.

Reference: volsurfs_py/utils/fields_utils.py:6-166. The reference stacks the
4 shifted evaluations into one batch for efficiency; under jit that fusion is
automatic, so we evaluate the 4 offsets in one vectorized call the same way.
An autodiff variant is provided as the TPU-native alternative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from volsurfs_tpu.utils.math import safe_normalize


def get_field_gradients(field_fn, points, eps: float = 1e-4):
    """Forward-difference spatial gradients of a scalar field.

    Args:
      field_fn: [..., 3] -> [..., 1] (or tuple whose first element is that).
      points: [..., 3]
    Returns: [..., 3] gradients.
    """
    offsets = jnp.asarray(
        [[0.0, 0.0, 0.0], [eps, 0.0, 0.0], [0.0, eps, 0.0], [0.0, 0.0, eps]],
        points.dtype,
    )
    offsets = offsets.reshape((4,) + (1,) * (points.ndim - 1) + (3,))

    def eval_offset(off):
        res = field_fn(points + off)
        sdf = res[0] if isinstance(res, tuple) else res
        if sdf.shape[-1] > 1:
            sdf = sdf[..., 0:1]
        return sdf

    # lax.map serializes the 4 shifted evaluations so peak memory is one
    # evaluation's intermediates, not four (the reference stacks them into one
    # batch, fields_utils.py:13-24 — fine on a 24GB GPU, wasteful on-chip)
    sdf = jax.lax.map(eval_offset, offsets)
    grad = (sdf[1:] - sdf[0:1]) / eps
    return jnp.moveaxis(grad, 0, -1)[..., 0, :]


def get_fields_gradients(fields_fn, points, eps: float = 1e-4):
    """Forward-difference gradients of a multi-output field.

    Args:
      fields_fn: [..., 3] -> [..., K] (or tuple whose first element is that).
      points: [..., 3]
    Returns: [..., K, 3] per-output gradients (one 4-point FD evaluates all
    outputs at once — matching the reference's batched multi-surface FD,
    fields_utils.py:6-80 applied to OffsetsSDF.forward).
    """
    offsets = jnp.asarray(
        [[0.0, 0.0, 0.0], [eps, 0.0, 0.0], [0.0, eps, 0.0], [0.0, 0.0, eps]],
        points.dtype,
    )
    offsets = offsets.reshape((4,) + (1,) * (points.ndim - 1) + (3,))

    def eval_offset(off):
        res = fields_fn(points + off)
        vals = res[0] if isinstance(res, tuple) else res
        return vals

    vals = jax.lax.map(eval_offset, offsets)  # [4, ..., K]
    grad = (vals[1:] - vals[0:1]) / eps  # [3, ..., K]
    return jnp.moveaxis(grad, 0, -1)  # [..., K, 3]


def get_field_gradients_autodiff(field_fn, points):
    """jax.grad variant (exact gradients; the reference only has the
    finite-difference path, fields_utils.py:55-70 is commented out)."""

    def scalar_fn(p):
        res = field_fn(p[None])
        sdf = res[0] if isinstance(res, tuple) else res
        return sdf.reshape(-1)[0]

    flat = points.reshape(-1, 3)
    grads = jax.vmap(jax.grad(scalar_fn))(flat)
    return grads.reshape(points.shape)


def get_sdf_curvature(field_fn, points, sdf_gradients, key, eps: float = 1e-4,
                      grad_fn=None):
    """Curvature proxy: angle between the normal at a point and the normal at
    a point shifted along a random tangent direction, mapped to [0, 1]
    (reference volsurfs_py/utils/fields_utils.py:83-166).

    grad_fn: optional points -> gradients override for the shifted normals
    (the methods pass their analytic-jacobian path here, which cuts the
    table-gradient scatter 4x vs the finite-difference default)."""
    normals = safe_normalize(sdf_gradients)
    rand_dirs = jax.random.normal(key, points.shape)
    rand_dirs = safe_normalize(rand_dirs)
    tangents = jnp.cross(normals, rand_dirs)
    shifted = points + tangents * eps
    if grad_fn is not None:
        grads_shifted = grad_fn(shifted)
    else:
        grads_shifted = get_field_gradients(field_fn, shifted, eps)
    normals_shifted = safe_normalize(grads_shifted)
    dot = jnp.sum(normals * normals_shifted, axis=-1, keepdims=True)
    angle = jnp.arccos(jnp.clip(dot, -1.0 + 1e-6, 1.0 - 1e-6))
    return angle / jnp.pi
