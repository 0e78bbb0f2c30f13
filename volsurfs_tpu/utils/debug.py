"""Debug helpers: NaN/Inf guards and single-ray probes.

Re-implements the reference debug surface (volsurfs_py/utils/debug.py:13-22
sanity_check; base_method.py:404-444 debug_ray tracing). On TPU the guards
are jit-compatible: `finite_or_zero` can stay inside a compiled step, while
`sanity_check` is a host-side assertion for tests / eager debugging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sanity_check(**tensors) -> bool:
    """Host-side NaN/Inf assertion over named arrays
    (reference utils/debug.py:13-22)."""
    for key, tensor in tensors.items():
        arr = np.asarray(tensor)
        assert not np.isnan(arr).any(), f"[SANITY CHECK FAILED] {key} has nan"
        assert not np.isinf(arr).any(), f"[SANITY CHECK FAILED] {key} has inf"
    return True


def tree_sanity_check(tree, name: str = "tree") -> bool:
    """sanity_check over every leaf of a pytree (params / grads)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        sanity_check(**{f"{name}{jax.tree_util.keystr(path)}": leaf})
    return True


def finite_or_zero(x):
    """Replace non-finite entries with zeros (jit-safe guard; the reference's
    GradScaler skips steps on non-finite grads, trainer.py:270-276 — this is
    the functional equivalent used before optimizer updates when enabled)."""
    return jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))


def count_nonfinite(tree):
    """Total non-finite leaf entries (observability counter)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(~jnp.isfinite(leaf)) for leaf in leaves)


def debug_ray(render_fn, params, grid, ray_o, ray_d, iter_nr):
    """Render a single ray and return all per-sample buffers for plotting
    (reference base_method.py:404-444 debug_ray_idx; surf.py:438-534 plots
    sdf/alpha/transmittance/weights along the ray)."""
    rays_o = jnp.asarray(ray_o, jnp.float32)[None]
    rays_d = jnp.asarray(ray_d, jnp.float32)[None]
    out = render_fn(params, grid, rays_o, rays_d, iter_nr)
    return {k: np.asarray(v)[0] for k, v in out.items() if hasattr(v, "shape")}
