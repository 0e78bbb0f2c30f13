"""Diagnostic visualizations: SDF cross-sections and texture previews.

Reference volsurfs_py/utils/visualization.py:14-175 (field sections +
neural-texture previews pushed to wandb); here rendered to PNG arrays."""

from __future__ import annotations

import numpy as np


def field_cross_section(field_fn, axis: int = 2, value: float = 0.0,
                        bounds: float = 1.0, resolution: int = 256):
    """Evaluate a scalar field on an axis-aligned plane slice.

    Returns [res, res] float array of field values.
    """
    lin = np.linspace(-bounds, bounds, resolution, dtype=np.float32)
    a, b = np.meshgrid(lin, lin, indexing="ij")
    pts = np.zeros((resolution * resolution, 3), np.float32)
    other = [i for i in range(3) if i != axis]
    pts[:, other[0]] = a.ravel()
    pts[:, other[1]] = b.ravel()
    pts[:, axis] = value
    vals = np.asarray(field_fn(pts)).reshape(resolution, resolution)
    return vals


def colorize_sdf_section(vals: np.ndarray, scale: float = 0.5):
    """Signed-distance section to RGB: blue outside, red inside, white at 0."""
    t = np.clip(vals / scale, -1, 1)
    pos = np.clip(t, 0, 1)
    neg = np.clip(-t, 0, 1)
    r = 1.0 - pos
    g = 1.0 - pos - neg * 0.5
    b = 1.0 - neg
    img = np.stack([r, np.clip(g, 0, 1), b], -1)
    # zero level set in black
    lvl = np.abs(vals) < scale * 0.02
    img[lvl] = 0.0
    return img


def texture_preview(method, state, mesh_idx: int = 0, deg: int = 0,
                    resolution: int = 128):
    """Low-res neural texture preview (reference neural_texture.py render
    preview mode)."""
    import jax

    from volsurfs_tpu.baking.baker import _texel_center_uvs

    name = f"rgb_{mesh_idx if method.hp.are_volsurfs_colors_indep else 0}"
    uvs = _texel_center_uvs(resolution)
    fn = jax.jit(
        lambda uv: method.rgb_model.apply(
            state.params[name], deg, uv, method=type(method.rgb_model).bake_band
        )
    )
    out = np.asarray(fn(uvs)).reshape(resolution, resolution, -1)
    return np.clip(out[..., :3], 0, 1)
