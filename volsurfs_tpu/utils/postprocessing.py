"""Render-buffer postprocessing + 2D field plots.

Covers the reference's visualization tail
(volsurfs_py/utils/postprocessing.py:9-244 and
volsurfs_py/utils/plotting_2d.py:46-140): colormapped depth / weight-sum /
sample-count buffers, normals remapping, per-surface row stacking, and SDF
cross-section contour plots. matplotlib is used headlessly (Agg) for the
colorbar/contour variants; plain colormap application is pure numpy so the
hot preview path never builds a figure.
"""

from __future__ import annotations

import numpy as np

from volsurfs_tpu.utils.common import lin2hwc


def lin2hwsc(x: np.ndarray, h: int, w: int, nr_surfs: int) -> np.ndarray:
    """[N, (S,) C] linear pixels -> [h, w, S, C]
    (reference utils/common.py lin2hwsc)."""
    x = np.asarray(x)
    if x.ndim == 2:
        x = x[:, None, :]
    return x.reshape(h, w, nr_surfs, x.shape[-1])


def apply_colormap(img: np.ndarray, cmap: str = "jet", vmin=None, vmax=None):
    """Colormap a single-channel image to rgb in [0, 1]
    (reference postprocessing.py:9-38 without the figure/colorbar)."""
    import matplotlib

    img = np.asarray(img, np.float32)
    if img.ndim == 3:
        img = img[..., 0]
    lo = float(np.min(img)) if vmin is None else float(vmin)
    hi = float(np.max(img)) if vmax is None else float(vmax)
    denom = hi - lo if hi > lo else 1.0
    normed = np.clip((img - lo) / denom, 0.0, 1.0)
    return matplotlib.colormaps.get_cmap(cmap)(normed)[..., :3].astype(np.float32)


def postprocess_with_matplotlib(img, cmap="jet", vmin=None, vmax=None, dpi=72):
    """Figure + colorbar variant (reference postprocessing.py:9-38)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from mpl_toolkits.axes_grid1 import make_axes_locatable

    img = np.asarray(img)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    fig = plt.figure(
        figsize=(img.shape[1] / dpi, img.shape[0] / dpi), facecolor="white", dpi=dpi
    )
    ax = fig.add_subplot(111)
    im = ax.imshow(img, cmap=cmap, vmin=vmin, vmax=vmax)
    divider = make_axes_locatable(ax)
    cax = divider.append_axes("right", size="5%", pad=0.05)
    fig.colorbar(im, cax=cax)
    fig.tight_layout()
    out = _fig_to_np(fig)
    plt.close(fig)
    return out


def _fig_to_np(fig) -> np.ndarray:
    fig.canvas.draw()
    w, h = fig.canvas.get_width_height()
    buf = np.asarray(fig.canvas.buffer_rgba(), np.uint8).reshape(h, w, 4)
    return (buf[..., :3] / 255.0).astype(np.float32)


def postprocess_renders(
    renders: dict,
    camera,
    max_nr_samples_per_ray: int | None = None,
    use_matplotlib_plots: bool = False,
) -> dict:
    """Reshape linear render buffers to images and colorize by key
    (reference postprocessing.py:41-244 dispatch):

    - ``*normals*``   -> (n + 1) / 2
    - ``*depth*`` / ``*interval*`` -> jet colormap
    - ``*sum*``       -> viridis, vmin=0
    - ``*uv*``        -> third channel zero-padded
    - ``*nr_samples*``-> Purples, vmax=max_nr_samples_per_ray

    Buffers may be [N, C] or per-surface [N, S, C]; surfaces are stacked on
    one image row. Returns {mode: {key: [h, w*S, 3]}}.
    """
    h, w = camera.height, camera.width
    cmap = postprocess_with_matplotlib if use_matplotlib_plots else apply_colormap
    out = {}
    for mode, buffers in renders.items():
        out[mode] = {}
        for key, lin in buffers.items():
            lin = np.asarray(lin)
            nr_surfs = lin.shape[1] if lin.ndim == 3 else 1
            imgs = lin2hwsc(lin, h, w, nr_surfs)
            row = []
            for i in range(nr_surfs):
                img = imgs[:, :, i].astype(np.float32)
                if "normals" in key:
                    img = (img + 1.0) * 0.5
                elif "depth" in key or "interval" in key:
                    img = cmap(img, "jet")
                elif "sum" in key:
                    img = cmap(img, "viridis", vmin=0.0)
                elif "uv" in key:
                    img = np.concatenate([img, np.zeros((h, w, 1), img.dtype)], -1)
                elif "nr_samples" in key:
                    img = cmap(img, "Purples", vmin=0, vmax=max_nr_samples_per_ray)
                if img.shape[-1] == 1:
                    img = np.repeat(img, 3, axis=-1)
                row.append(np.clip(img[..., :3], 0.0, 1.0))
            out[mode][key] = np.concatenate(row, axis=1)
    return out


def _midpoint_norm(vmin, vmax, midpoint=0.0):
    import matplotlib.colors as mcolors

    class MidpointNormalize(mcolors.Normalize):
        """bwr centered on the zero level set (reference plotting_2d.py:20-44)."""

        def __call__(self, value, clip=None):
            lo, mid, hi = self.vmin, midpoint, self.vmax
            x, y = [lo, mid, hi], [0.0, 0.5, 1.0]
            return np.ma.masked_array(np.interp(value, x, y))

    return MidpointNormalize(vmin=min(vmin, -1e-9), vmax=max(vmax, 1e-9))


def plot_2d_sdf(sdf: np.ndarray, width: int, height: int) -> np.ndarray:
    """Contour + bwr section plot of one SDF slice
    (reference plotting_2d.py:67-83)."""
    return plot_2d_sdfs([sdf], width, height)


def plot_2d_sdfs(sdfs, width: int, height: int) -> np.ndarray:
    """One subplot per SDF with zero-centered bwr + labeled contours
    (reference plotting_2d.py:46-64)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    n = len(sdfs)
    X, Y = np.meshgrid(np.linspace(0, 1, width), np.linspace(0, 1, height))
    fig, axs = plt.subplots(1, n, figsize=(5 * n, 5), squeeze=False)
    for i, sdf in enumerate(sdfs):
        Z = np.asarray(sdf).reshape(height, width)
        ax = axs[0, i]
        contours = ax.contour(X, Y, Z, 3, colors="black")
        ax.clabel(contours, inline=True, fontsize=8)
        norm = _midpoint_norm(float(Z.min()), float(Z.max()))
        im = ax.imshow(
            Z, extent=[0, 1, 0, 1], origin="lower", cmap="bwr", alpha=0.8, norm=norm
        )
        fig.colorbar(im, ax=ax)
    out = _fig_to_np(fig)
    plt.close(fig)
    return out


def plot_2d_sdfs_together(
    sdfs, width: int, height: int, colors=("b", "black", "r"), dpi=72
) -> np.ndarray:
    """All zero level sets on one axis (reference plotting_2d.py:85-112)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    X, Y = np.meshgrid(np.linspace(0, 1, width), np.linspace(0, 1, height))
    fig = plt.figure(figsize=(width / dpi, height / dpi), dpi=dpi, facecolor="white")
    ax = fig.add_subplot(111)
    for i, sdf in enumerate(sdfs):
        Z = np.asarray(sdf).reshape(height, width)
        levels = 3 if len(sdfs) == 1 else [0.0]
        contours = ax.contour(X, Y, Z, levels, colors=colors[i % len(colors)])
        ax.clabel(contours, inline=True, fontsize=12)
    out = _fig_to_np(fig)
    plt.close(fig)
    return out


def plot_2d_density(density, width: int, height: int, dpi=72) -> np.ndarray:
    """Density slice with colorbar (reference plotting_2d.py:115-127)."""
    return postprocess_with_matplotlib(
        np.asarray(density).reshape(height, width), cmap="viridis", dpi=dpi
    )


def plot_2d_occupancy(occupancy, width: int, height: int, dpi=72) -> np.ndarray:
    """Boolean occupancy slice (reference plotting_2d.py:130-140)."""
    return postprocess_with_matplotlib(
        np.asarray(occupancy, np.float32).reshape(height, width),
        cmap="gray", vmin=0.0, vmax=1.0, dpi=dpi,
    )


def view_3d_sdf(
    sdf_fn,
    nr_points_per_dim: int = 96,
    bounds: float = 1.0,
    width: int = 500,
    height: int = 500,
    level: float = 0.0,
    cam_dir=(1.0, 1.0, 0.8),
    color=(0.7, 0.7, 0.9),
) -> np.ndarray:
    """Render the SDF's level-set mesh to a shaded image.

    Headless equivalent of the reference's open3d window
    (volsurfs_py/utils/plotting_3d.py:7-31 view_3d_sdf): extract the level
    set (baking/marching), trace a camera's rays against it (ops/bvh) and
    shade with a lambert term on the normals. Returns [h, w, 3] float in
    [0, 1] instead of opening a window.
    """
    import jax.numpy as jnp

    from volsurfs_tpu.baking.marching import extract_mesh_from_fn
    from volsurfs_tpu.datasets.cameras import get_camera_rays, look_at_pose, Camera
    from volsurfs_tpu.ops.bvh import build_bvh, trace

    verts, faces = extract_mesh_from_fn(
        sdf_fn, resolution=nr_points_per_dim, bounds=bounds, level=level
    )[:2]
    if verts.shape[0] == 0:
        return np.ones((height, width, 3), np.float32)
    bvh = build_bvh(np.asarray(verts, np.float32), np.asarray(faces, np.int32))
    eye = 2.6 * bounds * np.asarray(cam_dir, np.float32) / np.linalg.norm(cam_dir)
    f = 0.9 * height
    intr = np.asarray(
        [[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32
    )
    cam = Camera(intr, look_at_pose(eye), width, height)
    rays_o, rays_d = get_camera_rays(cam)
    out = trace(bvh, jnp.asarray(rays_o), jnp.asarray(rays_d))
    light = (eye / np.linalg.norm(eye)).astype(np.float32)  # headlight
    v = np.asarray(verts, np.float32)
    fc = np.asarray(faces, np.int32)
    fn = np.cross(v[fc[:, 1]] - v[fc[:, 0]], v[fc[:, 2]] - v[fc[:, 0]])
    fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    tri = np.clip(np.asarray(out["triangles_id"]), 0, fc.shape[0] - 1)
    lam = np.abs(fn[tri] @ light)
    hit = np.asarray(out["is_hit"])[:, None]
    col = np.asarray(color, np.float32)[None, :]
    shaded = (0.25 + 0.75 * lam[:, None]) * col
    img = np.where(hit, shaded, 1.0).astype(np.float32)
    return img.reshape(height, width, 3)


def view_3d_sdfs(
    sdfs_fn,
    nr_sdfs: int,
    nr_points_per_dim: int = 96,
    bounds: float = 1.0,
    width: int = 500,
    height: int = 500,
) -> np.ndarray:
    """All level sets rendered side by side (reference plotting_3d.py:34-64
    renders them in one open3d window; headlessly a row image is the
    equivalent artifact). ``sdfs_fn(pts)`` -> [N, nr_sdfs] values."""
    rng = np.random.default_rng(0)
    imgs = [
        view_3d_sdf(
            lambda p, i=i: np.asarray(sdfs_fn(p))[..., i],
            nr_points_per_dim, bounds, width, height,
            color=tuple(0.4 + 0.6 * rng.random(3)),
        )
        for i in range(nr_sdfs)
    ]
    return np.concatenate(imgs, axis=1)
