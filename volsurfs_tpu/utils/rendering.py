"""Full-frame rendering drivers + image saving.

Reference volsurfs_py/utils/rendering.py:15-226 (render_from_camera with
postprocess + PNG trees, render_cameras buffers for the baker)."""

from __future__ import annotations

import os

import numpy as np


def save_image_png(img: np.ndarray, out_dir: str, name: str):
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    arr = (np.clip(arr, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    path = os.path.join(out_dir, name if name.endswith(".png") else name + ".png")
    Image.fromarray(arr).save(path)
    return path


def colorize_depth(depth: np.ndarray, near=None, far=None):
    d = np.asarray(depth)
    if d.ndim == 3:
        d = d[..., 0]
    near = near if near is not None else np.percentile(d[d > 0], 2) if (d > 0).any() else 0
    far = far if far is not None else np.percentile(d[d > 0], 98) if (d > 0).any() else 1
    t = np.clip((d - near) / max(far - near, 1e-9), 0, 1)
    # simple viridis-ish ramp without matplotlib
    r = np.clip(1.5 * t - 0.25, 0, 1)
    g = np.clip(1.5 * t, 0, 1) * (1 - 0.3 * t)
    b = np.clip(1.0 - 1.2 * t, 0, 1)
    return np.stack([r, g, b], -1)


def render_from_camera(trainer, state, camera, subsample_factor: int = 1):
    """Render a camera (optionally downscaled) and return postprocessed
    buffers (reference rendering.py:36-120)."""
    cam = camera.resize(subsample_factor) if subsample_factor > 1 else camera
    out = trainer.render_camera(state, cam)
    buffers = {"rgb": np.clip(out["rgb"], 0, 1)}
    if "depth" in out:
        buffers["depth"] = colorize_depth(out["depth"])
    for key in ("normals",):
        if key in out:
            buffers[key] = np.clip(out[key] * 0.5 + 0.5, 0, 1)
    return buffers


def render_cameras_and_save(trainer, state, cameras, out_dir: str,
                            subsample_factor: int = 1):
    """Render a split and save PNG trees (reference rendering.py:130-226)."""
    paths = []
    for cam in cameras:
        buffers = render_from_camera(trainer, state, cam, subsample_factor)
        for name, img in buffers.items():
            paths.append(
                save_image_png(img, os.path.join(out_dir, name), f"{cam.camera_id:03d}")
            )
    return paths
