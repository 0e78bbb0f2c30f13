"""Device-resident image stack + random ray batch sampler.

Equivalent of mvdatasets' ``TensorReel`` (reference usage:
volsurfs_py/trainer.py:176-190,589 — the whole train split lives on the
accelerator and ray batches are generated there). Batch generation is one
jitted function: sample (camera, pixel) pairs, gather ground truth, emit
rays — no host<->device traffic in the training loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from volsurfs_tpu.datasets.cameras import Camera, rays_from_pixels


@struct.dataclass
class TensorReel:
    rgbs: jnp.ndarray  # [N, H, W, 3]
    masks: jnp.ndarray  # [N, H, W, 1]
    intrinsics: jnp.ndarray  # [N, 3, 3]
    poses: jnp.ndarray  # [N, 4, 4]

    @property
    def nr_cameras(self) -> int:
        return self.rgbs.shape[0]

    @property
    def height(self) -> int:
        return self.rgbs.shape[1]

    @property
    def width(self) -> int:
        return self.rgbs.shape[2]


def make_tensor_reel(cameras: list[Camera], rgbs: np.ndarray, masks=None) -> TensorReel:
    if masks is None:
        masks = np.ones((*rgbs.shape[:3], 1), np.float32)
    return TensorReel(
        rgbs=jnp.asarray(rgbs, jnp.float32),
        masks=jnp.asarray(masks, jnp.float32),
        intrinsics=jnp.asarray(
            np.stack([c.intrinsics for c in cameras]), jnp.float32
        ),
        poses=jnp.asarray(np.stack([c.pose for c in cameras]), jnp.float32),
    )


def get_next_rays_batch(
    reel: TensorReel,
    key: jax.Array,
    batch_size: int,
    jitter_pixels: bool = True,
    nr_rays_per_pixel: int = 1,
):
    """Random ray batch (jit-friendly; static batch_size).

    Mirrors TensorReel.get_next_rays_batch (reference trainer.py:176-190):
    with nr_rays_per_pixel > 1, consecutive rays share a pixel (supersampling
    groups averaged by the methods).

    Returns dict with rays_o, rays_d [B,3], gt_rgb [B,3], gt_mask [B,1],
    camera_idx [B].
    """
    B = batch_size
    P = B // nr_rays_per_pixel
    k_cam, k_px, k_py, k_jit = jax.random.split(key, 4)
    H, W = reel.height, reel.width
    cam_idx = jax.random.randint(k_cam, (P,), 0, reel.nr_cameras)
    px = jax.random.randint(k_px, (P,), 0, W)
    py = jax.random.randint(k_py, (P,), 0, H)

    # repeat pixels for supersampling groups
    cam_idx = jnp.repeat(cam_idx, nr_rays_per_pixel)
    px = jnp.repeat(px, nr_rays_per_pixel)
    py = jnp.repeat(py, nr_rays_per_pixel)

    if jitter_pixels:
        sub = jax.random.uniform(k_jit, (B, 2))
    else:
        sub = jnp.full((B, 2), 0.5)
    pixels = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + sub

    gt_rgb = reel.rgbs[cam_idx, py, px]
    gt_mask = reel.masks[cam_idx, py, px]

    intr = reel.intrinsics[cam_idx]  # [B, 3, 3]
    pose = reel.poses[cam_idx]  # [B, 4, 4]
    fx, fy = intr[:, 0, 0], intr[:, 1, 1]
    cx, cy = intr[:, 0, 2], intr[:, 1, 2]
    x = (pixels[:, 0] - cx) / fx
    y = (pixels[:, 1] - cy) / fy
    dirs_cam = jnp.stack([x, y, jnp.ones_like(x)], -1)
    dirs = jnp.einsum("bij,bj->bi", pose[:, :3, :3], dirs_cam)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_o = pose[:, :3, 3]

    return {
        "rays_o": rays_o,
        "rays_d": dirs,
        "gt_rgb": gt_rgb,
        "gt_mask": gt_mask,
        "camera_idx": cam_idx,
    }
