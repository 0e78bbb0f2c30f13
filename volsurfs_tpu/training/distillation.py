"""Teacher-student distillation batches.

Reference volsurfs_py/trainer.py:150-175: when a teacher method is given,
half the ray batch comes from random hemisphere cameras and its ground truth
is the teacher's render. Used to distill a trained volumetric model into the
mesh-shell representation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Distiller:
    def __init__(self, teacher_method, teacher_state, chunk_size: int = 4096,
                 hemisphere_radius: float | None = None,
                 image_size: tuple[int, int] = (128, 128), seed: int = 0):
        self.method = teacher_method
        self.state = teacher_state
        self.render_fn = teacher_method.make_render_fn()
        self.chunk_size = chunk_size
        self.hemisphere_radius = hemisphere_radius
        self.image_size = image_size
        self._np_rng = np.random.default_rng(seed)

    def teacher_gt(self, rays_o, rays_d):
        """Render the teacher on a ray batch; returns (gt_rgb, gt_mask)."""
        out = self.render_fn(
            self.state.params, self.state.grid, rays_o, rays_d, self.state.iter_nr
        )
        rgb = out["rgb"]
        return rgb, jnp.ones((rgb.shape[0], 1))

    def hemisphere_rays(self, key, nr_rays: int):
        """Rays from a random camera on the scene hemisphere
        (reference trainer.py:150-162 + utils/training.py
        get_random_camera_rays_and_frames)."""
        from volsurfs_tpu.datasets.cameras import (
            get_camera_rays,
            sample_cameras_on_hemisphere,
        )

        w, h = self.image_size
        f = 0.7 * h
        intrinsics = np.asarray(
            [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32
        )
        cam = sample_cameras_on_hemisphere(
            1, self.hemisphere_radius, intrinsics, w, h,
            seed=int(self._np_rng.integers(0, 2**31)),
        )[0]
        rays_o, rays_d = get_camera_rays(cam)
        pick = jax.random.randint(key, (nr_rays,), 0, rays_o.shape[0])
        return rays_o[pick], rays_d[pick]

    def mix_batch(self, batch, key, fraction: float = 0.5):
        """Replace a fraction of the batch with teacher-supervised rays from
        a random hemisphere camera (reference trainer.py:150-175); the
        remaining rays keep their dataset ground truth."""
        n = batch["rays_o"].shape[0]
        n_teacher = int(n * fraction)
        if n_teacher == 0:
            return batch
        k1, k2 = jax.random.split(key)
        if self.hemisphere_radius is not None:
            rays_o, rays_d = self.hemisphere_rays(k1, n_teacher)
        else:
            rays_o = batch["rays_o"][:n_teacher]
            rays_d = batch["rays_d"][:n_teacher]
        t_rgb, t_mask = self.teacher_gt(rays_o, rays_d)
        out = {**batch}
        out["rays_o"] = jnp.concatenate([rays_o, batch["rays_o"][n_teacher:]], 0)
        out["rays_d"] = jnp.concatenate([rays_d, batch["rays_d"][n_teacher:]], 0)
        out["gt_rgb"] = jnp.concatenate([t_rgb, batch["gt_rgb"][n_teacher:]], 0)
        out["gt_mask"] = jnp.concatenate([t_mask, batch["gt_mask"][n_teacher:]], 0)
        return out
