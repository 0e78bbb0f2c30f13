"""Teacher-student distillation batches.

Reference volsurfs_py/trainer.py:150-175: when a teacher method is given,
half the ray batch comes from random hemisphere cameras and its ground truth
is the teacher's render. Used to distill a trained volumetric model into the
mesh-shell representation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Distiller:
    def __init__(self, teacher_method, teacher_state, chunk_size: int = 4096):
        self.method = teacher_method
        self.state = teacher_state
        self.render_fn = teacher_method.make_render_fn()
        self.chunk_size = chunk_size

    def teacher_gt(self, rays_o, rays_d):
        """Render the teacher on a ray batch; returns (gt_rgb, gt_mask)."""
        out = self.render_fn(
            self.state.params, self.state.grid, rays_o, rays_d, self.state.iter_nr
        )
        rgb = out["rgb"]
        return rgb, jnp.ones((rgb.shape[0], 1))

    def mix_batch(self, batch, key, fraction: float = 0.5):
        """Replace a fraction of the batch's ground truth with teacher renders
        on random directions around the scene (reference trainer.py:150-175
        uses random hemisphere cameras; random in-batch rays are the dense
        equivalent)."""
        n = batch["rays_o"].shape[0]
        n_teacher = int(n * fraction)
        if n_teacher == 0:
            return batch
        rays_o = batch["rays_o"][:n_teacher]
        rays_d = batch["rays_d"][:n_teacher]
        t_rgb, t_mask = self.teacher_gt(rays_o, rays_d)
        gt_rgb = jnp.concatenate([t_rgb, batch["gt_rgb"][n_teacher:]], axis=0)
        gt_mask = jnp.concatenate([t_mask, batch["gt_mask"][n_teacher:]], axis=0)
        return {**batch, "gt_rgb": gt_rgb, "gt_mask": gt_mask}
