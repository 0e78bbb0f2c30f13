"""Reproduce + diagnose the 256^2 sphere-traced PSNR collapse
(runs/convergence_tpu_256: volumetric 25.4 dB vs sphere-traced 13.2 dB).

Loads the committed 4000-iter surf checkpoint, re-renders one test view
volumetrically and sphere-traced, and reports where the error lives:
hit-rate vs volumetric weights_sum, error split hit/miss pixels, and a
sweep over trace hyperparameters (steps, threshold, multiplier, bisection).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from volsurfs_tpu.params.hyper_params import HyperParamsSuRF
from volsurfs_tpu.datasets.mvdataset import MVDataset
from volsurfs_tpu.ops.raycast import make_bounding_sphere
from volsurfs_tpu.methods.surf import Surf
from volsurfs_tpu.training.checkpoints import load_checkpoint
from volsurfs_tpu.datasets.cameras import get_camera_rays
from volsurfs_tpu.utils.evaluation import psnr as psnr_fn

RES = int(os.environ.get("RES", "256"))
ITERS = 4000

hp = HyperParamsSuRF(
    is_nr_training_rays_dynamic=False,
    training_rays_batch_size=512,
    max_nr_samples_per_ray=32,
    max_nr_imp_samples_per_ray=16,
    do_importance_sampling=True,
    init_phase_end_iter=max(300, ITERS // 3),
    first_phase_end_iter=ITERS,
    training_end_iter=ITERS,
    nr_warmup_iters=100,
    lr=3e-3,
    lr_milestones=[int(ITERS * 0.8), int(ITERS * 0.9)],
    eikonal_weight=0.04,
    offsurface_weight=1e-4,
    curvature_weight=0.0,
    geom_feat_size=32,
    sdf_nr_iters_for_c2f=ITERS // 2,
    nr_samples_bg=8,
)
mv = MVDataset("synthetic", "sphere", "", config={
    "width": RES, "height": RES, "nr_train_cameras": 24, "nr_test_cameras": 4})
method = Surf(hp, make_bounding_sphere(1.0), bg_color="white",
              init_sphere_radius=0.4, occupancy_res=64,
              key=jax.random.PRNGKey(0))
state = method.init_state()
state = load_checkpoint("runs/convergence_tpu_256/checkpoints", state)
print("loaded iter", int(state.iter_nr))

split = mv["test"]
cam, gt = split.cameras[0], np.asarray(split.rgbs[0])
rays_o, rays_d = get_camera_rays(cam)
rays_o = jnp.asarray(rays_o.reshape(-1, 3))
rays_d = jnp.asarray(rays_d.reshape(-1, 3))

# volumetric reference
vol_fn = jax.jit(lambda p, g, o, d, i: method.render_rays(p, g, o, d, i, None, False))
vol = vol_fn(state.params, state.grid, rays_o, rays_d, state.iter_nr)
img_vol = np.asarray(vol["rgb"]).reshape(RES, RES, 3)
w_vol = np.asarray(vol["weights_sum"]).reshape(RES, RES)
print(f"volumetric PSNR {psnr_fn(gt, img_vol):.2f}  fg-frac {np.mean(w_vol > 0.5):.3f}")

def run_st(max_steps, thresh, use_grid):
    fn = jax.jit(lambda p, g, o, d, i: method.render_rays_sphere_traced(
        p, g, o, d, i, max_st_steps=max_steps, converged_dist_tresh=thresh),
        static_argnums=())
    g = state.grid if use_grid else None
    res = method.render_rays_sphere_traced(
        state.params, g, rays_o, rays_d, state.iter_nr,
        max_st_steps=max_steps, converged_dist_tresh=thresh)
    img = np.asarray(res["rgb"]).reshape(RES, RES, 3)
    hit = np.asarray(res["weights_sum"]).reshape(RES, RES)
    p = psnr_fn(gt, img)
    # where is the error?
    err = np.mean((img - gt) ** 2, axis=-1)
    hit_m = hit > 0.5
    vol_m = w_vol > 0.5
    print(f"st steps={max_steps} thr={thresh} grid={use_grid}: PSNR {p:.2f}  "
          f"hit-frac {hit_m.mean():.3f}  "
          f"err(hit) {err[hit_m].mean() if hit_m.any() else 0:.4f}  "
          f"err(miss) {err[~hit_m].mean():.4f}  "
          f"missed-surface-frac {(vol_m & ~hit_m).mean():.4f}  "
          f"extra-hit-frac {(~vol_m & hit_m).mean():.4f}")
    return img, hit_m

img_st, hit_m = run_st(100, 1e-3, True)
run_st(100, 1e-3, False)
run_st(200, 1e-3, False)
run_st(100, 3e-3, False)
run_st(100, 1e-2, False)
