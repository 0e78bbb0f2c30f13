"""Longer surf convergence run on the synthetic scene -> PSNR evidence.

Run: python scripts/convergence_run.py [--iters 1500] [--platform cpu]
Writes results to runs/convergence/results.json.
"""
import argparse, json, os, sys, time

parser = argparse.ArgumentParser()
parser.add_argument("--iters", type=int, default=1500)
parser.add_argument("--init_iters", type=int, default=None,
                    help="sphere-init budget; defaults to iters//3 (the "
                         "reference spends 5k/100k iters on init; short "
                         "schedules need proportionally more)")
parser.add_argument("--platform", default=None)
parser.add_argument("--res", type=int, default=64)
parser.add_argument("--rays", type=int, default=256)
parser.add_argument("--occupancy_res", type=int, default=64)
parser.add_argument("--out", default="runs/convergence")
args = parser.parse_args()

import jax
if args.platform:
    jax.config.update("jax_platforms", args.platform)

from volsurfs_tpu.params.hyper_params import HyperParamsSuRF
from volsurfs_tpu.datasets.mvdataset import MVDataset
from volsurfs_tpu.ops.raycast import make_bounding_sphere
from volsurfs_tpu.methods.surf import Surf
from volsurfs_tpu.training.trainer import Trainer
from volsurfs_tpu.utils.evaluation import render_and_eval

hp = HyperParamsSuRF(
    is_nr_training_rays_dynamic=False,
    training_rays_batch_size=args.rays,
    max_nr_samples_per_ray=32,
    max_nr_imp_samples_per_ray=16,
    do_importance_sampling=True,
    init_phase_end_iter=args.init_iters or max(300, args.iters // 3),
    first_phase_end_iter=args.iters,
    training_end_iter=args.iters,
    nr_warmup_iters=100,
    lr=3e-3,
    lr_milestones=[int(args.iters*0.8), int(args.iters*0.9)],
    eikonal_weight=0.04,
    offsurface_weight=1e-4,
    curvature_weight=0.0,
    geom_feat_size=32,
    sdf_nr_iters_for_c2f=args.iters // 2,  # reference trains c2f on (5k/100k)
    nr_samples_bg=8,
)
mv = MVDataset("synthetic", "sphere", "", config={"width": args.res, "height": args.res, "nr_train_cameras": 24, "nr_test_cameras": 4})
method = Surf(hp, make_bounding_sphere(1.0), bg_color="white", init_sphere_radius=0.4, occupancy_res=args.occupancy_res, key=jax.random.PRNGKey(0))
trainer = Trainer(method, mv, args.out, log_every=100)
t0 = time.time()
state = trainer.train(method.init_state())
train_time = time.time() - t0
from volsurfs_tpu.training.checkpoints import save_checkpoint
save_checkpoint(os.path.join(args.out, "checkpoints"), state)
means = render_and_eval(trainer, state, "test", os.path.join(args.out, "eval"))
result = {"iters": args.iters, "train_time_s": round(train_time, 1),
          "iters_per_sec": round(args.iters / train_time, 2), **{k: round(v, 3) for k, v in means.items()}}

# sphere-traced eval: PSNR + frame time, with and without grid assistance
# (reference render_sphere_traced toggle + OccupancyGridGPU.cuh:505-584
# grid-assisted tracing). Evidence for the eval-speed win at equal quality.
import numpy as np

import jax.numpy as jnp
from volsurfs_tpu.datasets.cameras import get_camera_rays
from volsurfs_tpu.utils.evaluation import psnr as psnr_fn

split = mv["test"]
cam, gt = split.cameras[0], np.asarray(split.rgbs[0])
rays_o, rays_d = get_camera_rays(cam)
rays_o = jnp.asarray(rays_o.reshape(-1, 3))
rays_d = jnp.asarray(rays_d.reshape(-1, 3))

st_means = {}
for label, use_grid in (("st_grid", True), ("st_nogrid", False)):
    if use_grid:
        fn = jax.jit(lambda p, g, o, d, i:
                     method.render_rays_sphere_traced(p, g, o, d, i))
        fn_args = (state.params, state.grid, rays_o, rays_d, state.iter_nr)
    else:
        fn = jax.jit(lambda p, o, d, i:
                     method.render_rays_sphere_traced(p, None, o, d, i))
        fn_args = (state.params, rays_o, rays_d, state.iter_nr)
    res = fn(*fn_args)
    float(jnp.sum(res["rgb"]))  # compile + sync
    t0 = time.time()
    for _ in range(3):
        res = fn(*fn_args)
        float(jnp.sum(res["rgb"]))
    dt = (time.time() - t0) / 3
    img = np.asarray(res["rgb"]).reshape(args.res, args.res, 3)
    st_means[label] = {"frame_ms": round(dt * 1e3, 1),
                       "psnr": round(float(psnr_fn(gt, img)), 2)}
result["sphere_traced"] = st_means

with open(os.path.join(args.out, "results.json"), "w") as f:
    json.dump(result, f, indent=2)
print("RESULT:", json.dumps(result))
