"""On-chip evidence run of the FULL 5-stage pipeline (surf -> offsets_surfs
-> bake -> volsurfs -> textures/scene.json -> baked re-render + eval).

Run: python scripts/pipeline_run.py [--scale small|medium]
Writes runs/<out>/results.json with per-stage metrics.
"""
import argparse, json, os, time

parser = argparse.ArgumentParser()
parser.add_argument("--out", default=None)
parser.add_argument("--scene", default="sphere", choices=["sphere", "hard"],
                    help="procedural GT scene; 'hard' has thin features, a "
                    "concavity and high-frequency view-dependent shading")
parser.add_argument("--res", type=int, default=64)
parser.add_argument("--surf_iters", type=int, default=2000)
parser.add_argument("--offsets_iters", type=int, default=1500)
parser.add_argument("--volsurfs_iters", type=int, default=1200)
parser.add_argument("--platform", default=None)
parser.add_argument("--occupancy_res", type=int, default=None)
parser.add_argument("--mesh_res", type=int, default=None)
args = parser.parse_args()
if args.out is None:
    args.out = "runs/pipeline_tpu" if args.scene == "sphere" else "runs/pipeline_hard"

import jax
if args.platform:
    jax.config.update("jax_platforms", args.platform)
import numpy as np

from volsurfs_tpu.datasets.mvdataset import MVDataset
from volsurfs_tpu.params.hyper_params import (
    HyperParamsOffsetsSuRFs, HyperParamsSuRF, HyperParamsVolSurfs,
)
from volsurfs_tpu.pipeline import run_pipeline
from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer
from volsurfs_tpu.utils.evaluation import psnr

mv = MVDataset(
    "synthetic", args.scene, "",
    config={"width": args.res, "height": args.res,
            "nr_train_cameras": 24, "nr_test_cameras": 4},
)

# The hard scene exists to expose per-stage quality loss (VERDICT r4 item
# 7): 0.016-thick fins need finer marching-cubes voxels, the sin-product
# albedo needs more texel density, and the tight Phong lobe needs SH deg 3
# (the reference production setting, config/volsurfs/base_5.cfg).
HARD = args.scene == "hard"
common = dict(
    is_nr_training_rays_dynamic=False,
    training_rays_batch_size=256,
    max_nr_samples_per_ray=32,
    max_nr_imp_samples_per_ray=16,
    do_importance_sampling=True,
    lr=3e-3,
    geom_feat_size=32,
    nr_samples_bg=8,
)
surf_hp = HyperParamsSuRF(
    init_phase_end_iter=max(300, args.surf_iters // 4),
    first_phase_end_iter=args.surf_iters,
    training_end_iter=args.surf_iters,
    nr_warmup_iters=100,
    lr_milestones=[int(args.surf_iters * 0.8)],
    eikonal_weight=0.04,
    offsurface_weight=1e-4,
    sdf_nr_iters_for_c2f=args.surf_iters // 2,
    **common,
)
offsets_hp = HyperParamsOffsetsSuRFs(
    init_phase_end_iter=args.offsets_iters // 5,
    color_init_phase_end_iter=args.offsets_iters // 4,
    first_phase_end_iter=args.offsets_iters // 2,
    training_end_iter=args.offsets_iters,
    nr_warmup_iters=50,
    lr_milestones=[int(args.offsets_iters * 0.8)],
    nr_inner_surfs=2,
    nr_outer_surfs=2,
    eikonal_weight=0.04,
    support_surfs_eikonal_weight=0.04,
    offsurface_weight=1e-4,
    sdf_nr_iters_for_c2f=0,
    **common,
)
volsurfs_hp = HyperParamsVolSurfs(
    is_nr_training_rays_dynamic=False,
    training_rays_batch_size=512,
    training_end_iter=args.volsurfs_iters,
    nr_warmup_iters=50,
    lr=5e-3,
    lr_milestones=[int(args.volsurfs_iters * 0.8)],
    using_neural_textures=True,
    using_neural_textures_lerp=True,
    using_sh_squeezing=True,
    appearance_predict_sh_coeffs=True,
    sh_degree=3 if HARD else 2,
    sh_range=[8, 8, 8, 8],
    textures_res=[1024, 512, 256, 128] if HARD else [512, 256, 128, 64],
    rgb_normal_dep=False,
    transp_normal_dep=False,
    rgb_geom_feat_dep=False,
    geom_feat_size=0,
    is_inner_mesh_solid=True,
    use_occupancy_grid=False,
)

t0 = time.time()
results = run_pipeline(
    mv, args.out, surf_hp, offsets_hp, volsurfs_hp,
    occupancy_res=args.occupancy_res or (128 if HARD else 64),
    mesh_extraction_res=args.mesh_res or (256 if HARD else 128),
    simplify_ratio=0.1,
    init_sphere_radius=0.4,
)
wall = time.time() - t0

# stage 6: baked re-render of the test cameras vs GT (the end product)
renderer = BakedMeshRenderer(results["volsurfs_dir"])
test = mv["test"]
baked_psnrs = []
for i, camera in enumerate(test.cameras):
    img = renderer.render_frame(camera)
    gt = np.asarray(test.rgbs[i]).reshape(args.res, args.res, 3)
    baked_psnrs.append(psnr(gt, np.asarray(img)))

out = {
    "wall_s": round(wall, 1),
    "meshes": results["meshes"],
    "surf_psnr": round(results["surf_test_metrics"]["psnr"], 2),
    "offsets_psnr": round(results["offsets_test_metrics"]["psnr"], 2),
    "volsurfs_psnr": round(results["volsurfs_test_metrics"]["psnr"], 2),
    "baked_render_psnr": round(float(np.mean(baked_psnrs)), 2),
}
with open(os.path.join(args.out, "results.json"), "w") as f:
    json.dump(out, f, indent=2)
print("RESULT:", json.dumps(out))

# regression gate vs the committed on-chip evidence (runs/pipeline_tpu/
# results.json: surf 22.75, offsets 23.74, volsurfs 22.95, baked 23.16 dB
# at the default arguments): a re-run that lands >2 dB below the committed
# numbers is a quality regression and must fail loudly, not get recorded.
# Only armed at the default budgets (shorter runs legitimately score lower).
_committed = os.path.join(
    os.path.dirname(__file__), "..", "runs", "pipeline_tpu", "results.json"
)
_defaults = args.scene == "sphere" and (
    args.res, args.surf_iters, args.offsets_iters, args.volsurfs_iters
) == (64, 2000, 1500, 1200)
if os.path.exists(_committed) and _defaults:
    with open(_committed) as f:
        ref = json.load(f)
    for k in ("surf_psnr", "offsets_psnr", "volsurfs_psnr", "baked_render_psnr"):
        assert out[k] > ref[k] - 2.0, (
            f"PSNR regression: {k} {out[k]} vs committed {ref[k]}"
        )
    print("regression gate: all stages within 2 dB of committed evidence")

# hard-scene per-stage loss gates (VERDICT r4 item 7): on a scene that does
# NOT saturate, baking must stay essentially lossless and the texture stage
# must stay close to the neural field it distills. Printed always, fatal on
# the hard scene.
bake_delta = out["volsurfs_psnr"] - out["baked_render_psnr"]
tex_delta = out["offsets_psnr"] - out["volsurfs_psnr"]
print(f"stage deltas: neural->baked {bake_delta:+.2f} dB, "
      f"offsets->volsurfs {tex_delta:+.2f} dB")
if args.scene == "hard":
    assert bake_delta < 0.5, f"baking lost {bake_delta:.2f} dB (gate 0.5)"
    assert tex_delta < 1.5, f"texture stage lost {tex_delta:.2f} dB (gate 1.5)"
    print("hard-scene gates: baked within 0.5 dB, volsurfs within 1.5 dB")
