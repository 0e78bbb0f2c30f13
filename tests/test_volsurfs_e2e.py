"""End-to-end volsurfs: mesh extraction -> simplify -> atlas -> texture
training on analytic images -> render. Exercises the whole baked-path stack
(marching tetrahedra, native simplifier, LSCM atlas, BVH tracing, SH neural
textures, float16 compositing)."""

import jax
import numpy as np
import pytest

from volsurfs_tpu.baking.marching import extract_mesh_from_fn
from volsurfs_tpu.baking.simplify import simplify_mesh
from volsurfs_tpu.baking.uv_atlas import compute_atlas
from volsurfs_tpu.datasets.mvdataset import MVDataset
from volsurfs_tpu.methods.volsurfs import VolSurfs
from volsurfs_tpu.ops.raycast import make_bounding_sphere
from volsurfs_tpu.params.hyper_params import HyperParamsVolSurfs
from volsurfs_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def shell_meshes():
    meshes = []
    for radius in (0.45, 0.55):  # inner -> outer
        def sdf(p, r=radius):
            return np.linalg.norm(p, axis=-1) - r

        v, f = extract_mesh_from_fn(sdf, resolution=32)
        v, f = simplify_mesh(v, f, 0.25)
        v, f, uv = compute_atlas(v, f)
        meshes.append((v, f, uv))
    return meshes


@pytest.mark.slow
def test_volsurfs_trains_and_renders(shell_meshes, tmp_path):
    hp = HyperParamsVolSurfs(
        is_nr_training_rays_dynamic=False,
        training_rays_batch_size=128,
        training_end_iter=30,
        nr_warmup_iters=4,
        lr=5e-3,
        lr_milestones=[10000],
        using_neural_textures=True,
        using_neural_textures_lerp=True,
        using_sh_squeezing=True,
        using_sh_quantization=True,
        appearance_predict_sh_coeffs=True,
        sh_degree=1,
        sh_range=[15, 15, 15, 15],
        textures_res=[64, 64, 64, 64],
        rgb_view_dep=True,
        rgb_normal_dep=False,
        transp_normal_dep=False,
        rgb_geom_feat_dep=False,
        geom_feat_size=0,
        is_inner_mesh_solid=True,
        nr_samples_bg=8,
        use_occupancy_grid=False,
    )
    mv = MVDataset(
        "synthetic", "sphere", "",
        config={"width": 32, "height": 32, "nr_train_cameras": 6, "nr_test_cameras": 2},
    )
    method = VolSurfs(
        hp, shell_meshes, bg_color="white",
        bounding_primitive=make_bounding_sphere(1.0),
        key=jax.random.PRNGKey(0),
    )
    trainer = Trainer(method, mv, str(tmp_path), log_every=10)
    state = method.init_state()

    losses = []
    state = trainer.train(
        state, callback=lambda i, s, l: losses.append(float(l["loss"]))
    )
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    out = trainer.render_camera(state, mv["test"].cameras[0])
    assert out["rgb"].shape == (32, 32, 3)
    assert np.isfinite(out["rgb"]).all()

    # quality bar, not just a crash check (measured 18.2 dB at this budget;
    # 15 leaves ~3 dB margin so only a real regression fails)
    means = trainer.eval_split(state, "test", max_cameras=1)
    assert means["psnr"] > 15.0, means
    # silhouette should be opaque-ish (solid inner mesh), bg transparent
    bg_T = out["bg_transmittance"]
    assert bg_T.min() < 0.1  # rays through the sphere blocked
    assert bg_T.max() > 0.9  # rays missing it pass through
