"""Baker + baked renderer round trip: train volsurfs textures briefly, bake
PNGs + scene.json, reload with BakedMeshRenderer and check the baked render
approximates the neural render."""

import jax
import numpy as np

from volsurfs_tpu.baking import baker
from volsurfs_tpu.baking.marching import extract_mesh_from_fn
from volsurfs_tpu.baking.simplify import simplify_mesh
from volsurfs_tpu.baking.uv_atlas import compute_atlas
from volsurfs_tpu.datasets.mvdataset import MVDataset
from volsurfs_tpu.methods.volsurfs import VolSurfs
from volsurfs_tpu.ops.raycast import make_bounding_sphere
from volsurfs_tpu.params.hyper_params import HyperParamsVolSurfs
from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer
from volsurfs_tpu.training.trainer import Trainer


def test_bake_and_rerender(tmp_path):
    run_dir = str(tmp_path)

    def sdf(p):
        return np.linalg.norm(p, axis=-1) - 0.5

    v, f = extract_mesh_from_fn(sdf, resolution=24)
    v, f = simplify_mesh(v, f, 0.3)
    v, f, uv = compute_atlas(v, f)
    meshes = [(v, f, uv)]

    hp = HyperParamsVolSurfs(
        is_nr_training_rays_dynamic=False,
        training_rays_batch_size=128,
        training_end_iter=25,
        nr_warmup_iters=2,
        lr=5e-3,
        lr_milestones=[10000],
        using_neural_textures=True,
        using_neural_textures_lerp=True,
        using_sh_squeezing=True,
        appearance_predict_sh_coeffs=True,
        sh_degree=1,
        sh_range=[8, 8, 8, 8],
        textures_res=[64, 64, 64, 64],
        rgb_normal_dep=False,
        transp_normal_dep=False,
        rgb_geom_feat_dep=False,
        geom_feat_size=0,
        is_inner_mesh_solid=True,
        use_occupancy_grid=False,
    )
    mv = MVDataset(
        "synthetic", "sphere", "",
        config={"width": 24, "height": 24, "nr_train_cameras": 4, "nr_test_cameras": 1},
    )
    method = VolSurfs(
        hp, meshes, bg_color="white",
        bounding_primitive=make_bounding_sphere(1.0), key=jax.random.PRNGKey(0),
    )
    trainer = Trainer(method, mv, run_dir, log_every=10)
    state = trainer.train(method.init_state())

    # bake
    baker.save_meshes(run_dir, meshes)
    meshes_info = baker.bake_textures(method, state, run_dir)
    scene_path = baker.export_scene_json(
        run_dir, meshes_info, mv, bg_color="white", sh_degree=hp.sh_degree
    )
    import os

    assert os.path.exists(scene_path)
    assert len(meshes_info) == 1
    # sh_degree 1 -> bands [1, 3] -> 4 feature pngs
    assert len(meshes_info[0]["textures"]) == 4

    # reload + render
    renderer = BakedMeshRenderer(run_dir)
    cam = mv["test"].cameras[0]
    baked_img = renderer.render(cam)
    assert baked_img.shape == (24, 24, 3)
    assert np.isfinite(baked_img).all()

    neural_img = trainer.render_camera(state, cam)["rgb"]
    # baked path should approximate the neural render (quantization +
    # filtering differences allowed)
    diff = np.abs(baked_img - neural_img.clip(0, 1)).mean()
    assert diff < 0.15, f"baked render deviates too much: {diff}"
