"""CLI pipeline integration test: drives trainer.main() and baker.main()
through all five scripts/train.sh stages (surf -> offsets_surfs with
--models_path -> bake shells -> volsurfs with --meshes_path/--models_path ->
bake textures + scene.json) via argv injection on the tiny synthetic scene.

This covers the reference-parity CLI chain (reference scripts/train.sh:14-21,
offsets_surfs.sh:93-94, volsurfs.sh:100-104) that the in-process
pipeline test (test_pipeline_e2e.py) does not exercise — in particular the
cross-stage --models_path transfer through msgpack files on disk.
"""

import json
import os
import sys

import numpy as np
import pytest

SURF_CFG = """
hyper_params: {
    init_phase_end_iter: 40
    nr_warmup_iters: 10
    lr_milestones: [10000]
    training_end_iter: 120
    first_phase_end_iter: 400
    training_rays_batch_size: 96
    is_nr_training_rays_dynamic: 0
    geom_feat_size: 16
    sdf_encoding_type: "gridhash"
    rgb_pos_encoder_type: "gridhash"
    do_importance_sampling: 1
    max_nr_samples_per_ray: 16
    max_nr_imp_samples_per_ray: 8
    nr_samples_bg: 8
    sdf_nr_iters_for_c2f: 0
    eikonal_weight: 0.04
    curvature_weight: 0.0
    offsurface_weight: 1e-4
    lr: 3e-3
}
"""

OFFSETS_CFG = """
hyper_params: {
    init_phase_end_iter: 80
    color_init_phase_end_iter: 100
    first_phase_end_iter: 160
    training_end_iter: 180
    nr_warmup_iters: 8
    lr_milestones: [10000]
    nr_inner_surfs: 1
    nr_outer_surfs: 1
    training_rays_batch_size: 96
    is_nr_training_rays_dynamic: 0
    geom_feat_size: 16
    sdf_encoding_type: "gridhash"
    rgb_pos_encoder_type: "gridhash"
    do_importance_sampling: 1
    max_nr_samples_per_ray: 16
    max_nr_imp_samples_per_ray: 8
    nr_samples_bg: 8
    sdf_nr_iters_for_c2f: 0
    eikonal_weight: 0.04
    support_surfs_eikonal_weight: 0.04
    curvature_weight: 0.0
    offsurface_weight: 1e-4
    lr: 3e-3
}
"""

VOLSURFS_CFG = """
hyper_params: {
    training_end_iter: 40
    nr_warmup_iters: 5
    lr_milestones: [10000]
    training_rays_batch_size: 128
    is_nr_training_rays_dynamic: 0
    lr: 5e-3
    using_neural_textures: 1
    using_neural_textures_lerp: 1
    using_sh_squeezing: 1
    appearance_predict_sh_coeffs: 1
    sh_degree: 1
    sh_range: [8, 8, 8, 8]
    textures_res: [64, 64, 64, 64]
    rgb_normal_dep: 0
    transp_normal_dep: 0
    rgb_geom_feat_dep: 0
    geom_feat_size: 0
    is_inner_mesh_solid: 1
    use_occupancy_grid: 0
}
"""

DATA_CFG = """
synthetic: {
    bg_color: "white"
    width: 32
    height: 32
    nr_train_cameras: 6
    nr_test_cameras: 2
}
"""

TRAIN_CFG = """
train: {
    with_wandb: 0
    save_checkpoints: 1
    compute_test_loss: 0
    eval_test: 0
    eval_train: 0
}
"""


def _run_main(monkeypatch, main_fn, argv):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    main_fn()


@pytest.mark.slow
def test_cli_five_stage_pipeline(tmp_path, monkeypatch):
    from volsurfs_tpu.baking.baker import main as baker_main
    from volsurfs_tpu.training.trainer import main as trainer_main

    cfg_dir = tmp_path / "config"
    cfg_dir.mkdir()
    (cfg_dir / "surf.cfg").write_text(SURF_CFG)
    (cfg_dir / "offsets.cfg").write_text(OFFSETS_CFG)
    (cfg_dir / "volsurfs.cfg").write_text(VOLSURFS_CFG)
    (cfg_dir / "data.cfg").write_text(DATA_CFG)
    (cfg_dir / "train.cfg").write_text(TRAIN_CFG)
    runs = str(tmp_path / "runs")
    run_id = "pipeline"
    common = [
        "--dataset", "synthetic", "--scene", "sphere", "--exp_name", "t",
        "--run_id", run_id, "--runs_path", runs,
        "--data_config", str(cfg_dir / "data.cfg"),
        "--occupancy_res", "24",
    ]
    trainer_common = common + ["--train_config", str(cfg_dir / "train.cfg")]
    surf_dir = os.path.join(runs, "surf", "t", "sphere", run_id)
    offs_dir = os.path.join(runs, "offsets_surfs", "t", "sphere", run_id)
    vs_dir = os.path.join(runs, "volsurfs", "t", "sphere", run_id)

    # stage 1: surf
    _run_main(monkeypatch, trainer_main, [
        "--method", "surf", "--exp_config", str(cfg_dir / "surf.cfg"),
    ] + trainer_common)
    last_surf = sorted(os.listdir(os.path.join(surf_dir, "checkpoints")))[-1]
    surf_models = os.path.join(surf_dir, "checkpoints", last_surf, "models")
    assert os.path.exists(os.path.join(surf_models, "sdf.msgpack"))

    # stage 2: offsets_surfs warm-started from surf's sdf.msgpack on disk
    _run_main(monkeypatch, trainer_main, [
        "--method", "offsets_surfs", "--exp_config", str(cfg_dir / "offsets.cfg"),
        "--models_path", surf_models,
    ] + trainer_common)
    last_offs = sorted(os.listdir(os.path.join(offs_dir, "checkpoints")))[-1]
    offs_models = os.path.join(offs_dir, "checkpoints", last_offs, "models")

    # stage 3: extract + simplify + atlas shells
    _run_main(monkeypatch, baker_main, [
        "--method", "offsets_surfs",
        "--extract_meshes", "--simplify_meshes", "--compute_meshes_xatlas",
        "--extraction_res", "32", "--simplify_ratio", "0.3",
    ] + common)
    meshes_dir = os.path.join(offs_dir, "meshes")
    meshes = [f for f in os.listdir(meshes_dir) if f.endswith(".obj")]
    assert len(meshes) >= 2

    # stage 4: volsurfs textures on the shells
    _run_main(monkeypatch, trainer_main, [
        "--method", "volsurfs", "--exp_config", str(cfg_dir / "volsurfs.cfg"),
        "--meshes_path", meshes_dir, "--models_path", offs_models,
    ] + trainer_common)

    # stage 5: bake textures + scene.json
    _run_main(monkeypatch, baker_main, [
        "--method", "volsurfs", "--extract_textures",
        "--meshes_path", meshes_dir,
    ] + common)
    scene_json = os.path.join(vs_dir, "scene.json")
    assert os.path.exists(scene_json)
    with open(scene_json) as f:
        scene = json.load(f)
    assert len(scene["meshes"]) == len(meshes)
    # meshes were copied into the volsurfs run dir so scene.json is
    # self-contained (reference volsurfs.py:79-101)
    for info in scene["meshes"]:
        assert os.path.exists(os.path.join(vs_dir, info["mesh_path"]))
        for tex in info["textures"]:
            assert os.path.exists(os.path.join(vs_dir, tex["texture_path"]))

    # the baked scene re-renders finite images
    from volsurfs_tpu.datasets.mvdataset import MVDataset
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer

    mv = MVDataset("synthetic", "sphere", "", config={
        "width": 32, "height": 32, "nr_train_cameras": 1, "nr_test_cameras": 1,
    })
    renderer = BakedMeshRenderer(vs_dir)
    img = renderer.render(mv["test"].cameras[0])
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
