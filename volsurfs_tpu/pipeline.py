"""Full VolSurfs pipeline: surf -> offsets_surfs -> bake meshes -> volsurfs
-> bake textures + scene.json.

Python equivalent of the reference's bash orchestration
(reference scripts/train.sh:14-21 chaining scripts/{surf,offsets_surfs,
volsurfs}.sh and baker invocations; stages communicate through the run
directory, SURVEY.md §3.6). Each stage is resumable through its own
checkpoint directory.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from volsurfs_tpu.baking import baker
from volsurfs_tpu.datasets.mvdataset import MVDataset
from volsurfs_tpu.methods.offsets_surfs import OffsetsSurfs
from volsurfs_tpu.methods.surf import Surf
from volsurfs_tpu.methods.volsurfs import VolSurfs
from volsurfs_tpu.ops.raycast import make_bounding_sphere
from volsurfs_tpu.training import checkpoints
from volsurfs_tpu.training.trainer import Trainer


def _maybe_resume(run_dir: str, state):
    """Resume a stage from its latest checkpoint if one exists (reference
    trainer.py:659-663 --continue_training; stages communicate through the
    run dir, SURVEY.md §3.6)."""
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    if checkpoints.get_last_checkpoint_in_path(ckpt_dir) is None:
        return state
    try:
        state = checkpoints.load_checkpoint(ckpt_dir, state)
        print(f"[pipeline] resumed {run_dir} at iter {int(state.iter_nr)}",
              flush=True)
    except Exception as e:  # stale/incompatible checkpoint: train fresh
        print(f"[pipeline] could not resume {run_dir}: {e}", flush=True)
    return state


def run_pipeline(
    mv_data: MVDataset,
    runs_root: str,
    surf_hp,
    offsets_hp,
    volsurfs_hp,
    occupancy_res: int = 256,
    mesh_extraction_res: int = 256,
    simplify_ratio: float = 0.025,
    init_sphere_radius: float | None = None,
    seed: int = 0,
    eval_splits: bool = True,
):
    """Runs the three training stages + two baking stages. Returns a dict of
    per-stage run dirs, final states and eval metrics."""
    key = jax.random.PRNGKey(seed)
    k_surf, k_offs, k_vs = jax.random.split(key, 3)
    bound = make_bounding_sphere(mv_data.scene_radius)
    bg_color = mv_data.bg_color
    results = {}
    init_radius = (
        init_sphere_radius
        if init_sphere_radius is not None
        else mv_data.init_sphere_scale * float(mv_data.scene_radius)
    )

    # ---- stage 1: surf (reference scripts/surf.sh) --------------------------
    surf_dir = os.path.join(runs_root, "surf")
    surf = Surf(
        surf_hp, bound, bg_color=bg_color, init_sphere_radius=init_radius,
        occupancy_res=occupancy_res, key=k_surf,
    )
    trainer = Trainer(surf, mv_data, surf_dir)
    surf_state = trainer.train(_maybe_resume(surf_dir, surf.init_state()))
    if eval_splits:
        results["surf_test_metrics"] = trainer.eval_split(surf_state, "test")
    results["surf_dir"] = surf_dir

    # ---- stage 2: offsets_surfs, loading surf's sdf
    # (reference offsets_surfs.sh:93-94 --models_path) ------------------------
    offs_dir = os.path.join(runs_root, "offsets_surfs")
    offs = OffsetsSurfs(
        offsets_hp, bound, bg_color=bg_color, occupancy_res=occupancy_res, key=k_offs
    )
    offs_state = offs.init_state()
    offs_state = offs.load_main_sdf(offs_state, surf_state.params["sdf"])
    if "bg" in surf_state.params and "bg" in offs_state.params:
        params = dict(offs_state.params)
        params["bg"] = surf_state.params["bg"]
        offs_state = offs_state.replace(params=params)
    offs_state = _maybe_resume(offs_dir, offs_state)
    trainer = Trainer(offs, mv_data, offs_dir)
    offs_state = trainer.train(offs_state)
    if eval_splits:
        results["offsets_test_metrics"] = trainer.eval_split(offs_state, "test")
    results["offsets_dir"] = offs_dir

    # ---- stage 3: bake meshes (reference baker --extract_meshes
    # --simplify_meshes --compute_meshes_xatlas) -------------------------------
    raw_meshes = baker.extract_meshes_from_offsets_surfs(
        offs, offs_state, resolution=mesh_extraction_res
    )
    meshes = baker.simplify_and_atlas(raw_meshes, simplify_ratio)
    vs_dir = os.path.join(runs_root, "volsurfs")
    os.makedirs(vs_dir, exist_ok=True)
    baker.save_meshes(vs_dir, meshes)
    results["meshes"] = [(v.shape[0], f.shape[0]) for v, f, _ in meshes]

    # ---- stage 4: volsurfs texture training (reference volsurfs.sh) ----------
    vs = VolSurfs(
        volsurfs_hp, meshes, bg_color=bg_color, bounding_primitive=bound, key=k_vs
    )
    vs_state = vs.init_state()
    if "bg" in offs_state.params and "bg" in vs_state.params:
        params = dict(vs_state.params)
        params["bg"] = offs_state.params["bg"]
        vs_state = vs_state.replace(params=params)
    vs_state = _maybe_resume(vs_dir, vs_state)
    trainer = Trainer(vs, mv_data, vs_dir)
    vs_state = trainer.train(vs_state)
    if eval_splits:
        results["volsurfs_test_metrics"] = trainer.eval_split(vs_state, "test")
    results["volsurfs_dir"] = vs_dir

    # ---- stage 5: bake textures + scene.json (reference baker
    # --extract_textures) -------------------------------------------------------
    if volsurfs_hp.using_neural_textures:
        meshes_info = baker.bake_textures(vs, vs_state, vs_dir)
        scene_path = baker.export_scene_json(
            vs_dir, meshes_info, mv_data,
            bg_color=bg_color or "black", sh_degree=volsurfs_hp.sh_degree,
        )
        results["scene_json"] = scene_path

    results["states"] = {
        "surf": surf_state, "offsets_surfs": offs_state, "volsurfs": vs_state,
    }
    return results
