"""Baker: mesh extraction, simplification, UV atlasing, texture baking and
scene.json export for the web viewer.

Re-implements the reference baker pipeline (volsurfs_py/baker.py, 1035
lines): --extract_meshes (marching on the trained SDF level sets, :324-452),
--simplify_meshes (:682-725), --compute_meshes_xatlas (:727-774) and
--extract_textures + scene.json (:778-1014). Stages communicate through the
run directory exactly like the reference (meshes/, meshes_simplified/,
meshes_simplified_uvs/, textures/, scene.json).
"""

from __future__ import annotations

import json
import os

import numpy as np

from volsurfs_tpu.baking import mesh_io
from volsurfs_tpu.baking.marching import extract_mesh_from_fn
from volsurfs_tpu.baking.simplify import simplify_mesh
from volsurfs_tpu.baking.uv_atlas import compute_atlas
from volsurfs_tpu.models.textures import DEG_NR_COEFFS


def extract_meshes_from_surf(method, state, resolution: int = 256, levels=(0.0,)):
    """Level-set meshes from a trained surf SDF (reference
    utils/mesh_extraction.py:426-491: marching over a chunked dense grid)."""
    import jax

    sdf_fn = jax.jit(
        lambda pts: method._sdf_fn(state.params, pts, state.iter_nr)[0][..., 0]
    )
    bounds = float(method.radius)
    meshes = []
    for level in levels:
        v, f = extract_mesh_from_fn(
            lambda p: np.asarray(sdf_fn(p)), resolution, bounds, level=level
        )
        meshes.append((v, f))
    return meshes


def extract_meshes_from_offsets_surfs(method, state, resolution: int = 256):
    """k zero-level-set meshes, inner -> outer
    (reference utils/mesh_extraction.py:375-407)."""
    import jax

    sdfs_fn = jax.jit(
        lambda pts: method._sdfs_fn(state.params, pts, state.iter_nr)[0][..., 0]
    )
    bounds = float(method.radius)
    meshes = []
    for surf_idx in range(method.nr_surfs):
        v, f = extract_mesh_from_fn(
            lambda p, si=surf_idx: np.asarray(sdfs_fn(p))[:, si],
            resolution,
            bounds,
        )
        meshes.append((v, f))
    return meshes


def simplify_and_atlas(meshes, target_faces_ratio: float = 0.025):
    """simplify -> atlas each mesh; returns [(verts, faces, uvs), ...].

    Empty extractions (a level set that left the grid bounds, e.g. offsets
    not yet converged) are dropped with a warning rather than crashing the
    pipeline."""
    out = []
    for i, (v, f) in enumerate(meshes):
        if f.shape[0] < 4:
            print(
                f"WARNING: mesh {i} extraction is empty/degenerate "
                f"({f.shape[0]} faces); skipping this shell"
            )
            continue
        sv, sf = simplify_mesh(v, f, target_faces_ratio)
        if sf.shape[0] < 4:
            sv, sf = v, f  # simplification degenerated; keep the original
        av, af, uv = compute_atlas(sv, sf)
        out.append((av, af, uv))
    return out


def save_meshes(run_dir: str, meshes, subdir: str = "meshes"):
    d = os.path.join(run_dir, subdir)
    os.makedirs(d, exist_ok=True)
    paths = []
    for i, mesh in enumerate(meshes):
        path = os.path.join(d, f"{i}.obj")
        if len(mesh) == 3:
            mesh_io.save_obj(path, mesh[0], mesh[1], mesh[2])
        else:
            mesh_io.save_obj(path, mesh[0], mesh[1])
        paths.append(path)
    return paths


def load_meshes(run_dir: str, subdir: str = "meshes"):
    d = os.path.join(run_dir, subdir)
    meshes = []
    for name in sorted(os.listdir(d), key=lambda s: int(os.path.splitext(s)[0])):
        meshes.append(mesh_io.load_obj(os.path.join(d, name)))
    return meshes


def _texel_center_uvs(res: int):
    """uv coords of all texel centers, row-major over (y, x), v flipped
    (texture conventions of models/textures.py)."""
    x = (np.arange(res) + 0.5) / res
    y = (np.arange(res) + 0.5) / res
    uu, vv = np.meshgrid(x, 1.0 - y, indexing="xy")
    return np.stack([uu.reshape(-1), vv.reshape(-1)], -1).astype(np.float32)


def bake_textures(method, state, run_dir: str, batch_size: int = 2**16):
    """Rasterize every SH band of every mesh's rgb+alpha textures to PNGs and
    return the meshes_info blocks for scene.json
    (reference baker.py:778-903 + save_textures_as_png :49-73).

    Output PNGs: one per SH feature, rgb+alpha packed as RGBA, values are the
    squeezed [0,1] texture outputs; texture_scale records the un-squeeze
    range.
    """
    import jax
    from PIL import Image

    hp = method.hp
    assert hp.using_neural_textures, "texture extraction requires neural textures"
    tex_dir = os.path.join(run_dir, "textures")
    os.makedirs(tex_dir, exist_ok=True)

    meshes_info = []
    for mesh_idx in range(method.nr_meshes):
        rgb_name = f"rgb_{mesh_idx if hp.are_volsurfs_colors_indep else 0}"
        alpha_name = f"alpha_{mesh_idx if hp.are_volsurfs_alphas_indep else 0}"
        ignore_alpha = method.solid_inner and mesh_idx == 0

        textures_info = []
        for deg in range(hp.sh_degree + 1):
            res = int(hp.textures_res[deg])
            uvs = _texel_center_uvs(res)
            nr_coeffs = DEG_NR_COEFFS[deg]

            def bake(params, model, d=deg):
                fn = jax.jit(
                    lambda uv: model.apply(
                        params, d, uv, method=type(model).bake_band
                    )
                )
                chunks = [
                    np.asarray(fn(uvs[i : i + batch_size]))
                    for i in range(0, uvs.shape[0], batch_size)
                ]
                return np.concatenate(chunks).reshape(res, res, -1)

            rgb_tex = bake(state.params[rgb_name], method.rgb_model)
            rgb_tex = rgb_tex.reshape(res, res, 3, nr_coeffs)
            if ignore_alpha:
                alpha_tex = np.ones((res, res, 1, nr_coeffs), np.float32)
            else:
                alpha_tex = bake(state.params[alpha_name], method.alpha_model)
                alpha_tex = alpha_tex.reshape(res, res, 1, nr_coeffs)

            tex = np.concatenate([rgb_tex, alpha_tex], axis=2)  # [res,res,4,C]
            tex = np.clip(tex, 0.0, 1.0)
            tex = np.flipud(tex).copy()

            for feat in range(nr_coeffs):
                img = (tex[:, :, :, feat] * 255.0).round().astype(np.uint8)
                fname = f"mesh_{mesh_idx}_texture_{deg}_feature_{feat}.png"
                Image.fromarray(img).save(os.path.join(tex_dir, fname))
                textures_info.append(
                    {
                        "texture_path": os.path.join("textures", fname),
                        "texture_scale": (
                            -float(hp.sh_range[deg]),
                            float(hp.sh_range[deg]),
                        ),
                        "texture_resolution": (res, res),
                    }
                )

        meshes_info.append(
            {
                "mesh_path": os.path.join("meshes", f"{mesh_idx}.obj"),
                "textures": textures_info,
                "ignore_alpha": ignore_alpha,
            }
        )
    return meshes_info


def export_scene_json(run_dir: str, meshes_info, mv_data=None, bg_color="black",
                      sh_degree: int = 3):
    """scene.json for the WebGL viewer (reference baker.py:959-1012 schema:
    resolution, bg_color, meshes, cameras with OpenGL matrices)."""
    scene_info = {"bg_color": bg_color or "black", "sh_degree": sh_degree,
                  "meshes": meshes_info}
    if mv_data is not None:
        split = next(iter(mv_data.splits.values()))
        cam0 = split.cameras[0]
        scene_info["resolution"] = [cam0.width, cam0.height]
        scene_info["cameras"] = {}
        for split_name, split in mv_data.splits.items():
            scene_info["cameras"][split_name] = {
                cam.camera_id: {
                    "projectionMatrix": cam.get_opengl_projection_matrix().tolist(),
                    "matrixWorld": cam.get_opengl_matrix_world().tolist(),
                }
                for cam in split.cameras
            }
    path = os.path.join(run_dir, "scene.json")
    with open(path, "w") as f:
        json.dump(scene_info, f, indent=2)
    return path


def main():
    """Baker CLI (reference baker.py:76-201 main + arg parsing): loads a
    trained run from the run directory, then performs the requested stages
    (--extract_meshes / --simplify_meshes / --compute_meshes_xatlas /
    --extract_bg_mesh / --extract_textures)."""
    import argparse

    import jax

    from volsurfs_tpu.datasets.mvdataset import MVDataset
    from volsurfs_tpu.ops.raycast import make_bounding_sphere
    from volsurfs_tpu.params.hyper_params import get_method_hyper_params
    from volsurfs_tpu.params.params import DataParams, PathsParams
    from volsurfs_tpu.training import checkpoints
    from volsurfs_tpu.training.trainer import make_method

    parser = argparse.ArgumentParser("volsurfs_tpu baker")
    parser.add_argument("--method", required=True,
                        choices=["surf", "nerf", "offsets_surfs", "volsurfs"])
    parser.add_argument("--dataset", default="synthetic")
    parser.add_argument("--scene", default="sphere")
    parser.add_argument("--exp_name", default="default")
    parser.add_argument("--run_id", required=True)
    parser.add_argument("--paths_config", default=None)
    parser.add_argument("--data_config", default=None)
    parser.add_argument("--datasets_path", default=None)
    parser.add_argument("--runs_path", default=None)
    parser.add_argument("--meshes_path", default=None)
    parser.add_argument("--extract_meshes", action="store_true")
    parser.add_argument("--simplify_meshes", action="store_true")
    parser.add_argument("--compute_meshes_xatlas", action="store_true")
    parser.add_argument("--extract_bg_mesh", action="store_true")
    parser.add_argument("--extract_textures", action="store_true")
    parser.add_argument("--extraction_res", type=int, default=256)
    parser.add_argument("--simplify_ratio", type=float, default=0.025)
    parser.add_argument("--occupancy_res", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "..", "config")
    paths_cfg = args.paths_config or os.path.join(cfg_dir, "paths_config.cfg")
    data_cfg = args.data_config or os.path.join(cfg_dir, "data_config.cfg")
    paths = PathsParams(paths_cfg if os.path.exists(paths_cfg) else None,
                        datasets=args.datasets_path, runs=args.runs_path)
    data_params = DataParams(
        args.dataset, args.scene, data_cfg if os.path.exists(data_cfg) else None
    )

    run_dir = os.path.join(
        paths.runs_path, args.method, args.exp_name, args.scene, args.run_id
    )
    exp_cfg = os.path.join(run_dir, "config", "exp_config.cfg")
    if not os.path.exists(exp_cfg):
        raise SystemExit(f"no exp config under {run_dir}/config")
    hp = get_method_hyper_params(args.method, exp_cfg)

    mv_data = MVDataset(args.dataset, args.scene, paths.datasets_path,
                        config=dict(data_params.dict))
    bounding = make_bounding_sphere(mv_data.scene_radius)
    method_kwargs = {}
    if args.method == "volsurfs":
        meshes_dir = args.meshes_path or os.path.join(run_dir, "meshes")
        mesh_files = sorted(
            f for f in os.listdir(meshes_dir) if f.endswith(".obj")
        )
        # same shell subsetting as training (reference mesh_loaders.py:34-90)
        if getattr(hp, "meshes_indices", None):
            mesh_files = [mesh_files[int(i)] for i in sorted(hp.meshes_indices)]
        method_kwargs["meshes"] = [
            mesh_io.load_obj(os.path.join(meshes_dir, f)) for f in mesh_files
        ]
    method = make_method(
        args.method, hp, bounding, mv_data.bg_color or data_params.bg_color,
        args.occupancy_res, jax.random.PRNGKey(args.seed), **method_kwargs,
    )
    state = checkpoints.load_checkpoint(
        os.path.join(run_dir, "checkpoints"), method.init_state()
    )
    print(f"loaded {args.method} checkpoint at iter {int(state.iter_nr)}")

    if args.extract_meshes:
        if args.method == "offsets_surfs":
            raw = extract_meshes_from_offsets_surfs(
                method, state, resolution=args.extraction_res
            )
        else:
            raw = extract_meshes_from_surf(
                method, state, resolution=args.extraction_res
            )
        out = os.path.join(run_dir, "meshes_raw")
        os.makedirs(out, exist_ok=True)
        for idx, (v, f) in enumerate(raw):
            mesh_io.save_obj(os.path.join(out, f"{idx}.obj"), v, f)
        print(f"extracted {len(raw)} meshes -> {out}")

    if args.simplify_meshes or args.compute_meshes_xatlas:
        src = os.path.join(run_dir, "meshes_raw")
        raw = []
        for fname in sorted(f for f in os.listdir(src) if f.endswith(".obj")):
            v, f, _ = mesh_io.load_obj(os.path.join(src, fname))
            raw.append((v, f))
        meshes = simplify_and_atlas(raw, args.simplify_ratio)
        save_meshes(run_dir, meshes)
        print(f"simplified+atlased {len(meshes)} meshes -> {run_dir}/meshes")

    if args.extract_bg_mesh:
        from volsurfs_tpu.baking.tsdf import fuse_depths
        from volsurfs_tpu.training.trainer import Trainer

        trainer = Trainer(method, mv_data, run_dir)
        split = mv_data["train"]
        depths, cams = [], []
        for i, cam in enumerate(split.cameras):
            out_frame = trainer.render_camera(state, cam)
            if "depth" in out_frame:
                depths.append(out_frame["depth"][..., 0])
                cams.append(cam)
        if depths:
            v, f = fuse_depths(depths, cams, resolution=args.extraction_res // 2,
                               bounds=float(mv_data.scene_radius) * 2.0)
            mesh_io.save_obj(os.path.join(run_dir, "bg_mesh.obj"), v, f)
            print(f"bg mesh: {v.shape[0]} verts")

    if args.extract_textures:
        assert args.method == "volsurfs", "--extract_textures requires volsurfs"
        # scene.json references meshes/ relative to the run dir; when the
        # shells were loaded from another stage's directory, copy them in
        # (reference volsurfs.py:79-101 copies meshes into the run dir)
        local_meshes = os.path.join(run_dir, "meshes")
        # mesh_files is the (possibly meshes_indices-subset) selection in
        # method order; scene.json hardcodes meshes/{i}.obj, so the selection
        # must ALWAYS be renumbered 0..k-1 — even when it was loaded from
        # run_dir/meshes with non-sequential names or an index subset. Read
        # the bytes first: with an in-place subset, destination names can
        # collide with not-yet-read sources.
        needs_renumber = (
            os.path.abspath(meshes_dir) != os.path.abspath(local_meshes)
            or mesh_files != [f"{i}.obj" for i in range(len(mesh_files))]
        )
        if needs_renumber:
            blobs = [
                open(os.path.join(meshes_dir, f), "rb").read()
                for f in mesh_files
            ]
            os.makedirs(local_meshes, exist_ok=True)
            for i, blob in enumerate(blobs):
                with open(os.path.join(local_meshes, f"{i}.obj"), "wb") as fh:
                    fh.write(blob)
        meshes_info = bake_textures(method, state, run_dir)
        scene_path = export_scene_json(
            run_dir, meshes_info, mv_data,
            bg_color=mv_data.bg_color or "black", sh_degree=hp.sh_degree,
        )
        print(f"scene.json -> {scene_path}")


if __name__ == "__main__":
    main()
