"""Static-shape / memory envelope stress on the real chip.

Three probes at the reference's production shapes (none covered by the
small-shape tests), each reported pass/fail with timing:

1. one 800x800 baked frame render (reference eval resolution,
   volsurfs_py README.md:70-92 / renderer defaults) on the bench scene;
2. one volsurfs training step at 2048^2 textures and 9 shells
   (config/volsurfs/base_9.cfg);
3. one surf eval render chunk of 16384 rays
   (config/surf/base.cfg test chunk size).

Run: python scripts/stress_envelope.py   (on the TPU host)
Appends nothing; prints a short report to copy into RESULTS.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def probe(name, fn):
    t0 = time.perf_counter()
    try:
        detail = fn()
        dt = time.perf_counter() - t0
        print(f"PASS  {name}: {dt:.1f} s  {detail or ''}", flush=True)
    except Exception as e:
        dt = time.perf_counter() - t0
        print(f"FAIL  {name}: {dt:.1f} s  {type(e).__name__}: {e}", flush=True)
        traceback.print_exc()


def frame_800():
    from bench import build_scene
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer
    from volsurfs_tpu.renderers.viewer import OrbitCamera

    scene_dir = os.path.join(tempfile.gettempdir(), "volsurfs_bench_scene")
    if not os.path.exists(os.path.join(scene_dir, "scene.json")):
        build_scene(scene_dir)
    renderer = BakedMeshRenderer(scene_dir, bg_color="white")
    oc = OrbitCamera(800, 800, radius=2.0)
    oc.elevation = 0.3
    img = renderer.render_frame(oc.camera())
    assert img.shape == (800, 800, 3) and np.isfinite(img).all()
    # timed second frame (compile excluded)
    oc.azimuth = 0.3
    t0 = time.perf_counter()
    img = renderer.render_frame(oc.camera())
    float(np.asarray(img).mean())
    dt = time.perf_counter() - t0
    ovf = renderer.fallback_counts
    return f"frame {dt*1e3:.0f} ms ({0.64/dt:.2f} Mpix/s incl. dispatch), fallbacks={dict(ovf)}"


def volsurfs_9shell_2048():
    from volsurfs_tpu.baking.marching import extract_mesh_from_fn
    from volsurfs_tpu.baking.simplify import simplify_mesh
    from volsurfs_tpu.baking.uv_atlas import compute_atlas
    from volsurfs_tpu.methods.volsurfs import VolSurfs
    from volsurfs_tpu.ops.raycast import make_bounding_sphere
    from volsurfs_tpu.params.hyper_params import HyperParamsVolSurfs

    meshes = []
    for k in range(9):
        radius = 0.40 + 0.025 * k

        def sdf(p, r=radius):
            return np.linalg.norm(p, axis=-1) - r

        v, f = extract_mesh_from_fn(sdf, resolution=48)
        v, f = simplify_mesh(v, f, 0.25)
        v, f, uv = compute_atlas(v, f)
        meshes.append((v, f, uv))

    hp = HyperParamsVolSurfs(
        is_nr_training_rays_dynamic=False,
        training_rays_batch_size=512,
        training_end_iter=100,
        nr_warmup_iters=4,
        lr=5e-3,
        lr_milestones=[10000],
        using_neural_textures=True,
        using_neural_textures_lerp=True,
        using_sh_squeezing=True,
        using_sh_quantization=True,
        appearance_predict_sh_coeffs=True,
        sh_degree=3,
        sh_range=[15, 15, 15, 15],
        textures_res=[2048, 1024, 512, 256],
        rgb_view_dep=True,
        rgb_normal_dep=False,
        transp_normal_dep=False,
        rgb_geom_feat_dep=False,
        geom_feat_size=0,
        is_inner_mesh_solid=True,
        nr_samples_bg=8,
        use_occupancy_grid=False,
    )
    method = VolSurfs(
        hp, meshes, bg_color="white",
        bounding_primitive=make_bounding_sphere(1.0),
        key=jax.random.PRNGKey(0),
    )
    state = method.init_state()
    R = hp.training_rays_batch_size
    k = jax.random.PRNGKey(1)
    o = jax.random.normal(k, (R, 3))
    o = 2.0 * o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    batch = {
        "rays_o": o.astype(jnp.float32),
        "rays_d": (-o / 2.0).astype(jnp.float32),
        "gt_rgb": jnp.ones((R, 3), jnp.float32),
        "gt_mask": jnp.ones((R, 1), jnp.float32),
    }
    t0 = time.perf_counter()
    state, losses = method.train_step(state, batch)
    float(losses["loss"])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = method.train_step(state, batch)
        float(losses["loss"])
        ts.append(time.perf_counter() - t0)
    return (
        f"step {min(ts)*1e3:.0f} ms ({1.0/min(ts):.2f} it/s), "
        f"compile {compile_s:.0f} s, 9 shells, textures [2048,1024,512,256]"
    )


def surf_16384_chunk():
    from volsurfs_tpu.methods.surf import Surf
    from volsurfs_tpu.ops.raycast import make_bounding_sphere
    from volsurfs_tpu.params.hyper_params import HyperParamsSuRF

    hp = HyperParamsSuRF(
        is_nr_training_rays_dynamic=False,
        training_rays_batch_size=512,
        max_nr_samples_per_ray=64,
        max_nr_imp_samples_per_ray=32,
        do_importance_sampling=True,
        init_phase_end_iter=100,
        first_phase_end_iter=100000,
        training_end_iter=100000,
        nr_warmup_iters=50,
        lr=3e-3,
        lr_milestones=[80000],
        eikonal_weight=0.04,
        offsurface_weight=1e-4,
        geom_feat_size=32,
        sdf_nr_iters_for_c2f=0,
        nr_samples_bg=8,
    )
    method = Surf(
        hp, make_bounding_sphere(1.0), bg_color="white",
        init_sphere_radius=0.4, occupancy_res=128, key=jax.random.PRNGKey(0),
    )
    state = method.init_state()
    render = method.make_render_fn(chunk_size=16384)
    R = 16384
    k = jax.random.PRNGKey(1)
    o = jax.random.normal(k, (R, 3))
    o = 2.0 * o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    t0 = time.perf_counter()
    out = render(state.params, state.grid, o, d, state.iter_nr)
    float(jnp.sum(out["rgb"]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = render(state.params, state.grid, o, d, state.iter_nr)
    float(jnp.sum(out["rgb"]))
    dt = time.perf_counter() - t0
    return f"16384-ray eval chunk {dt*1e3:.0f} ms, compile {compile_s:.0f} s"


def main():
    print(f"devices: {jax.devices()}", flush=True)
    probe("baked 800x800 frame", frame_800)
    probe("volsurfs step, 9 shells + 2048^2 textures", volsurfs_9shell_2048)
    probe("surf 16384-ray eval chunk", surf_16384_chunk)


if __name__ == "__main__":
    main()
