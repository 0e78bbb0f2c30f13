"""Time offsets_surfs and volsurfs train steps on the real chip at
reference-like workload shapes (companion to bench_train.py's surf number)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(step, state, batch, label):
    t0 = time.perf_counter()
    state, losses = step(state, batch)
    print(f"{label}: loss={float(losses['loss']):.4f} "
          f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            state, losses = step(state, batch)
        float(losses["loss"])
        ts.append((time.perf_counter() - t0) / 5)
    print(f"{label} train_step: {min(ts)*1e3:.0f} ms ({1/min(ts):.2f} iters/s)",
          flush=True)


def ray_batch(rays):
    key = jax.random.PRNGKey(1)
    o = jax.random.normal(key, (rays, 3))
    o = 2.0 * o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    return {
        "rays_o": o.astype(jnp.float32),
        "rays_d": d.astype(jnp.float32),
        "gt_rgb": jnp.ones((rays, 3), jnp.float32),
        "gt_mask": jnp.ones((rays, 1), jnp.float32),
        "camera_idx": jnp.zeros((rays,), jnp.int32),
    }


def bench_offsets():
    from volsurfs_tpu.methods.offsets_surfs import OffsetsSurfs
    from volsurfs_tpu.ops.raycast import make_bounding_sphere
    from volsurfs_tpu.params.hyper_params import HyperParamsOffsetsSuRFs

    rays = 512
    hp = HyperParamsOffsetsSuRFs(
        is_nr_training_rays_dynamic=False,
        training_rays_batch_size=rays,
        max_nr_samples_per_ray=64,
        max_nr_imp_samples_per_ray=32,
        do_importance_sampling=True,
        nr_inner_surfs=2,
        nr_outer_surfs=2,
        init_phase_end_iter=0,
        first_phase_end_iter=100,
        training_end_iter=50_000,
        nr_warmup_iters=5,
        lr_milestones=[25_000],
        eikonal_weight=0.04,
        support_surfs_eikonal_weight=0.1,
        offsurface_weight=1e-4,
        curvature_weight=1.0,
        geom_feat_size=32,
        sdf_nr_iters_for_c2f=0,
        nr_samples_bg=32,
    )
    method = OffsetsSurfs(
        hp, make_bounding_sphere(1.0), bg_color="white",
        occupancy_res=128, key=jax.random.PRNGKey(0),
    )
    state = method.init_state()
    timeit(method.train_step, state, ray_batch(rays), "offsets_surfs(5)")


def bench_volsurfs():
    from volsurfs_tpu.baking.marching import extract_mesh_from_fn
    from volsurfs_tpu.baking.simplify import simplify_mesh
    from volsurfs_tpu.baking.uv_atlas import compute_atlas
    from volsurfs_tpu.methods.volsurfs import VolSurfs
    from volsurfs_tpu.ops.raycast import make_bounding_sphere
    from volsurfs_tpu.params.hyper_params import HyperParamsVolSurfs

    meshes = []
    for radius in np.linspace(0.42, 0.58, 5):
        def sdf(p, r=radius):
            bump = 0.03 * np.sin(8*p[:,0]) * np.sin(8*p[:,1]) * np.sin(8*p[:,2])
            return np.linalg.norm(p, axis=-1) - r + bump
        v, f = extract_mesh_from_fn(sdf, resolution=96)
        v, f = simplify_mesh(v, f, 0.1)
        meshes.append(compute_atlas(v, f))

    rays = 512
    hp = HyperParamsVolSurfs(
        is_nr_training_rays_dynamic=False,
        training_rays_batch_size=rays,
        using_neural_textures=True,
        using_neural_textures_lerp=True,
        using_sh_squeezing=True,
        appearance_predict_sh_coeffs=True,
        sh_degree=3,
        textures_res=[2048, 1024, 512, 256],
        rgb_normal_dep=False,
        transp_normal_dep=False,
        rgb_geom_feat_dep=False,
        geom_feat_size=0,
        is_inner_mesh_solid=True,
        use_occupancy_grid=False,
        lr_milestones=[10_000],
        nr_warmup_iters=5,
    )
    method = VolSurfs(
        hp, meshes, bg_color="white",
        bounding_primitive=make_bounding_sphere(1.0), key=jax.random.PRNGKey(0),
    )
    state = method.init_state()
    timeit(method.train_step, state, ray_batch(rays), "volsurfs(5-mesh)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "offsets"):
        bench_offsets()
    if which in ("all", "volsurfs"):
        bench_volsurfs()
