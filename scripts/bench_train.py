"""Time the surf train step on the real chip at the reference workload shape
(512 rays x (64 uniform + 32 importance) samples, permuto encoder)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from __graft_entry__ import _tiny_surf
    from volsurfs_tpu.methods.surf import Surf
    from volsurfs_tpu.ops.raycast import make_bounding_sphere
    from volsurfs_tpu.params.hyper_params import HyperParamsSuRF

    rays = 512
    hp = HyperParamsSuRF(
        is_nr_training_rays_dynamic=False,
        training_rays_batch_size=rays,
        max_nr_samples_per_ray=64,
        max_nr_imp_samples_per_ray=32,
        do_importance_sampling=True,
        init_phase_end_iter=0,
        first_phase_end_iter=2000,
        training_end_iter=100_000,
        nr_warmup_iters=5,
        lr_milestones=[50_000],
        eikonal_weight=0.04,
        offsurface_weight=1e-4,
        curvature_weight=float(sys.argv[2]) if len(sys.argv) > 2 else 1.0,
        geom_feat_size=32,
        sdf_nr_iters_for_c2f=10_000,
        nr_samples_bg=32,
    )
    bound = make_bounding_sphere(1.0)
    method = Surf(
        hp, bound, bg_color="white", init_sphere_radius=0.4,
        occupancy_res=128, key=jax.random.PRNGKey(0),
    )
    state = method.init_state()

    key = jax.random.PRNGKey(1)
    o = jax.random.normal(key, (rays, 3))
    o = 2.0 * o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    batch = {
        "rays_o": o.astype(jnp.float32),
        "rays_d": d.astype(jnp.float32),
        "gt_rgb": jnp.ones((rays, 3), jnp.float32),
        "gt_mask": jnp.ones((rays, 1), jnp.float32),
        "camera_idx": jnp.zeros((rays,), jnp.int32),
    }

    t0 = time.perf_counter()
    state, losses = method.train_step(state, batch)
    print(f"loss={float(losses['loss']):.4f}  (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)

    G = 5
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(G):
            state, losses = method.train_step(state, batch)
        float(losses["loss"])
        ts.append((time.perf_counter() - t0) / G)
    print(f"train_step: {min(ts)*1e3:.0f} ms  ({1/min(ts):.2f} iters/s)")


if __name__ == "__main__":
    main()
