"""Stage-level timing of the surf train step on the real chip at the
reference workload shape (512 rays x (64 uniform + 32 importance) samples).

Times each forward-pass piece, then forward loss / grad / full step, so the
non-scatter cost (RESULTS.md) can be attributed. Stages are timed INSIDE
one executable via a fori_loop of dependent evaluations (per-dispatch
tunnel overhead is ~25 ms; see profile_frame.py)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timed_inner(fn, *args, iters=10, reps=3):
    """fn(acc_scalar, *args) -> pytree; seconds per eval net of dispatch."""

    def reduce_out(out):
        # mask non-finite leaves so the chained carry stays finite (an inf
        # carry would NaN-perturb later iterations' inputs; see
        # profile_frame.timed_inner)
        leaves = jax.tree.leaves(out)
        return sum(
            jnp.sum(jnp.where(jnp.isfinite(xf), xf, 0.0))
            for xf in (x.astype(jnp.float32) for x in leaves)
        )

    def make(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                return reduce_out(fn(acc * 1e-38, *a)) * 1e-20 + acc * 0.5
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    run_n, run_1 = make(iters), make(1)
    float(run_n(*args))
    float(run_1(*args))
    tn, t1 = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_n(*args))
        tn.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run_1(*args))
        t1.append(time.perf_counter() - t0)
    return (min(tn) - min(t1)) / (iters - 1)


def main():
    from volsurfs_tpu.methods.surf import Surf
    from volsurfs_tpu.ops import raycast as RC
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
        curvature_weight=float(sys.argv[1]) if len(sys.argv) > 1 else 1.0,
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
    params = state.params
    grid = state.grid

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
    iter_nr = jnp.asarray(3000, jnp.float32)
    raycast = RC.intersect_bounding_primitive(bound, o, d)

    # ---- sampling -----------------------------------------------------------
    def stage_samples(acc, params, grid, o, d, key):
        s = method._sample_rays(
            params, grid, o + acc, d, raycast["t_near"], raycast["t_far"],
            iter_nr, key, True,
        )
        return (s.z, s.mask)

    t = timed_inner(stage_samples, params, grid, o, d, key)
    print(f"sample_rays (occupancy DDA + 2-round importance): {t*1e3:.1f} ms",
          flush=True)

    samples = jax.jit(
        lambda p, g, o_, d_, k: method._sample_rays(
            p, g, o_, d_, raycast["t_near"], raycast["t_far"], iter_nr, k, True
        )
    )(params, grid, o, d, key)
    pos = samples.positions()
    S = pos.shape[1]
    print(f"  sample tensor: [{rays}, {S}]", flush=True)

    # ---- field evals ----------------------------------------------------------
    t = timed_inner(
        lambda acc, p, x: method._sdf_fn(p, x + acc, iter_nr), params, pos
    )
    print(f"sdf eval [{rays}x{S}] (no grads): {t*1e3:.1f} ms", flush=True)

    t = timed_inner(
        lambda acc, p, x: method._sdf_with_grad(p, x + acc, iter_nr),
        params, pos,
    )
    print(f"sdf eval with analytic grad: {t*1e3:.1f} ms", flush=True)

    sdf, geom_feat, sdf_grad = jax.jit(
        lambda p, x: method._sdf_with_grad(p, x, iter_nr)
    )(params, pos)

    t = timed_inner(
        lambda acc, p, x, dr, n, g: method._rgb_fn(
            p, x + acc, dr, n, g, iter_nr
        ),
        params, pos, samples.dirs(), sdf_grad, geom_feat,
    )
    print(f"rgb eval: {t*1e3:.1f} ms", flush=True)

    if method.bg_model is not None:
        from volsurfs_tpu.methods.surf import render_contracted_bg

        def stage_bg(acc, p, k):
            rc = dict(raycast)
            rc["t_far"] = rc["t_far"] + acc
            return render_contracted_bg(
                lambda x, dr, i: method.bg_model.apply(p["bg"], x, dr, i),
                rc, hp.nr_samples_bg, k, iter_nr,
            )

        t = timed_inner(stage_bg, params, key)
        print(f"bg render ({hp.nr_samples_bg} samples): {t*1e3:.1f} ms",
              flush=True)

    from volsurfs_tpu.models.field_utils import get_sdf_curvature

    t = timed_inner(
        lambda acc, p, x, g, k: get_sdf_curvature(
            lambda q: method._sdf_fn(p, q, iter_nr), x + acc, g, k,
            grad_fn=lambda q: method._sdf_grad_only(p, q, iter_nr),
        ),
        params, pos, sdf_grad, key,
    )
    print(f"curvature: {t*1e3:.1f} ms", flush=True)

    t = timed_inner(
        lambda acc, p, k: method._sdf_with_grad(
            p, bound.get_random_points_inside(k, 1024) + acc, iter_nr
        ),
        params, key,
    )
    print(f"random-points sdf+grad (1024): {t*1e3:.1f} ms", flush=True)

    # ---- full graph -------------------------------------------------------------
    def stage_fwd(acc, p, g, b, k):
        b = dict(b)
        b["rays_o"] = b["rays_o"] + acc
        return method._data_loss(p, g, b, iter_nr, k)[0]

    t = timed_inner(stage_fwd, params, grid, batch, key, iters=5)
    print(f"forward loss: {t*1e3:.1f} ms", flush=True)

    def stage_grad(acc, p, g, b, k):
        b = dict(b)
        b["rays_o"] = b["rays_o"] + acc
        return jax.grad(lambda q: method._data_loss(q, g, b, iter_nr, k)[0])(p)

    t = timed_inner(stage_grad, params, grid, batch, key, iters=5)
    print(f"grad(loss): {t*1e3:.1f} ms", flush=True)

    # ---- full step ----------------------------------------------------------------
    t0 = time.perf_counter()
    state2, losses = method.train_step(state, batch)
    print(f"train_step compile: {time.perf_counter()-t0:.0f} s", flush=True)
    G = 10
    ts = []
    st = state2
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(G):
            st, losses = method.train_step(st, batch)
        float(losses["loss"])
        ts.append((time.perf_counter() - t0) / G)
    print(f"train_step: {min(ts)*1e3:.0f} ms  ({1/min(ts):.2f} iters/s)")


if __name__ == "__main__":
    main()
