"""Benchmark: rendering throughput on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.json): Mrays/sec/chip on the 5-mesh Shelly baked
render. Until the volsurfs baked path lands, this measures the surf
volumetric render path (occupancy-pruned sampling + SDF/RGB fields + NeuS
compositing) in Mrays/sec on one chip. The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against a fixed internal target of
1.0 Mrays/s until a measured reference baseline exists.
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_surf

    n_rays = 65536
    method, state = _tiny_surf(jax.random.PRNGKey(0), occupancy_res=64, rays=256)

    render = jax.jit(
        lambda params, grid, rays_o, rays_d: method.render_rays(
            params, grid, rays_o, rays_d, 100, None, False
        )["rgb"]
    )

    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (n_rays, 3)) * 0.15 + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]], jnp.float32), (n_rays, 1))

    # warmup / compile
    render(state.params, state.grid, rays_o, rays_d).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = render(state.params, state.grid, rays_o, rays_d)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    mrays_per_sec = (n_rays * iters) / dt / 1e6
    baseline_target = 1.0
    print(
        json.dumps(
            {
                "metric": "surf_volumetric_render_Mrays_per_sec_per_chip",
                "value": round(mrays_per_sec, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays_per_sec / baseline_target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
