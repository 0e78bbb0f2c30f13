"""Stage-level timing of the baked 5-mesh frame render on the real chip.

Each stage is wrapped so its output collapses to a scalar ON DEVICE before
readback (jax.block_until_ready does not reliably block through the axon
tunnel, and full-tensor readbacks would dominate; see RESULTS.md).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_scalar(fn, *args, reps=3, **kwargs):
    """fn must return a pytree; we reduce every leaf to a scalar sum inside
    jit so timing measures compute, not transfer."""

    @jax.jit
    def red(*a, **k):
        out = fn(*a, **k)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    float(red(*args, **kwargs))  # compile + run
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(red(*args, **kwargs))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    sys.path.insert(0, "/root/repo")
    import os
    import tempfile

    from bench import build_scene
    from volsurfs_tpu.renderers import raster
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer
    from volsurfs_tpu.renderers.viewer import OrbitCamera

    W = H = 512
    scene_dir = os.path.join(tempfile.gettempdir(), "volsurfs_bench_scene")
    if not os.path.exists(os.path.join(scene_dir, "scene.json")):
        build_scene(scene_dir)
    r = BakedMeshRenderer(scene_dir, bg_color="white")

    oc = OrbitCamera(W, H, radius=2.0)
    oc.azimuth = 0.7
    oc.elevation = 0.3
    cam = oc.camera()

    c2w = jnp.asarray(cam.pose, jnp.float32)
    w2c = jnp.asarray(np.linalg.inv(cam.pose), jnp.float32)
    intrj = jnp.asarray(cam.intrinsics, jnp.float32)

    scene = r._scene
    nr_cand = 96

    def stage_bin(intrinsics, w2c):
        return [
            raster.bin_triangles(m.verts, m.faces, intrinsics, w2c, W, H, nr_cand)
            for m in scene["meshes"]
        ]

    def stage_bin2(intrinsics, w2c):
        return [
            raster.bin_triangles_2level(
                m.verts, m.faces, intrinsics, w2c, W, H, nr_cand
            )
            for m in scene["meshes"]
        ]

    t = timed_scalar(stage_bin, intrj, w2c)
    print(f"binning 1-level (5 meshes): {t*1e3:.1f} ms")
    t = timed_scalar(stage_bin2, intrj, w2c)
    print(f"binning 2-level (5 meshes): {t*1e3:.1f} ms")

    # correctness crosscheck of 2-level binning (sorted candidate sets match)
    cands = jax.jit(stage_bin)(intrj, w2c)
    cands2 = jax.jit(stage_bin2)(intrj, w2c)
    for (c1, o1), (c2, o2) in zip(cands, cands2):
        a1 = np.sort(np.asarray(c1), axis=-1)
        a2 = np.sort(np.asarray(c2), axis=-1)
        print(
            f"  mesh: ovf={int(np.asarray(o1).sum())}/{int(np.asarray(o2).sum())}"
            f" cand equal={bool((a1 == a2).all())}"
        )

    def stage_scan(intrinsics, c2w, cands):
        dirs, origin = raster.tile_rays(intrinsics, c2w, W, H)
        outs = []
        for i in range(len(scene["meshes"])):
            tables = scene["raster_tables"][i]
            is_hit, tt, u, v, f = raster.raster_mesh(tables, cands[i][0], dirs, origin)
            uv = raster.interp_uv(tables, f, u, v)
            outs.append((is_hit, uv))
        return outs

    t = timed_scalar(stage_scan, intrj, c2w, cands)
    print(f"raster scan + uv (5 meshes, K={nr_cand}): {t*1e3:.1f} ms")

    hits = jax.jit(stage_scan)(intrj, c2w, cands)
    print("  hit fractions:", [f"{float(np.asarray(h[0]).mean()):.2f}" for h in hits])

    uv_list = [h[1].reshape(-1, 2) for h in hits]
    hit_list = [h[0].reshape(-1) for h in hits]
    dirs, _ = raster.tile_rays(intrj, c2w, W, H)
    dirs_flat = jnp.stack([d.reshape(-1) for d in dirs], axis=-1)

    t = timed_scalar(lambda s, u, h, d: r._shade(s, u, h, d),
                     scene, uv_list, hit_list, dirs_flat)
    print(f"shade (texture+SH+composite): {t*1e3:.1f} ms")

    uv_all = jnp.stack(uv_list)
    t = timed_scalar(lambda s, u: r._sample_bands_fused(s, u), scene, uv_all)
    print(f"  texture filtering alone: {t*1e3:.1f} ms")

    t = timed_scalar(
        lambda s, i_, c_, w_: r._render_frame_tiles(
            s, i_, c_, w_, width=W, height=H, nr_cand=nr_cand
        ),
        scene, intrj, c2w, w2c,
    )
    mrays = W * H / t / 1e6
    print(f"full frame: {t*1e3:.1f} ms  ({mrays:.2f} Mrays/s)")


if __name__ == "__main__":
    main()
