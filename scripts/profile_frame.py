"""Stage-level timing of the baked 5-mesh frame render on the real chip.

Each stage is wrapped so its output collapses to a scalar ON DEVICE before
readback (jax.block_until_ready does not reliably block through the axon
tunnel, and full-tensor readbacks would dominate; see RESULTS.md).

Profiles the CURRENT render path: 32x64-px block binning, block
compaction (renderers/mesh_renderer.py), candidate scan, footprint-table
texture filtering, SH shade + composite.
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

    scene = r._scene_fast
    nr_cand = 256
    nr_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    bh, bw = r._BLOCK_H, r._BLOCK_W

    def stage_bin(intrinsics, w2c):
        return [
            raster.bin_triangles(
                m.verts, m.faces, intrinsics, w2c, W, H, nr_cand,
                tile_h=bh, tile_w=bw, cull_sign=r._cull_signs[i],
            )
            for i, m in enumerate(r.meshes)
        ]

    t = timed_scalar(stage_bin, intrj, w2c)
    print(f"binning 32x64 blocks (5 meshes, K={nr_cand}): {t*1e3:.1f} ms")

    cands = jax.jit(stage_bin)(intrj, w2c)
    cand_list = [c for c, _ in cands]

    def stage_select(cand_list):
        T = cand_list[0].shape[0]
        has = cand_list[0][:, 0] >= 0
        for cand in cand_list[1:]:
            has = has | (cand[:, 0] >= 0)
        iota = jnp.arange(T, dtype=jnp.int32)
        topv, _ = jax.lax.top_k(jnp.where(has, T - iota, 0), nr_blocks)
        blk = jnp.where(topv > 0, T - topv, T)
        safe = jnp.minimum(blk, T - 1)
        return blk, [
            jnp.where((topv > 0)[:, None], c[safe], -1) for c in cand_list
        ]

    t = timed_scalar(stage_select, cand_list)
    print(f"block select + gather (B={nr_blocks}): {t*1e3:.1f} ms")

    blk, cand_c = jax.jit(stage_select)(cand_list)
    n_used = int((np.asarray(blk) < cand_list[0].shape[0]).sum())
    print(f"  blocks with candidates: {n_used}/{cand_list[0].shape[0]}")

    dirs_full, origin = raster.tile_rays(intrj, c2w, W, H, tile_h=bh, tile_w=bw)
    safe_blk = jnp.minimum(blk, cand_list[0].shape[0] - 1)
    dirs_c = tuple(d[safe_blk] for d in dirs_full)

    def stage_scan(cand_c, dirs_c):
        outs = []
        for i in range(len(r.meshes)):
            tables = scene["raster_tables"][i]
            is_hit, tt, u, v, f = raster.raster_mesh(
                tables, cand_c[i], dirs_c, origin
            )
            uv = raster.interp_uv(tables, f, u, v)
            outs.append((is_hit, uv))
        return outs

    t = timed_scalar(stage_scan, cand_c, dirs_c)
    print(f"raster scan + uv (5 meshes, compacted): {t*1e3:.1f} ms")

    hits = jax.jit(stage_scan)(cand_c, dirs_c)
    print("  hit fractions:",
          [f"{float(np.asarray(h[0]).mean()):.2f}" for h in hits])

    uv_list = [h[1].reshape(-1, 2) for h in hits]
    hit_list = [h[0].reshape(-1) for h in hits]
    dirs_flat = jnp.stack([d.reshape(-1) for d in dirs_c], axis=-1)

    t = timed_scalar(lambda s, u, h, d: r._shade(s, u, h, d),
                     scene, uv_list, hit_list, dirs_flat)
    print(f"shade (texture+SH+composite, compacted): {t*1e3:.1f} ms")

    uv_all = jnp.stack(uv_list)
    t = timed_scalar(lambda s, u: r._sample_bands_fused(s, u), scene, uv_all)
    print(f"  texture filtering alone: {t*1e3:.1f} ms")

    for nb in (0, nr_blocks):
        t = timed_scalar(
            lambda s, i_, c_, w_: r._render_frame_tiles(
                s, i_, c_, w_, width=W, height=H, nr_cand=nr_cand,
                use_cull=True, nr_blocks=nb,
            ),
            scene, intrj, c2w, w2c,
        )
        mrays = W * H / t / 1e6
        print(f"full frame nb={nb}: {t*1e3:.1f} ms  ({mrays:.2f} Mrays/s)")


if __name__ == "__main__":
    main()
