"""Candidate-scan variants on the real bench workload.

The batched raster scan is the largest frame stage and is suspected
scan-step-overhead bound (per-step fixed cost >> per-step flops at
[rows, 2048] shapes). Compares, at the bench scene's real budgets:

  a) current: lax.scan over Kp/chunk steps, chunk=8 unrolled
  b) bigger unroll chunks (16, 32, 48)
  c) row-fold: move g candidate chunks into the row axis (rows*g x Kp/g
     workload, g-times fewer scan steps) + final min-t combine over g

Run: python scripts/bench_scan_variants.py  (on the TPU host)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_frame import timed_inner  # noqa: E402


def fold_scan(tri_data, cand, dirs, origin, g, chunk=8):
    """Row-fold variant: [T, Kp] -> [T*g, Kp/g]; each fold runs the plain
    batched scan with its own best-hit carry, then the g partial results
    combine by min-t. Same math, g-times fewer scan steps."""
    from volsurfs_tpu.renderers import raster

    T, Kp = cand.shape
    P = dirs[0].shape[1]
    assert Kp % (g * chunk) == 0
    Kg = Kp // g
    # [T, g, Kg] -> [g*T, Kg]: fold f of tile t lands at row f*T + t, so
    # unfolding is a reshape to [g, T, ...]
    tri_f = jnp.swapaxes(tri_data.reshape(T, g, Kg, 9), 0, 1).reshape(
        g * T, Kg, 9
    )
    cand_f = jnp.swapaxes(cand.reshape(T, g, Kg), 0, 1).reshape(g * T, Kg)
    dirs_f = tuple(jnp.tile(d, (g, 1)) for d in dirs)
    is_hit, t, u, v, f = raster.raster_meshes_batched(
        tri_f, cand_f, dirs_f, origin, chunk=chunk
    )

    def part(x):
        return x.reshape(g, T, P)

    t_g, u_g, v_g, f_g = part(t), part(u), part(v), part(f)
    best = jnp.argmin(t_g, axis=0)  # [T, P]
    take = lambda x: jnp.take_along_axis(x, best[None], axis=0)[0]
    return take(f_g) >= 0, take(t_g), take(u_g), take(v_g), take(f_g)


def main():
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

    def mk_cam(i, n=16):
        oc = OrbitCamera(W, H, radius=2.0)
        oc.azimuth = 2.0 * np.pi * i / n
        oc.elevation = 0.3
        return oc.camera()

    cams = [mk_cam(i) for i in range(16)]
    nr_cand, nr_blocks, nr_shade = r.suggest_budgets(cams)
    print(f"budgets: nr_cand={nr_cand} nr_blocks={nr_blocks}", flush=True)
    cam = cams[3]
    c2w = jnp.asarray(cam.pose, jnp.float32)
    w2c = jnp.asarray(np.linalg.inv(cam.pose), jnp.float32)
    intrj = jnp.asarray(cam.intrinsics, jnp.float32)
    scene = r._scene_fast
    bh, bw = r._BLOCK_H, r._BLOCK_W
    M = len(r.meshes)
    nb_list = [nr_blocks] * M if isinstance(nr_blocks, int) else list(nr_blocks)

    # reproduce the real stacked workload (bin + per-mesh block compaction)
    dirs, origin = raster.tile_rays(intrj, c2w, W, H, tile_h=bh, tile_w=bw)

    @jax.jit
    def build_workload(intr, w2c, dirs):
        T = dirs[0].shape[0]
        iota = jnp.arange(T, dtype=jnp.int32)
        tri_parts, cand_parts, dirs_parts = [], [], [[], [], []]
        for i, m in enumerate(r.meshes):
            cand, _ = raster.bin_triangles(
                m.verts, m.faces, intr, w2c, W, H, nr_cand,
                tile_h=bh, tile_w=bw, cull_sign=r._cull_signs[i],
            )
            nb = nb_list[i]
            if 0 < nb < T:
                has = cand[:, 0] >= 0
                topv, _ = jax.lax.top_k(jnp.where(has, T - iota, 0), nb)
                safe = jnp.minimum(jnp.where(topv > 0, T - topv, T), T - 1)
                cand = jnp.where((topv > 0)[:, None], cand[safe], -1)
                for c in range(3):
                    dirs_parts[c].append(dirs[c][safe])
            else:
                for c in range(3):
                    dirs_parts[c].append(dirs[c])
            tri_i, cand_i = raster.gather_tri_data(
                scene["raster_tables"][i], cand
            )
            tri_parts.append(tri_i)
            cand_parts.append(cand_i)
        return (
            jnp.concatenate(tri_parts, 0),
            jnp.concatenate(cand_parts, 0),
            tuple(jnp.concatenate(dp, 0) for dp in dirs_parts),
        )

    tri_data, cand, dirs_all = jax.block_until_ready(
        build_workload(intrj, w2c, dirs)
    )
    T, Kp = cand.shape
    print(f"workload: rows={T} Kp={Kp}", flush=True)

    ref = None
    variants = []
    for chunk in (8, 32):
        if Kp % chunk == 0:
            variants.append((
                f"scan chunk={chunk} ({Kp // chunk} steps)",
                lambda acc, td, cd, da, ck=chunk: raster.raster_meshes_batched(
                    td, cd, tuple(d + acc for d in da), origin, chunk=ck
                ),
            ))
    for g, chunk in ((4, 8), (8, 8)):
        if Kp % (g * chunk) == 0:
            variants.append((
                f"row-fold g={g} chunk={chunk} ({Kp // (g * chunk)} steps,"
                f" {T * g} rows)",
                lambda acc, td, cd, da, gg=g, ck=chunk: fold_scan(
                    td, cd, tuple(d + acc for d in da), origin, gg, ck
                ),
            ))

    for name, fn in variants:
        out = jax.block_until_ready(
            jax.jit(fn)(0.0, tri_data, cand, dirs_all)
        )
        f_np = np.asarray(out[4])
        if ref is None:
            ref = f_np
            agree = "ref"
        else:
            agree = f"hits match={np.array_equal(f_np, ref)}"
        t = timed_inner(fn, tri_data, cand, dirs_all, iters=20)
        print(f"{name}: {t * 1e3:.2f} ms  [{agree}]", flush=True)


if __name__ == "__main__":
    main()
