"""Stage-level timing of the baked 5-mesh frame render on the real chip.

Per-dispatch tunnel overhead through axon is ~25 ms — larger than most
stages — so each stage is timed INSIDE one executable: a fori_loop chains
`iters` dependent evaluations (the loop carry perturbs a float input by
~1e-38 so XLA cannot CSE the iterations), and the per-iteration time is
(t(iters) - t(1)) / (iters - 1). Scene arrays are passed as ARGUMENTS (a
closure would embed them as HLO constants and overflow the remote-compile
transport; see mesh_renderer.py).

Profiles the CURRENT render path (renderers/mesh_renderer.py
_render_frame_tiles): 32x64-px block binning, PER-MESH block compaction,
one batched candidate scan, per-mesh footprint-table texture filtering +
SH shade, composite.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_inner(fn, *args, iters=20, reps=3):
    """fn(acc_scalar, *args) -> pytree. Returns seconds per evaluation net
    of dispatch overhead: fori_loop chains `iters` dependent evals inside
    ONE executable; subtract a 1-iteration executable's wall time."""

    def reduce_out(out):
        # mask non-finite leaves (e.g. t_best = inf on miss pixels) so the
        # chained carry stays finite — an inf/NaN carry perturbs the next
        # iteration's inputs into an all-miss workload and the timed
        # iterations no longer measure the real hit workload
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

    run_n = make(iters)
    run_1 = make(1)
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

    def mk_cam(i, n=16):
        oc = OrbitCamera(W, H, radius=2.0)
        oc.azimuth = 2.0 * np.pi * i / n
        oc.elevation = 0.3
        return oc.camera()

    cams = [mk_cam(i) for i in range(16)]
    nr_cand, nr_blocks, nr_shade = r.suggest_budgets(cams)
    print(f"budgets: nr_cand={nr_cand} nr_blocks={nr_blocks} "
          f"nr_shade_tiles={nr_shade}", flush=True)
    cam = cams[3]

    c2w = jnp.asarray(cam.pose, jnp.float32)
    w2c = jnp.asarray(np.linalg.inv(cam.pose), jnp.float32)
    intrj = jnp.asarray(cam.intrinsics, jnp.float32)

    scene = r._scene_fast
    bh, bw = r._BLOCK_H, r._BLOCK_W
    M = len(r.meshes)
    nb_list = [nr_blocks] * M if isinstance(nr_blocks, int) else list(nr_blocks)

    # ---- stage 1: binning ---------------------------------------------------
    def stage_bin(acc, intrinsics, w2c):
        w2c = w2c + acc
        return [
            raster.bin_triangles(
                m.verts, m.faces, intrinsics, w2c, W, H, nr_cand,
                tile_h=bh, tile_w=bw, cull_sign=r._cull_signs[i],
            )[0]
            for i, m in enumerate(r.meshes)
        ]

    t = timed_inner(stage_bin, intrj, w2c)
    print(f"binning {bh}x{bw} blocks ({M} meshes, K={nr_cand}): {t*1e3:.2f} ms",
          flush=True)
    cand_list0 = jax.jit(lambda a, i_, w_: stage_bin(a, i_, w_))(0.0, intrj, w2c)

    # ---- stage 2: per-mesh block select ---------------------------------------
    dirs, origin = raster.tile_rays(intrj, c2w, W, H, tile_h=bh, tile_w=bw)
    T = cand_list0[0].shape[0]
    P = bh * bw

    def stage_select(acc, cand_list, dirs):
        dirs = tuple(d + acc for d in dirs)
        iota = jnp.arange(T, dtype=jnp.int32)
        blk_list, dirs_list, cand_out = [], [], []
        for i in range(M):
            nb = nb_list[i]
            if 0 < nb < T:
                has = cand_list[i][:, 0] >= 0
                topv, _ = jax.lax.top_k(jnp.where(has, T - iota, 0), nb)
                blk_valid = topv > 0
                blk = jnp.where(blk_valid, T - topv, T)
                safe = jnp.minimum(blk, T - 1)
                dirs_list.append(tuple(d[safe] for d in dirs))
                cand_out.append(
                    jnp.where(blk_valid[:, None], cand_list[i][safe], -1)
                )
                blk_list.append(blk)
            else:
                dirs_list.append(dirs)
                cand_out.append(cand_list[i])
                blk_list.append(iota)
        return blk_list, cand_out, dirs_list

    t = timed_inner(stage_select, cand_list0, dirs)
    print(f"per-mesh block select (budgets {nb_list}): {t*1e3:.2f} ms",
          flush=True)
    blk_list, cand_c, dirs_list = jax.jit(
        lambda a, c, d: stage_select(a, c, d)
    )(0.0, cand_list0, dirs)

    # ---- stage 3: batched candidate scan ---------------------------------------
    tables_arg = [scene["raster_tables"][i] for i in range(M)]

    def stage_scan(acc, cand_c, dirs_list, tables):
        tri_parts, cand_parts = [], []
        for i in range(M):
            tri_i, cand_i = raster.gather_tri_data(tables[i], cand_c[i])
            tri_parts.append(tri_i)
            cand_parts.append(cand_i)
        dirs_all = tuple(
            jnp.concatenate([dl[c] for dl in dirs_list], 0) + acc
            for c in range(3)
        )
        return raster.raster_meshes_batched(
            jnp.concatenate(tri_parts, 0),
            jnp.concatenate(cand_parts, 0),
            dirs_all,
            origin,
        )

    t = timed_inner(stage_scan, cand_c, dirs_list, tables_arg)
    rows = sum(c.shape[0] for c in cand_c)
    print(f"batched raster scan ({rows} rows x K={nr_cand}): {t*1e3:.2f} ms",
          flush=True)
    is_hit, tt, u, v, f = jax.jit(
        lambda a, c, d, tb: stage_scan(a, c, d, tb)
    )(0.0, cand_c, dirs_list, tables_arg)

    off = 0
    for i in range(M):
        Ti = cand_c[i].shape[0]
        h = np.asarray(is_hit[off : off + Ti])
        print(f"  mesh {i}: blocks={Ti} hit_px={h.sum()} ({h.mean():.2f})",
              flush=True)
        off += Ti

    # ---- stage 4: shading -------------------------------------------------------
    def stage_shade(acc, u, v, f, is_hit, dirs_list, tables, pack_tex):
        scn = {"pack_tex": pack_tex}
        off = 0
        outs = []
        for i in range(M):
            Ti = cand_c[i].shape[0]
            sl = slice(off, off + Ti)
            off += Ti
            uv = raster.interp_uv(
                tables[i], f[sl], u[sl] + acc, v[sl]
            ).reshape(-1, 2)
            dirs_i = jnp.stack([d.reshape(-1) for d in dirs_list[i]], axis=-1)
            outs.append(
                r._shade_mesh(scn, i, uv, is_hit[sl].reshape(-1), dirs_i)
            )
        return outs

    t = timed_inner(
        stage_shade, u, v, f, is_hit, dirs_list, tables_arg,
        scene["pack_tex"], iters=10,
    )
    print(f"shade (uv + texture + SH, {M} meshes): {t*1e3:.2f} ms", flush=True)

    def stage_tex(acc, u, v, f, tables, pack_tex):
        scn = {"pack_tex": pack_tex}
        outs = []
        off = 0
        for i in range(M):
            Ti = cand_c[i].shape[0]
            sl = slice(off, off + Ti)
            off += Ti
            uv = raster.interp_uv(
                tables[i], f[sl], u[sl] + acc, v[sl]
            ).reshape(-1, 2)
            outs.append(r._sample_bands_mesh(scn, i, uv[:, 0], uv[:, 1]))
        return outs

    t = timed_inner(stage_tex, u, v, f, tables_arg, scene["pack_tex"], iters=10)
    print(f"  texture filtering alone: {t*1e3:.2f} ms", flush=True)

    # ---- full frame ---------------------------------------------------------
    def full_frame(acc, scn, intr, c2w, w2c, nb, ns):
        return r._render_frame_tiles(
            scn, intr, c2w + acc, w2c, width=W, height=H, nr_cand=nr_cand,
            use_cull=True, nr_blocks=nb, nr_shade_tiles=ns,
        )[0]

    for nb, ns in ((0, 0), (nr_blocks, 0), (nr_blocks, nr_shade)):
        t = timed_inner(
            lambda acc, scn, i_, c_, w_: full_frame(
                acc, scn, i_, c_, w_, nb, ns
            ),
            scene, intrj, c2w, w2c, iters=10,
        )
        mrays = W * H / t / 1e6
        print(f"full frame nb={nb} ns={ns}: {t*1e3:.2f} ms  "
              f"({mrays:.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
