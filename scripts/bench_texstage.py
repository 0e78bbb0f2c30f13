"""Bisect the texture-filtering stage cost on the real chip (amortized
dispatch: G reps inside one jit with perturbed uvs).

All scene arrays are passed as jit ARGUMENTS (closures would embed them as
HLO constants and stall the remote compile)."""

import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

G = 4


def timed(fn, *args):
    jfn = jax.jit(fn)
    float(jfn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / G


def main():
    from bench import build_scene
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer

    scene_dir = os.path.join(tempfile.gettempdir(), "volsurfs_bench_scene")
    if not os.path.exists(os.path.join(scene_dir, "scene.json")):
        build_scene(scene_dir)
    r = BakedMeshRenderer(scene_dir, bg_color="white")
    band_tex = r._scene["band_tex"]  # [deg][mesh] tables

    N = 512 * 512
    key = jax.random.PRNGKey(0)
    uv_all = jax.random.uniform(key, (5, N, 2), jnp.float32)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    def full(bt, uv):
        acc = jnp.zeros((), jnp.float32)
        for i in range(G):
            acc += jnp.sum(
                r._sample_bands_fused({"band_tex": bt}, uv + i * 1e-6).astype(
                    jnp.float32
                )
            )
        return acc

    def gathers_only(bt, uv):
        acc = jnp.zeros((), jnp.float32)
        for i in range(G):
            for m in range(5):
                for deg in range(4):
                    table = bt[deg][m]
                    H = W = int(np.sqrt(table.shape[0]))
                    x = (uv[m, :, 0] + i * 1e-6) * W - 0.5
                    y = (1.0 - uv[m, :, 1]) * H - 0.5
                    xi = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
                    yi = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
                    acc += jnp.sum(table[yi * W + xi].astype(jnp.float32))
        return acc

    def index_only(bt, uv):
        acc = jnp.zeros((), jnp.float32)
        for i in range(G):
            for m in range(5):
                for deg in range(4):
                    table = bt[deg][m]
                    H = W = int(np.sqrt(table.shape[0]))
                    x = (uv[m, :, 0] + i * 1e-6) * W - 0.5
                    y = (1.0 - uv[m, :, 1]) * H - 0.5
                    xi = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
                    yi = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
                    acc += jnp.sum((yi * W + xi).astype(jnp.float32))
        return acc

    gs = [
        jax.random.normal(jax.random.PRNGKey(m * 4 + d),
                          (N, band_tex[d][m].shape[1]), jnp.float16)
        for m in range(5) for d in range(4)
    ]

    def epilogue_only(gs, uv):
        acc = jnp.zeros((), jnp.float32)
        for i in range(G):
            for m in range(5):
                for deg in range(4):
                    g = gs[m * 4 + deg] + jnp.float16(i)
                    C4 = g.shape[1] // 4
                    g = g.reshape(N, 4, C4)
                    fx = (uv[m, :, 0])[:, None].astype(jnp.float16)
                    fy = (uv[m, :, 1])[:, None].astype(jnp.float16)
                    sampled = (
                        g[:, 0] * (1 - fx) * (1 - fy)
                        + g[:, 1] * fx * (1 - fy)
                        + g[:, 2] * (1 - fx) * fy
                        + g[:, 3] * fx * fy
                    )
                    acc += jnp.sum(sampled.astype(jnp.float32))
        return acc

    if which in ("all", "full"):
        print(f"full _sample_bands_fused:  {timed(full, band_tex, uv_all)*1e3:7.2f} ms", flush=True)
    if which in ("all", "gathers"):
        print(f"index math + gathers only: {timed(gathers_only, band_tex, uv_all)*1e3:7.2f} ms", flush=True)
    if which in ("all", "index"):
        print(f"index math only:           {timed(index_only, band_tex, uv_all)*1e3:7.2f} ms", flush=True)
    if which in ("all", "epilogue"):
        print(f"epilogue only:             {timed(epilogue_only, gs, uv_all)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
