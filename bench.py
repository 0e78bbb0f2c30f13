"""Benchmark: 5-mesh baked VolSurfs frame-render throughput on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.json): Mrays/sec/chip on the 5-mesh baked
render — the reference paper's real-time path (k alpha-blended SH-textured
meshes drawn by the WebGL viewer; reference
volsurfs_py/renderers/mesh_renderer.py + viewer FPS HUD viewer.py:185-214).
Workload: 800x800 orbit-camera frames (the reference's eval resolution,
reference README.md:70-92) through the tile-binned rasterizer
(volsurfs_tpu/renderers/raster.py) with bilinear fp16 texture filtering and
SH degree 3, texture pyramid [2048,1024,512,256]. Frames are enqueued
back-to-back and synced once (frames stay on device like any real-time
swapchain; one frame is read back and checked finite). The reference
publishes no numbers (BASELINE.md), so vs_baseline is reported against a
fixed internal target of 10 Mrays/s until a measured reference baseline
exists.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def build_scene(scene_dir: str, nr_meshes: int = 5, mesh_res: int = 96,
                textures_res=(2048, 1024, 512, 256), sh_degree: int = 3):
    """Procedural 5-shell baked scene with random textures (throughput is
    texture-content independent)."""
    from PIL import Image

    from volsurfs_tpu.baking import baker, mesh_io
    from volsurfs_tpu.baking.marching import extract_mesh_from_fn
    from volsurfs_tpu.baking.simplify import simplify_mesh
    from volsurfs_tpu.baking.uv_atlas import compute_atlas
    from volsurfs_tpu.models.textures import DEG_NR_COEFFS

    os.makedirs(os.path.join(scene_dir, "meshes"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "textures"), exist_ok=True)
    rng = np.random.default_rng(0)

    meshes_info = []
    radii = np.linspace(0.42, 0.58, nr_meshes)
    for mesh_idx, radius in enumerate(radii):
        def sdf(p, r=radius):
            # bumpy sphere so the mesh is non-trivial
            bump = 0.03 * np.sin(8 * p[:, 0]) * np.sin(8 * p[:, 1]) * np.sin(8 * p[:, 2])
            return np.linalg.norm(p, axis=-1) - r + bump

        v, f = extract_mesh_from_fn(sdf, resolution=mesh_res)
        v, f = simplify_mesh(v, f, 0.1)
        v, f, uv = compute_atlas(v, f)
        mesh_io.save_obj(os.path.join(scene_dir, "meshes", f"{mesh_idx}.obj"), v, f, uv)

        textures_info = []
        for deg in range(sh_degree + 1):
            res = int(textures_res[deg])
            for feat in range(DEG_NR_COEFFS[deg]):
                img = rng.integers(0, 256, (res, res, 4), dtype=np.uint8)
                fname = f"mesh_{mesh_idx}_texture_{deg}_feature_{feat}.png"
                Image.fromarray(img, "RGBA").save(
                    os.path.join(scene_dir, "textures", fname)
                )
                textures_info.append(
                    {
                        "texture_path": os.path.join("textures", fname),
                        "texture_scale": (-15.0, 15.0),
                        "texture_resolution": (res, res),
                    }
                )
        meshes_info.append(
            {
                "mesh_path": os.path.join("meshes", f"{mesh_idx}.obj"),
                "textures": textures_info,
                "ignore_alpha": mesh_idx == 0,
            }
        )
    baker.export_scene_json(scene_dir, meshes_info, None, "white", sh_degree)


def main():
    import jax
    import jax.numpy as jnp

    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer
    from volsurfs_tpu.renderers.viewer import OrbitCamera

    scene_dir = os.path.join(tempfile.gettempdir(), "volsurfs_bench_scene")
    if not os.path.exists(os.path.join(scene_dir, "scene.json")):
        build_scene(scene_dir)

    renderer = BakedMeshRenderer(scene_dir, bg_color="white")

    # default 800 — the reference's eval resolution (README.md:70-92); the
    # earlier rounds' 512 headline shape stays reachable via
    # VOLSURFS_BENCH_RES=512 (512: 10.38 Mrays/s, 800: 13.09 — per-ray
    # throughput improves with resolution as the binning/select pre-passes
    # amortize over 2.4x more rays, RESULTS.md round 5)
    res = int(os.environ.get("VOLSURFS_BENCH_RES", "800"))
    # 64 frames per executable: the fixed dispatch + sync cost through the
    # remote tunnel (~30-50 ms) is pure host overhead for a swapchain
    # workload; amortizing it over a full 64-frame orbit instead of 16
    # measures 10.1 vs 9.4 Mrays/s at identical per-frame device work
    # (in-executable frame time 22.6-25.9 ms either way)
    nr_frames = 64

    def cam(i):
        oc = OrbitCamera(res, res, radius=2.0)
        oc.azimuth = 2.0 * 3.14159265 * i / nr_frames
        oc.elevation = 0.3
        return oc.camera()

    # warmup + correctness: compile, check overflow-free and finite
    img = renderer.render_frame(cam(0))
    assert img.shape == (res, res, 3)
    assert float(np.isfinite(img).mean()) == 1.0
    assert sum(renderer.fallback_counts.values()) == 0, renderer.fallback_counts

    cams = [cam(i) for i in range(nr_frames)]
    # candidate + block + shade-tile budgets for this orbit (binning-counts
    # + raster-hit pre-passes: the scan is linear in nr_cand, shading in
    # nr_shade_tiles)
    nr_cand, nr_blocks, nr_shade = renderer.suggest_budgets(cams)
    # compile the batched executable, verify no overflow anywhere
    imgs, ovf = renderer.render_frames_device(
        cams, nr_cand=nr_cand, nr_blocks=nr_blocks, nr_shade_tiles=nr_shade
    )
    if int(np.sum(ovf)) != 0:  # margin too tight — fall back to safe defaults
        nr_cand, nr_blocks, nr_shade = 256, 0, 0
        imgs, ovf = renderer.render_frames_device(cams, nr_cand=nr_cand)
    assert int(np.sum(ovf)) == 0
    assert np.isfinite(np.asarray(imgs[-1])).all()

    # throughput: all frames render inside ONE device executable (the
    # swapchain analogue — per-frame host dispatch through the tunnel is
    # pure overhead, not device work); sync once via an on-device scalar.
    # Best of 3 timed runs: single-run walltime through the remote tunnel
    # carries ~0.5-1 ms/frame of host-side jitter unrelated to device
    # throughput.
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        imgs, _ = renderer.render_frames_device(
            cams, nr_cand=nr_cand, nr_blocks=nr_blocks, nr_shade_tiles=nr_shade
        )
        acc = float(imgs.mean())  # forces completion of every frame
        dt = min(dt, time.perf_counter() - t0)
        assert np.isfinite(acc)

    mrays_per_sec = (res * res * nr_frames) / dt / 1e6
    baseline_target = 10.0
    print(
        json.dumps(
            {
                "metric": "volsurfs_5mesh_baked_render_Mrays_per_sec_per_chip",
                "value": round(mrays_per_sec, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays_per_sec / baseline_target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
