"""Tile-binned rasterizer vs BVH tracer: identical hits, matching frames."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volsurfs_tpu.baking import baker, mesh_io
from volsurfs_tpu.baking.marching import extract_mesh_from_fn
from volsurfs_tpu.baking.simplify import simplify_mesh
from volsurfs_tpu.baking.uv_atlas import compute_atlas
from volsurfs_tpu.models.textures import DEG_NR_COEFFS
from volsurfs_tpu.renderers import raster
from volsurfs_tpu.renderers.viewer import OrbitCamera


@pytest.fixture(scope="module")
def baked_scene(tmp_path_factory):
    """Tiny 3-shell baked scene with random textures."""
    from PIL import Image

    scene_dir = str(tmp_path_factory.mktemp("baked"))
    os.makedirs(os.path.join(scene_dir, "meshes"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "textures"), exist_ok=True)
    rng = np.random.default_rng(0)
    sh_degree = 1
    meshes_info = []
    for mi, radius in enumerate([0.45, 0.5, 0.55]):
        def sdf(p, r=radius):
            return np.linalg.norm(p, axis=-1) - r

        v, f = extract_mesh_from_fn(sdf, resolution=20)
        v, f = simplify_mesh(v, f, 0.5)
        v, f, uv = compute_atlas(v, f)
        mesh_io.save_obj(os.path.join(scene_dir, "meshes", f"{mi}.obj"), v, f, uv)
        textures_info = []
        for deg in range(sh_degree + 1):
            for feat in range(DEG_NR_COEFFS[deg]):
                img = rng.integers(0, 256, (32, 32, 4), dtype=np.uint8)
                fname = f"mesh_{mi}_t{deg}_f{feat}.png"
                Image.fromarray(img, "RGBA").save(
                    os.path.join(scene_dir, "textures", fname)
                )
                textures_info.append({
                    "texture_path": os.path.join("textures", fname),
                    "texture_scale": (-4.0, 4.0),
                    "texture_resolution": (32, 32),
                })
        meshes_info.append({
            "mesh_path": os.path.join("meshes", f"{mi}.obj"),
            "textures": textures_info,
            "ignore_alpha": mi == 0,
        })
    baker.export_scene_json(scene_dir, meshes_info, None, "white", sh_degree)
    return scene_dir


def test_raster_hits_match_bvh(baked_scene):
    """Per-pixel closest hits from the rasterizer equal the BVH tracer."""
    from volsurfs_tpu.datasets.cameras import get_camera_rays
    from volsurfs_tpu.ops import bvh as B
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer

    r = BakedMeshRenderer(baked_scene, bg_color="white")
    cam = OrbitCamera(32, 32, radius=2.0).camera()
    intr = jnp.asarray(cam.intrinsics, jnp.float32)
    c2w = jnp.asarray(cam.pose, jnp.float32)
    w2c = jnp.asarray(np.linalg.inv(cam.pose), jnp.float32)

    rays_o, rays_d = get_camera_rays(cam)
    bvh_hits = B.trace_all(r.stacked_bvh, rays_o, rays_d)

    dirs, origin = raster.tile_rays(intr, c2w, cam.width, cam.height)
    for i, mesh in enumerate(r.meshes):
        budget = int(mesh.faces.shape[0])  # full budget: no overflow possible
        cand, ovf = raster.bin_triangles(
            mesh.verts, mesh.faces, intr, w2c, cam.width, cam.height, budget
        )
        assert not bool(np.asarray(ovf).any())
        is_hit, t, u, v, f = raster.raster_mesh(
            r._scene["raster_tables"][i], cand, dirs, origin
        )
        # tiles -> row-major pixel order
        def flat(x):
            return np.asarray(
                raster.tiles_to_image(
                    jnp.asarray(x)[..., None], cam.width, cam.height
                )
            ).reshape(-1)

        np.testing.assert_array_equal(
            flat(is_hit).astype(bool), np.asarray(bvh_hits["is_hit"][i])
        )
        hit_mask = np.asarray(bvh_hits["is_hit"][i])
        np.testing.assert_allclose(
            flat(t)[hit_mask],
            np.asarray(bvh_hits["depth"][i])[:, 0][hit_mask],
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_array_equal(
            flat(f)[hit_mask], np.asarray(bvh_hits["triangles_id"][i])[hit_mask]
        )


def test_raster_frame_matches_bvh_frame(baked_scene):
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer

    r = BakedMeshRenderer(baked_scene, bg_color="white")
    cam = OrbitCamera(48, 48, radius=2.0).camera()
    img_bvh = r.render(cam)
    img_ras = r.render_frame(cam)
    assert img_ras.shape == img_bvh.shape
    assert np.abs(img_ras - img_bvh).mean() < 0.02
    # background corners white in both
    assert np.allclose(img_ras[:3, :3], 1.0, atol=1e-3)


def test_bin_triangles_2level_matches_single(baked_scene):
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer

    r = BakedMeshRenderer(baked_scene, bg_color="white")
    cam = OrbitCamera(64, 64, radius=2.0).camera()
    intr = jnp.asarray(cam.intrinsics, jnp.float32)
    w2c = jnp.asarray(np.linalg.inv(cam.pose), jnp.float32)
    for mesh in r.meshes:
        budget = int(mesh.faces.shape[0])
        c1, o1 = raster.bin_triangles(
            mesh.verts, mesh.faces, intr, w2c, 64, 64, budget
        )
        c2, o2 = raster.bin_triangles_2level(
            mesh.verts, mesh.faces, intr, w2c, 64, 64, budget
        )
        c1, c2, o1, o2 = map(np.asarray, (c1, c2, o1, o2))
        assert not o1.any() and not o2.any()
        for tile in range(c1.shape[0]):
            assert set(c1[tile][c1[tile] >= 0]) == set(c2[tile][c2[tile] >= 0])


def test_footprint_sampling_matches_four_corner_reference(baked_scene):
    """One-row footprint filtering == independent per-corner clamped bilinear
    lookup, including UVs outside [0,1] and on texel edges."""
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer

    r = BakedMeshRenderer(baked_scene, bg_color="white")
    rng = np.random.default_rng(1)
    N = 512
    uv = rng.uniform(-0.05, 1.05, (len(r.meshes), N, 2)).astype(np.float32)
    # exact texel centers / edges to probe floor boundaries
    uv[:, :8, :] = np.array(
        [[0.0, 0.0], [1.0, 1.0], [0.5, 0.5], [1.0 / 64, 1.0 / 64],
         [0.0, 1.0], [1.0, 0.0], [0.25, 0.75], [0.999, 0.001]], np.float32
    )
    got = np.stack(
        [
            np.asarray(
                jax.jit(r._sample_bands_mesh, static_argnames="m")(
                    r._scene, m, jnp.asarray(uv[m, :, 0]), jnp.asarray(uv[m, :, 1])
                )
            )
            for m in range(len(r.meshes))
        ]
    )

    for m in range(len(r.meshes)):
        offs = 0
        for deg in range(r.sh_degree + 1):
            tex = np.asarray(r.textures[m][deg], np.float16)  # [H, W, 4, C]
            H, W, _, C = tex.shape
            x = uv[m, :, 0] * W - 0.5
            y = (1.0 - uv[m, :, 1]) * H - 0.5
            x0, y0 = np.floor(x), np.floor(y)
            fx = (x - x0).astype(np.float16)
            fy = (y - y0).astype(np.float16)

            def corner(dx, dy):
                xi = np.clip(x0 + dx, 0, W - 1).astype(np.int64)
                yi = np.clip(y0 + dy, 0, H - 1).astype(np.int64)
                return tex[yi, xi]  # [N, 4, C]

            w00 = ((1 - fx) * (1 - fy))[:, None, None]
            w10 = (fx * (1 - fy))[:, None, None]
            w01 = ((1 - fx) * fy)[:, None, None]
            w11 = (fx * fy)[:, None, None]
            ref = (
                corner(0, 0) * w00 + corner(1, 0) * w10
                + corner(0, 1) * w01 + corner(1, 1) * w11
            )
            lo, hi = r.tex_scales[m][deg]
            ref = np.float16(lo) + np.float16(hi - lo) * ref
            np.testing.assert_allclose(
                # fp16 accumulation-order differences only (one ulp at the
                # +-4 texture scale)
                got[m, :, :, offs : offs + C], ref, rtol=1e-2, atol=1e-2
            )
            offs += C


def test_backface_cull_preserves_hits_for_outside_camera(baked_scene):
    """Culling backfaces of a closed shell must not change any closest hit
    when the camera is outside the mesh."""
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer

    r = BakedMeshRenderer(baked_scene, bg_color="white")
    cam = OrbitCamera(32, 32, radius=2.0).camera()
    intr = jnp.asarray(cam.intrinsics, jnp.float32)
    c2w = jnp.asarray(cam.pose, jnp.float32)
    w2c = jnp.asarray(np.linalg.inv(cam.pose), jnp.float32)
    assert r._cameras_outside(cam.pose)
    dirs, origin = raster.tile_rays(intr, c2w, cam.width, cam.height)
    for i, mesh in enumerate(r.meshes):
        sign = r._cull_signs[i]
        assert sign != 0  # closed marching-cubes shells are oriented
        budget = int(mesh.faces.shape[0])
        outs = []
        for cs in (0, sign):
            cand, ovf = raster.bin_triangles(
                mesh.verts, mesh.faces, intr, w2c, cam.width, cam.height,
                budget, cull_sign=cs,
            )
            assert not bool(np.asarray(ovf).any())
            outs.append(raster.raster_mesh(
                r._scene["raster_tables"][i], cand, dirs, origin
            ))
        (h0, t0, u0, v0, f0), (h1, t1, u1, v1, f1) = outs
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
        np.testing.assert_allclose(
            np.asarray(t0)[np.asarray(h0)], np.asarray(t1)[np.asarray(h1)]
        )
        # culling actually removes candidates (about half the faces)
        n_cull = int((np.asarray(cand) >= 0).sum())
        cand_all, _ = raster.bin_triangles(
            mesh.verts, mesh.faces, intr, w2c, cam.width, cam.height, budget
        )
        assert n_cull < int((np.asarray(cand_all) >= 0).sum())


def test_overflow_flag_fires_when_budget_too_small(baked_scene):
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer

    r = BakedMeshRenderer(baked_scene, bg_color="white")
    cam = OrbitCamera(16, 16, radius=2.0).camera()  # few tiles, many tris each
    intr = jnp.asarray(cam.intrinsics, jnp.float32)
    w2c = jnp.asarray(np.linalg.inv(cam.pose), jnp.float32)
    mesh = r.meshes[-1]
    _, ovf = raster.bin_triangles(
        mesh.verts, mesh.faces, intr, w2c, 16, 16, 4
    )
    assert bool(np.asarray(ovf).any())


def test_block_compaction_matches_full_frame(baked_scene):
    """nr_blocks compaction: identical image when the budget covers every
    candidate block, overflow flag when it does not."""
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer

    r = BakedMeshRenderer(baked_scene, bg_color="white")
    cam = OrbitCamera(384, 384, radius=2.0).camera()  # 12x6 = 72 blocks
    img_full, ovf_full = r.render_frame_device(cam)
    _, nr_blocks, nr_shade = r.suggest_budgets([cam])
    assert isinstance(nr_blocks, tuple) and len(nr_blocks) == len(r.meshes)
    assert any(nb > 0 for nb in nr_blocks)
    img_cmp, ovf_cmp = r.render_frame_device(cam, nr_blocks=nr_blocks)
    assert int(np.sum(np.asarray(ovf_full))) == 0
    assert int(np.sum(np.asarray(ovf_cmp))) == 0
    np.testing.assert_array_equal(np.asarray(img_full), np.asarray(img_cmp))

    # shade-tile compaction (fine 8x16 hit tiles only) is also lossless:
    # off-hit pixels shade to exact zero
    assert isinstance(nr_shade, tuple) and any(ns > 0 for ns in nr_shade)
    img_st, ovf_st = r.render_frame_device(
        cam, nr_blocks=nr_blocks, nr_shade_tiles=nr_shade
    )
    assert int(np.sum(np.asarray(ovf_st))) == 0
    np.testing.assert_array_equal(np.asarray(img_full), np.asarray(img_st))

    # starve the block budget: the BLOCK component of overflow must fire,
    # and render_frame must still return the exact frame via its retry
    _, ovf_small = r.render_frame_device(cam, nr_blocks=1)
    assert int(np.asarray(ovf_small)[1]) > 0
    assert int(np.asarray(ovf_small)[0]) == 0
    img_retry = r.render_frame(cam, nr_blocks=1)
    np.testing.assert_array_equal(np.asarray(img_full), img_retry)

    # starve the shade-tile budget: the SHADE component fires, the retry
    # still returns the exact frame
    _, ovf_shade = r.render_frame_device(
        cam, nr_blocks=nr_blocks, nr_shade_tiles=1
    )
    assert int(np.asarray(ovf_shade)[2]) > 0
    img_retry2 = r.render_frame(cam, nr_blocks=nr_blocks, nr_shade_tiles=1)
    np.testing.assert_array_equal(np.asarray(img_full), img_retry2)


def test_render_turntable_uses_budgeted_raster_path(baked_scene, tmp_path):
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer
    from volsurfs_tpu.renderers.viewer import render_turntable

    r = BakedMeshRenderer(baked_scene, bg_color="white")
    times = render_turntable(r, str(tmp_path), nr_frames=2, resolution=96)
    assert len(times) == 2
    import os
    assert os.path.exists(os.path.join(str(tmp_path), "frame_001.png"))
