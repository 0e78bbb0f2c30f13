"""Baked-scene renderer: k textured meshes, intersected and alpha-blended.

Re-implements the reference MeshRenderer (volsurfs_py/renderers/
mesh_renderer.py:16-201 + base_renderer.py:11-101): loads a baked
``scene.json`` (meshes + SH texture PNG pyramids), finds per-mesh closest
hits, samples the textures bilinearly, evaluates the spherical harmonics at
the view direction, applies sigmoid, and composites outer -> inner in
float16 — the exact math the WebGL viewer runs.

Two intersection paths share the shading code: arbitrary ray batches go
through the stackless BVH (`render_rays`), camera frames through the
tile-binned rasterizer (`render_frame`, renderers/raster.py — the fast path
the Mrays/sec benchmark measures; hits agree exactly between the two).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from volsurfs_tpu.baking import mesh_io
from volsurfs_tpu.models.textures import DEG_NR_COEFFS
from volsurfs_tpu.ops import bvh as B
from volsurfs_tpu.ops.sh import sh_eval
from volsurfs_tpu.utils.math import small_cumprod, take_rev
from volsurfs_tpu.renderers import raster


def choose_block_edge(h: int, w: int, max_rows: int = 2**18) -> int:
    """Smallest power-of-two texel block whose table has <= max_rows rows
    (and that divides the texture)."""
    b = 1
    while (h // b) * (w // b) > max_rows and h % (2 * b) == 0 and w % (2 * b) == 0:
        b *= 2
    return b


def make_band_table(tex_u8, block: int):
    """[H, W, 4, Cc] uint8 band -> block-packed gather table.

    Row B = (By, Bx) covers band texels [block*By, block*By+block) x
    [block*Bx, ...) and stores the (block+1)^2 texel region that bilinear
    filtering at any sample point landing in the block can touch (edge
    texels clamp-duplicate).  Layout is CHANNEL-PLANAR — row column
    c*(block+1)^2 + ry*(block+1) + rx — so the sampler's per-pixel
    footprint reduction runs on [N, C*(b+1)^2] 2-D shapes and one small
    matmul, never on tiny-trailing-dim tensors (those waste ~97% of VPU
    lanes; measured 4.5 vs 6.1 Mrays/s end to end).

    Why blocks at all: TPU random-row gather throughput peaks near
    ~128-byte rows on <= 2^18-row tables (~550M rows/s) and collapses both
    for multi-M-row tables (~67M) and for wide rows (~50M at 724B) —
    scripts/bench_gather.py + the width/locality probes in RESULTS.md. The
    block edge per band is chosen to land in that regime: 2048^2 RGBA ->
    block 4 (262k rows, 100B), 1024^2 -> 2 (262k, 108B), smaller bands ->
    1 (plain 2x2 footprint rows).

    Returns (table [(H/b)*(W/b), C*(b+1)^2] uint8).
    """
    H, W = tex_u8.shape[:2]
    assert H % block == 0 and W % block == 0
    C = tex_u8.shape[2] * tex_u8.shape[3]
    flat = np.ascontiguousarray(tex_u8, np.uint8).reshape(H, W, C)
    nBy, nBx = H // block, W // block
    s = block + 1
    yy = np.clip(
        np.arange(nBy)[:, None] * block + np.arange(s)[None, :], 0, H - 1
    )
    xx = np.clip(
        np.arange(nBx)[:, None] * block + np.arange(s)[None, :], 0, W - 1
    )
    reg = flat[yy[:, None, :, None], xx[None, :, None, :]]  # [nBy,nBx,s,s,C]
    reg = np.moveaxis(reg, -1, 2)  # [nBy, nBx, C, s, s]
    return reg.reshape(nBy * nBx, C * s * s)


class BakedMeshRenderer:
    """Renders a baked scene directory (scene.json + meshes/ + textures/)."""

    def __init__(self, scene_dir: str, bg_color=None,
                 max_texture_res: int | None = None,
                 block_px: tuple[int, int] = (32, 64)):
        """max_texture_res: box-downsample texture bands above this
        resolution at load (minification prefilter, like GL mipmapping in
        the reference's WebGL viewer; None keeps base level — exact parity
        with the reference TensorTexture lerp path).

        block_px: raster screen-block size (h, w). Coarse 32x64 blocks (the
        default) measure faster end to end (7.24 vs 6.52 Mrays/s on the
        5-shell orbit) even though fine 8x16 tiles via the 2-level binner
        cut ray-triangle tests ~5x — the frame is overhead/memory-bound,
        not FLOP-bound. (8, 16) selects the fine path."""
        from PIL import Image

        self._BLOCK_H, self._BLOCK_W = block_px

        with open(os.path.join(scene_dir, "scene.json")) as f:
            self.scene = json.load(f)
        self.sh_degree = int(self.scene.get("sh_degree", 3))
        bg = bg_color or self.scene.get("bg_color", "black")
        self.bg_color = jnp.ones(3) if bg == "white" else jnp.zeros(3)

        self.meshes = []
        self.textures_u8 = []  # per mesh: list per deg of [H, W, 4, C] uint8
        self.tex_scales = []
        self.ignore_alpha = []
        for mesh_info in self.scene["meshes"]:
            v, f, uv = mesh_io.load_obj(
                os.path.join(scene_dir, mesh_info["mesh_path"])
            )
            self.meshes.append(B.make_tensor_mesh(v, f, uv))
            self.ignore_alpha.append(bool(mesh_info.get("ignore_alpha", False)))

            # group texture features by band: deg d has DEG_NR_COEFFS[d] pngs
            per_deg = []
            scales = []
            infos = iter(mesh_info["textures"])
            for deg in range(self.sh_degree + 1):
                feats = []
                scale = None
                for _ in range(DEG_NR_COEFFS[deg]):
                    info = next(infos)
                    img = Image.open(os.path.join(scene_dir, info["texture_path"]))
                    # keep raw PNG uint8 end to end (the device tables are
                    # uint8; fp16/f32 copies are derived lazily for tests)
                    arr = np.flipud(np.asarray(img, np.uint8)).copy()
                    feats.append(arr)
                    scale = info["texture_scale"]
                tex = np.stack(feats, axis=-1)  # [H, W, 4, C] uint8
                if max_texture_res and tex.shape[0] > max_texture_res:
                    texf = tex.astype(np.float32)
                    while texf.shape[0] > max_texture_res:
                        h2, w2 = texf.shape[0] // 2, texf.shape[1] // 2
                        texf = texf.reshape(
                            h2, 2, w2, 2, *texf.shape[2:]
                        ).mean((1, 3))
                    tex = np.clip(np.rint(texf), 0, 255).astype(np.uint8)
                per_deg.append(tex)
                scales.append(scale)
            self.textures_u8.append(per_deg)
            self.tex_scales.append(scales)

        # BVHs are only needed by the per-ray path (render_rays); the raster
        # frame path never touches them, so they build lazily on first use.
        self._bvhs = None
        self._stacked_bvh = None
        self._textures_f16 = None
        # Scene arrays are passed to the jitted render as ARGUMENTS, never
        # captured by closure: closed-over jnp arrays become compile-time
        # constants embedded in the HLO, which bloats the executable (and
        # overflows remote-compile transports) for multi-hundred-MB texture
        # pyramids. As runtime inputs they live in HBM once and the
        # executable stays small.
        # Block-packed per-(mesh, band) tables (make_band_table): one
        # gathered uint8 row per (pixel, mesh, band) carries the whole
        # bilinear footprint, with the block edge per band tuned to the
        # fast-gather regime (<= 2^18 rows, ~100B rows). Tables stay
        # per-mesh — merging meshes into one 5x bigger table measures ~60%
        # slower, and merging bands into one mega-row makes rows too wide
        # (49M rows/s at 724B vs ~550M at ~100B).
        self.nr_meshes = len(self.meshes)
        self.pack_tex = []  # per mesh: list per band of [rows, C*(b+1)^2]
        self.pack_meta = []  # per mesh: list per band of dicts
        for m in range(self.nr_meshes):
            tabs, metas = [], []
            for deg in range(self.sh_degree + 1):
                tex = self.textures_u8[m][deg]
                block = choose_block_edge(tex.shape[0], tex.shape[1])
                tabs.append(jnp.asarray(make_band_table(tex, block)))
                metas.append(
                    {
                        "res": tex.shape[:2],
                        "block": block,
                        "channels": tex.shape[2] * tex.shape[3],
                    }
                )
            self.pack_tex.append(tabs)
            self.pack_meta.append(metas)
        # raster-path scene (no BVH: frames never trace)
        self._scene_fast = {
            "meshes": self.meshes,
            "pack_tex": self.pack_tex,
            "raster_tables": [
                raster.mesh_raster_tables(m.verts, m.faces, m.uvs)
                for m in self.meshes
            ],
        }
        # static per-mesh cull signs + bounds for the raster fast path:
        # backfaces of closed consistently-wound shells never produce the
        # closest hit when the camera is outside the mesh
        self._cull_signs = [
            raster.mesh_orientation(m.verts, m.faces) for m in self.meshes
        ]
        self._bbox_min = np.stack(
            [np.asarray(m.verts).min(0) for m in self.meshes]
        )
        self._bbox_max = np.stack(
            [np.asarray(m.verts).max(0) for m in self.meshes]
        )
        self._render_jit = jax.jit(self._render_rays)
        self._render_frame_jit = jax.jit(
            self._render_frame_tiles,
            static_argnames=("width", "height", "nr_cand", "use_cull",
                             "nr_blocks", "nr_shade_tiles"),
        )
        self._render_frames_jit = jax.jit(
            self._render_frames_scan,
            static_argnames=("width", "height", "nr_cand", "use_cull",
                             "nr_blocks", "nr_shade_tiles"),
        )
        self._count_blocks_jit = jax.jit(
            self._count_blocks_scan,
            static_argnames=("width", "height", "use_cull"),
        )
        self._count_hit_tiles_jit = jax.jit(
            self._count_hit_tiles_scan,
            static_argnames=("width", "height", "nr_cand", "use_cull",
                             "nr_blocks"),
        )
        # budget-overflow retries/fallbacks taken by render_frame: silent
        # perf cliffs must be countable by callers (bench asserts zero)
        self.fallback_counts = {
            "cand_overflow": 0, "block_overflow": 0, "shade_overflow": 0
        }

    # ---- lazy pieces ---------------------------------------------------------

    @property
    def bvhs(self):
        if self._bvhs is None:
            self._bvhs = [
                B.build_bvh(np.asarray(m.verts), np.asarray(m.faces))
                for m in self.meshes
            ]
        return self._bvhs

    @property
    def stacked_bvh(self):
        if self._stacked_bvh is None:
            self._stacked_bvh = B.stack_bvhs(self.bvhs)
        return self._stacked_bvh

    @property
    def _scene(self):
        """Full scene incl. the BVH (per-ray path); builds the BVH on first
        use — raster frames never pay for it."""
        d = dict(self._scene_fast)
        d["stacked_bvh"] = self.stacked_bvh
        return d

    @property
    def textures(self):
        """Per mesh, per band [H, W, 4, C] float16 copies of the textures
        (tests / introspection; the device tables are uint8)."""
        if self._textures_f16 is None:
            self._textures_f16 = [
                [
                    (t.astype(np.float32) / 255.0).astype(np.float16)
                    for t in per_deg
                ]
                for per_deg in self.textures_u8
            ]
        return self._textures_f16

    # ---- core ----------------------------------------------------------------

    def _sample_bands_mesh(self, scene, m, u, v):
        """Bilinear SH-coefficient sampling for ONE mesh from its
        block-packed band tables: ONE gathered row per (pixel, band) carries
        the whole footprint (make_band_table), and the per-pixel footprint
        reduction is lane-dense 2-D math + one small matmul.
        u, v [N] -> [N, 4, total_coeffs]."""
        N = u.shape[0]
        one = jnp.float16(1.0)
        bands = []
        for deg, mb in enumerate(self.pack_meta[m]):
            table = scene["pack_tex"][m][deg]
            Hd, Wd = mb["res"]
            b = mb["block"]
            C = mb["channels"]
            s = b + 1

            x = u * Wd - 0.5
            y = (1.0 - v) * Hd - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            # negative-side clamp: both corners collapse onto texel 0,
            # so move all weight to the left corner (exact equivalent of
            # clamping each corner index separately); the positive side
            # is exact because regions store clamped edge duplicates.
            fx = jnp.where(x0 < 0, 0.0, x - x0).astype(jnp.float16)
            fy = jnp.where(y0 < 0, 0.0, y - y0).astype(jnp.float16)
            x0c = jnp.clip(x0, 0, Wd - 1).astype(jnp.int32)
            y0c = jnp.clip(y0, 0, Hd - 1).astype(jnp.int32)
            Bx = x0c // b
            By = y0c // b
            rows = table[By * (Wd // b) + Bx]  # [N, C*s*s] uint8
            lx = x0c - Bx * b  # in [0, b-1]; corners lx, lx+1 <= b
            ly = y0c - By * b

            # per-column footprint weights, [N]-shaped fp16 throughout
            # (w_rx = (1-fx) at rx==lx, fx at rx==lx+1, else 0)
            wx = [
                jnp.where(lx == rx, one - fx, 0.0)
                + jnp.where(lx == rx - 1, fx, 0.0)
                for rx in range(s)
            ]
            wy = [
                jnp.where(ly == ry, one - fy, 0.0)
                + jnp.where(ly == ry - 1, fy, 0.0)
                for ry in range(s)
            ]
            w = jnp.stack(
                [wy[ry] * wx[rx] for ry in range(s) for rx in range(s)],
                axis=-1,
            )  # [N, s*s]
            wtile = jnp.concatenate([w] * C, axis=-1)  # [N, C*s*s]
            prod = rows.astype(jnp.float16) * wtile
            # sum each channel's s*s group: one-hot matmul keeps the
            # reduction on the MXU (f32 accumulate) instead of a
            # tiny-trailing-dim reduce
            M_red = jnp.asarray(
                np.kron(np.eye(C, dtype=np.float16), np.ones((s * s, 1), np.float16))
            )
            sampled = jnp.dot(
                prod, M_red, preferred_element_type=jnp.float32
            ).astype(jnp.float16)  # [N, C]
            lo, hi = self.tex_scales[m][deg]
            sampled = jnp.asarray(lo, jnp.float16) + (
                jnp.asarray((hi - lo) / 255.0, jnp.float16) * sampled
            )
            bands.append(sampled.reshape(N, 4, C // 4))
        return jnp.concatenate(bands, axis=-1)

    def _shade_mesh(self, scene, i, uv, hit, dirs):
        """Texture lookup + SH eval + sigmoid for ONE mesh on its own pixel
        set (reference mesh_renderer.py:64-120 shade). uv [N, 2], hit [N],
        dirs [N, 3] -> (rgb [N, 3] f16, alpha [N, 1] f16), zero off-hit."""
        N = uv.shape[0]
        coeffs = self._sample_bands_mesh(scene, i, uv[:, 0], uv[:, 1])
        vals = sh_eval(coeffs, dirs.astype(jnp.float16), self.sh_degree)
        vals = jax.nn.sigmoid(vals.astype(jnp.float32))
        rgb = vals[:, :3]
        if self.ignore_alpha[i]:
            alpha = jnp.ones((N, 1))
        else:
            alpha = vals[:, 3:4]
        is_hit = hit[:, None]
        return (
            jnp.where(is_hit, rgb, 0.0).astype(jnp.float16),
            jnp.where(is_hit, alpha, 0.0).astype(jnp.float16),
        )

    def _composite(self, surfs_rgb, surfs_alpha):
        """fp16 outer->inner alpha compositing over the mesh axis (reference
        volsurfs.py:602-640 blending). surfs_rgb [N, M, 3] f16 (mesh order =
        scene order, innermost first), surfs_alpha [N, M, 1] f16."""
        rgb_o2i = take_rev(surfs_rgb, axis=1)
        alpha_o2i = take_rev(surfs_alpha, axis=1)
        T = small_cumprod(1.0 - alpha_o2i, axis=1)
        if len(self.meshes) == 1:
            surfs_T = jnp.ones_like(T)
            bg_T = T[:, -1]
        else:
            surfs_T = jnp.concatenate([jnp.ones_like(T[:, :1]), T[:, :-1]], axis=1)
            bg_T = T[:, -1]
        rgb_fg = jnp.sum(rgb_o2i * surfs_T * alpha_o2i, axis=1)
        rgb = rgb_fg.astype(jnp.float32) + bg_T.astype(jnp.float32) * self.bg_color
        return {"rgb": rgb, "bg_transmittance": bg_T.astype(jnp.float32)}

    def _render_rays(self, scene, rays_o, rays_d):
        # all k shells traced in one lockstep traversal
        hits_all = B.trace_all(scene["stacked_bvh"], rays_o, rays_d)
        rgbs, alphas = [], []
        for i, mesh in enumerate(scene["meshes"]):
            uv = mesh.face_attr(
                mesh.uvs, hits_all["triangles_id"][i], hits_all["barycentric"][i]
            )
            rgb, alpha = self._shade_mesh(
                scene, i, uv, hits_all["is_hit"][i], rays_d
            )
            rgbs.append(rgb)
            alphas.append(alpha)
        return self._composite(jnp.stack(rgbs, 1), jnp.stack(alphas, 1))

    @staticmethod
    def _to_fine_tiles(x, bh, bw):
        """[T, bh*bw(, C)] block rows -> [T*nf, 128(, C)] fine 8x16 tile rows
        (raster.TILE_H x TILE_W), pixel order preserved within each tile."""
        fh, fw = bh // raster.TILE_H, bw // raster.TILE_W
        T = x.shape[0]
        trail = x.shape[2:]
        x = x.reshape(T, fh, raster.TILE_H, fw, raster.TILE_W, *trail)
        x = jnp.moveaxis(x, 3, 2)
        return x.reshape(T * fh * fw, raster.TILE_P, *trail)

    @staticmethod
    def _from_fine_tiles(x, T, bh, bw):
        """Inverse of _to_fine_tiles: [T*nf, 128(, C)] -> [T, bh*bw(, C)]."""
        fh, fw = bh // raster.TILE_H, bw // raster.TILE_W
        trail = x.shape[2:]
        x = x.reshape(T, fh, fw, raster.TILE_H, raster.TILE_W, *trail)
        x = jnp.moveaxis(x, 2, 3)
        return x.reshape(T, bh * bw, *trail)

    def _render_frame_tiles(self, scene, intrinsics, c2w, w2c, *, width,
                            height, nr_cand, use_cull=False, nr_blocks=0,
                            nr_shade_tiles=0):
        """One rasterized frame: bin + per-mesh block compaction + ONE
        batched candidate scan + per-mesh shading + outer->inner
        compositing. Returns (img tiles reassembled [H, W, 3],
        [candidate, block, shade-tile] overflow counters).

        nr_shade_tiles (static; int or per-mesh tuple, 0 = off): after the
        raster scan, each mesh's shading (texture filtering + SH — the
        most expensive stage) is compacted a second time to the fine 8x16
        tiles that contain >= 1 hit. Off-hit pixels shade to exact zero, so
        dropping no-hit fine tiles is lossless; within candidate blocks only
        ~50-60% of pixels hit (silhouettes, inner shells), so this cuts the
        shading volume nearly in half at equal output."""
        bh, bw = self._BLOCK_H, self._BLOCK_W
        dirs, origin = raster.tile_rays(
            intrinsics, c2w, width, height, tile_h=bh, tile_w=bw
        )
        overflow = jnp.zeros((), jnp.int32)
        if (bh, bw) == (raster.TILE_H, raster.TILE_W):
            # fine tiles: candidates concentrate (scan ~ tiles x K drops
            # ~3x) and block compaction quantizes tighter; the 2-level
            # binner keeps the [tiles, faces] top_k affordable
            cand_list = []
            for i, mesh in enumerate(scene["meshes"]):
                cand, ovf = raster.bin_triangles_2level(
                    mesh.verts, mesh.faces, intrinsics, w2c, width, height,
                    nr_cand,
                    cull_sign=self._cull_signs[i] if use_cull else 0,
                )
                overflow = overflow + jnp.sum(ovf)
                cand_list.append(cand)
        else:
            # NOTE: binning all meshes in one stacked pass (padded faces +
            # one [M, T, F] overlap + one top_k) was measured SLOWER than
            # these per-mesh calls (6.70 vs 7.85 Mrays/s end to end): XLA
            # pipelines the independent per-mesh graphs, and the stacked
            # form adds padding flops + materializations. See RESULTS.md.
            cand_list = []
            for i, mesh in enumerate(scene["meshes"]):
                cand, ovf = raster.bin_triangles(
                    mesh.verts, mesh.faces, intrinsics, w2c, width, height,
                    nr_cand, tile_h=bh, tile_w=bw,
                    cull_sign=self._cull_signs[i] if use_cull else 0,
                )
                overflow = overflow + jnp.sum(ovf)
                cand_list.append(cand)

        T = cand_list[0].shape[0]
        P = bh * bw
        M = len(scene["meshes"])
        # PER-MESH block compaction: each shell raster-tests, texture-filters
        # and shades only the screen blocks ITS OWN candidate triangles
        # touch. Inner shells project far smaller than the union, so the
        # shading volume drops ~sum(blocks_i)/M*union vs union compaction
        # (which shaded every union block for every mesh).
        if isinstance(nr_blocks, int):
            nb_list = [nr_blocks] * M
        else:
            nb_list = list(nr_blocks)
        blk_overflow = jnp.zeros((), jnp.int32)
        iota = jnp.arange(T, dtype=jnp.int32)
        blk_list, valid_list, dirs_list = [], [], []
        for i in range(M):
            nb = nb_list[i]
            if 0 < nb < T:
                has = cand_list[i][:, 0] >= 0
                topv, _ = jax.lax.top_k(jnp.where(has, T - iota, 0), nb)
                blk_valid = topv > 0
                # ascending valid block ids; invalid slots park at row T,
                # sliced off after the scatter
                blk = jnp.where(blk_valid, T - topv, T)
                blk_overflow = blk_overflow + (jnp.sum(has) > nb).astype(
                    jnp.int32
                )
                safe = jnp.minimum(blk, T - 1)
                dirs_list.append(tuple(d[safe] for d in dirs))
                cand_list[i] = jnp.where(
                    blk_valid[:, None], cand_list[i][safe], -1
                )
                blk_list.append(blk)
                valid_list.append(blk_valid)
            else:
                dirs_list.append(dirs)
                blk_list.append(iota)
                valid_list.append(None)

        # all meshes' (tile, candidate) workloads stacked into ONE scan: the
        # per-mesh scans are overhead-bound (fixed per-step cost, small
        # tensors), so k-times-fuller lanes cut the candidate-test stage
        # nearly k-fold (see raster.raster_meshes_batched)
        tri_parts, cand_parts = [], []
        for i in range(M):
            tri_i, cand_i = raster.gather_tri_data(
                scene["raster_tables"][i], cand_list[i]
            )
            tri_parts.append(tri_i)
            cand_parts.append(cand_i)
        dirs_all = tuple(
            jnp.concatenate([dl[c] for dl in dirs_list], 0) for c in range(3)
        )
        is_hit, t, u, v, f = raster.raster_meshes_batched(
            jnp.concatenate(tri_parts, 0),
            jnp.concatenate(cand_parts, 0),
            dirs_all,
            origin,
        )
        # per-mesh shading on its own block set, scattered back to the full
        # tile grid (f16 rgb+alpha) for outer->inner compositing
        if isinstance(nr_shade_tiles, int):
            ns_list = [nr_shade_tiles] * M
        else:
            ns_list = list(nr_shade_tiles)
        fine_ok = (
            bh % raster.TILE_H == 0
            and bw % raster.TILE_W == 0
            and (bh, bw) != (raster.TILE_H, raster.TILE_W)
        )
        shade_overflow = jnp.zeros((), jnp.int32)
        off = 0
        rgbs_full, alphas_full = [], []
        for i in range(M):
            Ti = cand_parts[i].shape[0]
            sl = slice(off, off + Ti)
            off += Ti
            f_i, u_i, v_i = f[sl], u[sl], v[sl]
            d_i = dirs_list[i]
            ns = ns_list[i]
            NT = Ti * (bh // raster.TILE_H) * (bw // raster.TILE_W)
            compact_shade = fine_ok and 0 < ns < NT
            if compact_shade:
                # second compaction: only fine 8x16 tiles with >= 1 hit get
                # shaded (is_hit == f >= 0, so hit comes free from f)
                fpack = jnp.stack(
                    [u_i, v_i, d_i[0], d_i[1], d_i[2]], axis=-1
                )  # [Ti, P, 5]
                f_t = self._to_fine_tiles(f_i, bh, bw)  # [NT, 128]
                fpack_t = self._to_fine_tiles(fpack, bh, bw)  # [NT, 128, 5]
                hit_any = jnp.any(f_t >= 0, axis=1)  # [NT]
                nt_iota = jnp.arange(NT, dtype=jnp.int32)
                topv, _ = jax.lax.top_k(
                    jnp.where(hit_any, NT - nt_iota, 0), ns
                )
                st_valid = topv > 0
                st = jnp.where(st_valid, NT - topv, NT)  # ascending ids
                shade_overflow = shade_overflow + (
                    jnp.sum(hit_any) > ns
                ).astype(jnp.int32)
                safe = jnp.minimum(st, NT - 1)
                f_g = jnp.where(st_valid[:, None], f_t[safe], -1)
                fpack_g = fpack_t[safe]  # [ns, 128, 5]
                u_g, v_g = fpack_g[..., 0], fpack_g[..., 1]
                dirs_flat = fpack_g[..., 2:5].reshape(-1, 3)
                rows = ns
            else:
                f_g, u_g, v_g = f_i, u_i, v_i
                dirs_flat = jnp.stack([d.reshape(-1) for d in d_i], axis=-1)
                rows = Ti
            uv = raster.interp_uv(
                scene["raster_tables"][i], f_g, u_g, v_g
            ).reshape(-1, 2)
            rgb, alpha = self._shade_mesh(
                scene, i, uv, (f_g >= 0).reshape(-1), dirs_flat
            )
            if compact_shade:
                rgb = jnp.zeros((NT + 1, raster.TILE_P, 3), jnp.float16).at[
                    st
                ].set(rgb.reshape(ns, raster.TILE_P, 3),
                      indices_are_sorted=True)[:NT]
                alpha = jnp.zeros((NT + 1, raster.TILE_P, 1), jnp.float16).at[
                    st
                ].set(alpha.reshape(ns, raster.TILE_P, 1),
                      indices_are_sorted=True)[:NT]
                rgb = self._from_fine_tiles(rgb, Ti, bh, bw)
                alpha = self._from_fine_tiles(alpha, Ti, bh, bw)
            else:
                rgb = rgb.reshape(Ti, P, 3)
                alpha = alpha.reshape(Ti, P, 1)
            if valid_list[i] is not None:
                rgb = jnp.zeros((T + 1, P, 3), jnp.float16).at[
                    blk_list[i]
                ].set(rgb, indices_are_sorted=True)[:T]
                alpha = jnp.zeros((T + 1, P, 1), jnp.float16).at[
                    blk_list[i]
                ].set(alpha, indices_are_sorted=True)[:T]
            rgbs_full.append(rgb.reshape(T * P, 3))
            alphas_full.append(alpha.reshape(T * P, 1))
        out = self._composite(
            jnp.stack(rgbs_full, axis=1), jnp.stack(alphas_full, axis=1)
        )
        rgb_tiles = out["rgb"].reshape(T, P, 3)
        return (
            raster.tiles_to_image(rgb_tiles, width, height, tile_h=bh, tile_w=bw),
            jnp.stack([overflow, blk_overflow, shade_overflow]),
        )

    def _render_frames_scan(self, scene, intr_b, c2w_b, w2c_b, *, width,
                            height, nr_cand, use_cull=False, nr_blocks=0,
                            nr_shade_tiles=0):
        """lax.scan over a batch of cameras: renders B frames in ONE
        executable so per-frame host dispatch (expensive through remote
        tunnels, and pure overhead for a swapchain workload) is paid once.

        Measured dead end: vmapping GROUPS of frames per scan step (2-16
        cameras per step, amortizing per-op fixed costs) is monotonically
        SLOWER on the 512^2 5-shell orbit — 9.8 Mrays/s at 1 frame/step vs
        9.3/9.1/8.7/8.5 at 2/4/8/16 — the post-compaction frame is bound by
        real per-element work, not op overhead, and the batched lowerings
        (vmapped top_k/scatter) lower worse. See RESULTS.md round 4."""

        def step(_, cams):
            intr, c2w, w2c = cams
            img, ovf = self._render_frame_tiles(
                scene, intr, c2w, w2c, width=width, height=height,
                nr_cand=nr_cand, use_cull=use_cull, nr_blocks=nr_blocks,
                nr_shade_tiles=nr_shade_tiles,
            )
            return None, (img, ovf)

        _, (imgs, ovfs) = jax.lax.scan(step, None, (intr_b, c2w_b, w2c_b))
        return imgs, jnp.sum(ovfs, axis=0)

    def _count_hit_tiles_scan(self, scene, intr_b, c2w_b, w2c_b, *, width,
                              height, nr_cand, use_cull=False, nr_blocks=0):
        """Over a camera batch: per-mesh max count of fine 8x16 tiles with
        >= 1 raster hit [M] — the budget pre-pass for nr_shade_tiles. Runs
        the real binning + block compaction + raster scan (hits are not
        knowable from binning alone), no shading."""
        bh, bw = self._BLOCK_H, self._BLOCK_W
        M = len(scene["meshes"])
        if isinstance(nr_blocks, int):
            nb_list = [nr_blocks] * M
        else:
            nb_list = list(nr_blocks)

        def one(_, cams):
            intr, c2w, w2c = cams
            dirs, origin = raster.tile_rays(
                intr, c2w, width, height, tile_h=bh, tile_w=bw
            )
            T = dirs[0].shape[0]
            iota = jnp.arange(T, dtype=jnp.int32)
            tri_parts, cand_parts = [], []
            dirs_parts = [[], [], []]
            for i, mesh in enumerate(scene["meshes"]):
                cand, _ = raster.bin_triangles(
                    mesh.verts, mesh.faces, intr, w2c, width, height,
                    nr_cand, tile_h=bh, tile_w=bw,
                    cull_sign=self._cull_signs[i] if use_cull else 0,
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
            _, _, _, _, fb = raster.raster_meshes_batched(
                jnp.concatenate(tri_parts, 0),
                jnp.concatenate(cand_parts, 0),
                tuple(jnp.concatenate(dp, 0) for dp in dirs_parts),
                origin,
            )
            counts = []
            off = 0
            for i in range(M):
                Ti = cand_parts[i].shape[0]
                f_t = self._to_fine_tiles(fb[off : off + Ti], bh, bw)
                counts.append(jnp.sum(jnp.any(f_t >= 0, axis=1)))
                off += Ti
            return None, jnp.stack(counts)

        _, counts = jax.lax.scan(one, None, (intr_b, c2w_b, w2c_b))
        return jnp.max(counts, axis=0)

    def _count_blocks_scan(self, scene, intr_b, c2w_b, w2c_b, *, width,
                           height, use_cull=False):
        """Over a camera batch: (per-mesh max number of screen blocks with
        >= 1 candidate triangle [M], max per-block candidate count over
        meshes) — binning counts only, no candidate lists, no shading."""

        def one(_, cams):
            intr, c2w, w2c = cams
            per_mesh = []
            maxc = jnp.zeros((), jnp.int32)
            for i, mesh in enumerate(scene["meshes"]):
                counts = raster.bin_triangle_counts(
                    mesh.verts, mesh.faces, intr, w2c, width, height,
                    tile_h=self._BLOCK_H, tile_w=self._BLOCK_W,
                    cull_sign=self._cull_signs[i] if use_cull else 0,
                )
                per_mesh.append(jnp.sum(counts > 0))
                maxc = jnp.maximum(maxc, jnp.max(counts))
            return None, (jnp.stack(per_mesh), maxc)

        _, (blocks, cands) = jax.lax.scan(one, None, (intr_b, c2w_b, w2c_b))
        return jnp.max(blocks, axis=0), jnp.max(cands)

    # ---- public --------------------------------------------------------------

    def suggest_budgets(self, cameras, margin: int = 8):
        """(nr_cand, nr_blocks, nr_shade_tiles) budgets for
        `render_frames_device` on this camera set. From a binning-counts
        pre-pass: the max per-block candidate count and PER MESH the max
        per-frame candidate-block count; from a raster pre-pass: PER MESH
        the max per-frame count of fine 8x16 tiles with >= 1 hit. Each plus
        a margin, rounded up to a multiple of 8. The candidate scan is
        linear in nr_cand, shading in each mesh's shade-tile budget, so
        tight per-mesh budgets matter (inner shells cover far fewer pixels
        than the outer); overflow still feeds the caller's retry. nr_blocks
        and nr_shade_tiles are per-mesh tuples; an entry is 0 (no
        compaction) when its budget would not beat the uncompacted path,
        and the whole value is the int 0 if no mesh benefits."""
        w, h = cameras[0].width, cameras[0].height
        poses = np.stack([c.pose for c in cameras])
        intr_b = jnp.asarray(np.stack([c.intrinsics for c in cameras]),
                             jnp.float32)
        c2w_b = jnp.asarray(poses, jnp.float32)
        w2c_b = jnp.asarray(
            np.stack([np.linalg.inv(c.pose) for c in cameras]), jnp.float32
        )
        use_cull = self._cameras_outside(poses)
        blocks, cands = self._count_blocks_jit(
            self._scene_fast, intr_b, c2w_b, w2c_b, width=w, height=h,
            use_cull=use_cull,
        )
        total = (raster._pad_to(w, self._BLOCK_W) // self._BLOCK_W) * (
            raster._pad_to(h, self._BLOCK_H) // self._BLOCK_H
        )
        blk_budget = tuple(
            b if b < total else 0
            for b in ((int(x) + margin + 7) // 8 * 8 for x in np.asarray(blocks))
        )
        cand_budget = (int(cands) + margin + 7) // 8 * 8
        nr_blocks = blk_budget if any(blk_budget) else 0

        # shade-tile budgets need real raster hits (margin is in fine tiles;
        # scale the default 8-block margin to the finer granularity)
        fine_per_block = (self._BLOCK_H // raster.TILE_H) * (
            self._BLOCK_W // raster.TILE_W
        )
        hit_tiles = np.asarray(self._count_hit_tiles_jit(
            self._scene_fast, intr_b, c2w_b, w2c_b, width=w, height=h,
            nr_cand=cand_budget, use_cull=use_cull, nr_blocks=nr_blocks,
        ))
        st_budget = []
        for i in range(len(hit_tiles)):
            nt_total = (blk_budget[i] if blk_budget[i] > 0 else total
                        ) * fine_per_block
            st = (int(hit_tiles[i]) + margin * fine_per_block + 7) // 8 * 8
            st_budget.append(st if st < nt_total else 0)
        nr_shade_tiles = (
            tuple(st_budget) if any(st_budget) else 0
        )
        return cand_budget, nr_blocks, nr_shade_tiles

    def render_rays(self, rays_o, rays_d):
        return self._render_jit(self._scene, rays_o, rays_d)

    def render_frame_device(self, camera, nr_cand: int = 256,
                            nr_blocks: int = 0, nr_shade_tiles: int = 0):
        """Rasterized frame as DEVICE arrays (img [H, W, 3] f32, overflow
        [3] int32 [candidate, block, shade-tile]) — no host sync, so frames
        can be pipelined back to back."""
        intr = jnp.asarray(camera.intrinsics, jnp.float32)
        c2w = jnp.asarray(camera.pose, jnp.float32)
        w2c = jnp.asarray(np.linalg.inv(camera.pose), jnp.float32)
        return self._render_frame_jit(
            self._scene_fast, intr, c2w, w2c,
            width=camera.width, height=camera.height, nr_cand=nr_cand,
            use_cull=self._cameras_outside(camera.pose),
            nr_blocks=nr_blocks, nr_shade_tiles=nr_shade_tiles,
        )

    def _cameras_outside(self, poses):
        """True iff every camera center sits outside every mesh bbox (the
        precondition for backface culling)."""
        origins = np.asarray(poses, np.float32).reshape(-1, 4, 4)[:, :3, 3]
        inside = np.all(
            (origins[:, None, :] >= self._bbox_min[None] - 1e-3)
            & (origins[:, None, :] <= self._bbox_max[None] + 1e-3),
            axis=-1,
        )
        return not bool(inside.any())

    def render_frames_device(self, cameras, nr_cand: int = 256,
                             nr_blocks: int = 0, nr_shade_tiles: int = 0):
        """Batched frame render: all cameras drawn inside one executable
        (lax.scan). Returns (imgs [B, H, W, 3] f32 DEVICE array, overflow
        [3] int32 [candidate, block, shade-tile]) without host sync — the
        real-time path for frame sequences."""
        w = cameras[0].width
        h = cameras[0].height
        poses = np.stack([c.pose for c in cameras])
        intr_b = jnp.asarray(
            np.stack([c.intrinsics for c in cameras]), jnp.float32
        )
        c2w_b = jnp.asarray(poses, jnp.float32)
        w2c_b = jnp.asarray(
            np.stack([np.linalg.inv(c.pose) for c in cameras]), jnp.float32
        )
        return self._render_frames_jit(
            self._scene_fast, intr_b, c2w_b, w2c_b, width=w, height=h,
            nr_cand=nr_cand, use_cull=self._cameras_outside(poses),
            nr_blocks=nr_blocks, nr_shade_tiles=nr_shade_tiles,
        )

    def render_frame(self, camera, nr_cand: int = 256, nr_blocks: int = 0,
                     nr_shade_tiles: int = 0):
        """Full frame via rasterization — the fast path for camera frames
        (the reference's real-time usage). Returns [H, W, 3] float numpy.
        Retries with larger candidate/block/shade-tile budgets if anything
        overflowed (a drop would otherwise leave holes); the three overflow
        counters are reported separately so only the exhausted budget grows.
        Backfaces are culled whenever the camera is outside every shell
        (never changes the closest hit there).

        Every retry is counted in ``self.fallback_counts`` ("cand_overflow",
        "block_overflow", "shade_overflow") and warned once per renderer —
        a too-tight budget silently halving throughput is a perf bug, not
        normal operation."""
        import warnings

        while True:
            img, overflow = self.render_frame_device(
                camera, nr_cand, nr_blocks, nr_shade_tiles
            )
            cand_ovf, blk_ovf, shade_ovf = (
                int(x) for x in np.asarray(overflow)
            )
            if (cand_ovf == 0 or nr_cand >= 8192) and blk_ovf == 0 \
                    and shade_ovf == 0:
                return np.asarray(img)
            if shade_ovf:
                self.fallback_counts["shade_overflow"] += 1
                if self.fallback_counts["shade_overflow"] == 1:
                    warnings.warn(
                        "render_frame: shade-tile budget overflowed — falling"
                        " back to uncompacted shading (each such frame shades"
                        " every candidate-block pixel; raise nr_shade_tiles"
                        " or rerun suggest_budgets)",
                        stacklevel=2,
                    )
                nr_shade_tiles = 0
            if blk_ovf:
                self.fallback_counts["block_overflow"] += 1
                if self.fallback_counts["block_overflow"] == 1:
                    warnings.warn(
                        "render_frame: block budget overflowed — falling back"
                        " to the uncompacted frame (each such frame re-shades"
                        " the full tile grid; raise nr_blocks or rerun"
                        " suggest_budgets)",
                        stacklevel=2,
                    )
                nr_blocks = 0  # fall back to the uncompacted frame
                nr_shade_tiles = 0  # budgets were per the compacted grid
            if cand_ovf:
                self.fallback_counts["cand_overflow"] += 1
                if self.fallback_counts["cand_overflow"] == 1:
                    warnings.warn(
                        f"render_frame: candidate budget {nr_cand} overflowed"
                        " — doubling and re-rendering (each retry is a full"
                        " extra frame; raise nr_cand)",
                        stacklevel=2,
                    )
                nr_cand *= 2

    def render(self, camera, chunk_size: int = 65536):
        """Full frame, chunked (reference base_renderer.py:11-101)."""
        from volsurfs_tpu.datasets.cameras import get_camera_rays

        rays_o, rays_d = get_camera_rays(camera)
        n = rays_o.shape[0]
        outs = []
        for i in range(0, n, chunk_size):
            outs.append(
                self._render_jit(
                    self._scene, rays_o[i : i + chunk_size], rays_d[i : i + chunk_size]
                )
            )
        rgb = np.concatenate([np.asarray(o["rgb"]) for o in outs])
        return rgb.reshape(camera.height, camera.width, 3)
