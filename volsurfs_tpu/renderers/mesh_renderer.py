"""Baked-scene renderer: k textured meshes, ray-traced and alpha-blended.

Re-implements the reference MeshRenderer (volsurfs_py/renderers/
mesh_renderer.py:16-201 + base_renderer.py:11-101): loads a baked
``scene.json`` (meshes + SH texture PNG pyramids), traces every mesh with the
BVH, samples the textures bilinearly, evaluates the spherical harmonics at
the view direction, applies sigmoid, and composites outer -> inner in
float16 — the exact math the WebGL viewer runs. This is the real-time path
the Mrays/sec benchmark measures.
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


def _bilinear_sample(tex, uv):
    """Bilinear texture lookup. tex [H, W, C]; uv [N, 2] with the framework's
    v-flip convention. Returns [N, C] (float16 filtering, WebGL parity)."""
    H, W = tex.shape[:2]
    x = uv[:, 0] * W - 0.5
    y = (1.0 - uv[:, 1]) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None].astype(jnp.float16)
    fy = (y - y0)[:, None].astype(jnp.float16)

    def at(xi, yi):
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        return tex[yi, xi].astype(jnp.float16)

    return (
        at(x0, y0) * (1 - fx) * (1 - fy)
        + at(x0 + 1, y0) * fx * (1 - fy)
        + at(x0, y0 + 1) * (1 - fx) * fy
        + at(x0 + 1, y0 + 1) * fx * fy
    )


class BakedMeshRenderer:
    """Renders a baked scene directory (scene.json + meshes/ + textures/)."""

    def __init__(self, scene_dir: str, bg_color=None):
        from PIL import Image

        with open(os.path.join(scene_dir, "scene.json")) as f:
            self.scene = json.load(f)
        self.sh_degree = int(self.scene.get("sh_degree", 3))
        bg = bg_color or self.scene.get("bg_color", "black")
        self.bg_color = jnp.ones(3) if bg == "white" else jnp.zeros(3)

        self.meshes = []
        self.bvhs = []
        self.textures = []  # per mesh: list per deg of ([H,W,4] arrays per feat)
        self.tex_scales = []
        self.ignore_alpha = []
        for mesh_info in self.scene["meshes"]:
            v, f, uv = mesh_io.load_obj(
                os.path.join(scene_dir, mesh_info["mesh_path"])
            )
            self.meshes.append(B.make_tensor_mesh(v, f, uv))
            self.bvhs.append(B.build_bvh(v, f))
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
                    arr = np.asarray(img, np.float32) / 255.0  # [H, W, 4]
                    arr = np.flipud(arr).copy()  # undo the export flip
                    feats.append(arr)
                    scale = info["texture_scale"]
                # fp16 storage: halves HBM gather traffic; filtering is fp16
                # anyway (WebGL parity, reference neural_texture.py:104-140)
                per_deg.append(
                    jnp.asarray(np.stack(feats, axis=-1), jnp.float16)
                )  # [H,W,4,C]
                scales.append(scale)
            self.textures.append(per_deg)
            self.tex_scales.append(scales)

        self._render_jit = jax.jit(self._render_rays)

    # ---- core ----------------------------------------------------------------

    def _sample_sh_coeffs(self, mesh_idx, uv):
        """[N, 4, nr_coeffs] rgba SH coefficients at uv (expanded to range)."""
        bands = []
        for deg in range(self.sh_degree + 1):
            tex = self.textures[mesh_idx][deg]  # [H, W, 4, C]
            H, W, _, C = tex.shape
            flat = tex.reshape(H, W, 4 * C)
            sampled = _bilinear_sample(flat, uv).reshape(-1, 4, C)
            lo, hi = self.tex_scales[mesh_idx][deg]
            sampled = jnp.asarray(lo, jnp.float16) + (
                jnp.asarray(hi - lo, jnp.float16) * sampled
            )
            bands.append(sampled)
        return jnp.concatenate(bands, axis=-1)

    def _render_rays(self, rays_o, rays_d):
        R = rays_o.shape[0]
        rgbs, alphas = [], []
        for i, (mesh, bvh) in enumerate(zip(self.meshes, self.bvhs)):
            hit = B.trace(bvh, rays_o, rays_d)
            is_hit = hit["is_hit"][:, None]
            uv = mesh.face_attr(mesh.uvs, hit["triangles_id"], hit["barycentric"])
            coeffs = self._sample_sh_coeffs(i, uv)  # [N, 4, C]
            vals = sh_eval(
                coeffs, rays_d.astype(jnp.float16), self.sh_degree
            )  # [N, 4]
            vals = jax.nn.sigmoid(vals.astype(jnp.float32))
            rgb = vals[:, :3]
            if self.ignore_alpha[i]:
                alpha = jnp.ones((R, 1))
            else:
                alpha = vals[:, 3:4]
            rgbs.append(jnp.where(is_hit, rgb, 0.0))
            alphas.append(jnp.where(is_hit, alpha, 0.0))

        surfs_rgb = jnp.stack(rgbs, axis=1)
        surfs_alpha = jnp.stack(alphas, axis=1)
        rgb_o2i = jnp.flip(surfs_rgb, axis=1).astype(jnp.float16)
        alpha_o2i = jnp.flip(surfs_alpha, axis=1).astype(jnp.float16)
        T = jnp.cumprod(1.0 - alpha_o2i, axis=1)
        if len(self.meshes) == 1:
            surfs_T = jnp.ones_like(T)
            bg_T = T[:, -1]
        else:
            surfs_T = jnp.concatenate([jnp.ones_like(T[:, :1]), T[:, :-1]], axis=1)
            bg_T = T[:, -1]
        rgb_fg = jnp.sum(rgb_o2i * surfs_T * alpha_o2i, axis=1)
        rgb = rgb_fg.astype(jnp.float32) + bg_T.astype(jnp.float32) * self.bg_color
        return {"rgb": rgb, "bg_transmittance": bg_T.astype(jnp.float32)}

    # ---- public --------------------------------------------------------------

    def render_rays(self, rays_o, rays_d):
        return self._render_jit(rays_o, rays_d)

    def render(self, camera, chunk_size: int = 65536):
        """Full frame, chunked (reference base_renderer.py:11-101)."""
        from volsurfs_tpu.datasets.cameras import get_camera_rays

        rays_o, rays_d = get_camera_rays(camera)
        n = rays_o.shape[0]
        outs = []
        for i in range(0, n, chunk_size):
            outs.append(self._render_jit(rays_o[i : i + chunk_size], rays_d[i : i + chunk_size]))
        rgb = np.concatenate([np.asarray(o["rgb"]) for o in outs])
        return rgb.reshape(camera.height, camera.width, 3)
