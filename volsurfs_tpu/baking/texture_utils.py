"""Texture post-processing: seam dilation and legacy per-texel extraction.

Re-implements the reference texture utilities
(volsurfs_py/utils/texture_extraction.py): `dilate_texture` (:325-407) fills
empty texels from occupied neighbours so bilinear lookups near UV-island
borders don't bleed zeros, and `sample_surface_texels` is the modern
equivalent of the deprecated per-texel surface sampling (:56-208) — it maps
texel centers back to mesh surface points via the UV atlas so a 3D field can
be baked into a 2D texture.

Unlike the reference (a Python loop over empty pixels), dilation here is a
vectorized 8-neighbour masked propagation — O(iterations) full-image ops.
"""

from __future__ import annotations

import numpy as np

_OFFSETS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def dilate_texture(img: np.ndarray, nr_iterations: int, mask: np.ndarray | None = None):
    """Fill empty texels with the mean of their occupied 8-neighbours,
    repeated `nr_iterations` times (early exit when nothing is empty).

    img: [H, W, C] float or uint8. mask: optional [H, W] bool of occupied
    texels; defaults to "any channel non-zero" like the reference
    (texture_extraction.py:364).
    Returns (dilated_img, final_mask).
    """
    out = np.array(img, np.float32, copy=True)
    occ = (
        np.asarray(mask, bool)
        if mask is not None
        else (out != 0).any(axis=2)
    )
    for _ in range(nr_iterations):
        if occ.all():
            break
        acc = np.zeros_like(out)
        cnt = np.zeros(out.shape[:2], np.float32)
        for dy, dx in _OFFSETS:
            shifted = np.roll(np.roll(out, dy, axis=0), dx, axis=1)
            shifted_occ = np.roll(np.roll(occ, dy, axis=0), dx, axis=1)
            # roll wraps; kill wrapped rows/cols
            if dy == 1:
                shifted_occ[0, :] = False
            elif dy == -1:
                shifted_occ[-1, :] = False
            if dx == 1:
                shifted_occ[:, 0] = False
            elif dx == -1:
                shifted_occ[:, -1] = False
            acc += np.where(shifted_occ[..., None], shifted, 0.0)
            cnt += shifted_occ
        fill = ~occ & (cnt > 0)
        out[fill] = acc[fill] / cnt[fill][:, None]
        occ = occ | fill
    if img.dtype == np.uint8:
        out = out.round().clip(0, 255).astype(np.uint8)
    return out, occ


def sample_surface_texels(verts, faces, uvs, res: int):
    """Rasterize the UV atlas at `res`²: for each texel covered by a
    triangle's UV footprint, return the corresponding 3D surface point and
    normal (reference texture_extraction.py:56-208 semantics).

    Returns (positions [res,res,3], normals [res,res,3], occupied [res,res]).
    Texels outside every UV island are zero / False — feed the baked result
    through `dilate_texture`.
    """
    from volsurfs_tpu.ops.bvh import compute_vertex_normals

    vnormals = compute_vertex_normals(np.asarray(verts), np.asarray(faces))
    positions = np.zeros((res, res, 3), np.float32)
    normals = np.zeros((res, res, 3), np.float32)
    occupied = np.zeros((res, res), bool)

    tex_uv = np.asarray(uvs, np.float32) * res  # texel space
    for face in np.asarray(faces):
        tri_uv = tex_uv[face]  # [3, 2] (u, v)
        lo = np.floor(tri_uv.min(axis=0)).astype(int)
        hi = np.ceil(tri_uv.max(axis=0)).astype(int)
        lo = np.clip(lo, 0, res - 1)
        hi = np.clip(hi, 0, res)
        if (hi <= lo).any():
            continue
        xs = np.arange(lo[0], hi[0]) + 0.5
        ys = np.arange(lo[1], hi[1]) + 0.5
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        pts = np.stack([gx.ravel(), gy.ravel()], -1)  # [P, 2]
        # barycentric in UV space
        a, b, c = tri_uv
        v0, v1, v2 = b - a, c - a, pts - a
        d00, d01, d11 = v0 @ v0, v0 @ v1, v1 @ v1
        d20, d21 = v2 @ v0, v2 @ v1
        denom = d00 * d11 - d01 * d01
        if abs(denom) < 1e-12:
            continue
        w1 = (d11 * d20 - d01 * d21) / denom
        w2 = (d00 * d21 - d01 * d20) / denom
        w0 = 1.0 - w1 - w2
        inside = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6)
        if not inside.any():
            continue
        bary = np.stack([w0, w1, w2], -1)[inside]
        px = pts[inside].astype(int)
        tri_v = np.asarray(verts)[face]
        tri_n = vnormals[face]
        # v axis: texture row 0 is v=1 (flip like baker._texel_center_uvs)
        rows = res - 1 - px[:, 1]
        cols = px[:, 0]
        positions[rows, cols] = bary @ tri_v
        n = bary @ tri_n
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        normals[rows, cols] = n
        occupied[rows, cols] = True
    return positions, normals, occupied
