"""Tile-binned rasterizer for baked mesh-shell frames.

TPU-native frame renderer for the baked VolSurfs scene (the reference's
real-time path is likewise rasterization: the WebGL viewer draws the k
textured shells with the GPU raster pipeline, README.md:5, SURVEY.md §3.3).
Per-ray BVH traversal is a pointer-chasing workload that bottlenecks on the
TPU's fixed ~250M gathered-rows/s; rasterization replaces it with dense
regular compute:

  1. vertex projection           — tiny matmuls
  2. triangle -> tile binning    — one broadcast compare [tiles, faces]
                                   + top_k for fixed-size candidate lists
  3. per-tile shading            — lax.scan over K candidate slots; each
                                   step broadcasts ONE triangle per tile to
                                   all 128 tile pixels (full-lane VPU math,
                                   zero gathers in the inner loop)

Tiles are 8 x 16 px = 128 lanes. Intersection runs in world space with the
exact Moller-Trumbore test the BVH tracer uses, so raster frames match
`trace_all` frames bit-for-bit on hits (up to candidate-list overflow, see
`overflow` output).

Limitation: triangles crossing the near plane are culled (fine for orbit /
eval cameras outside the scene; the generic BVH path has no such limit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TILE_H = 8
TILE_W = 16
TILE_P = TILE_H * TILE_W  # 128 = one full VPU lane row


def _pad_to(x, m):
    return (x + m - 1) // m * m


def mesh_raster_tables(verts, faces, uvs):
    """Per-face static tables: world-space (v0, e1, e2) [F, 9] and the three
    vertex UVs [F, 6]. Built once per mesh."""
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    tri = jnp.concatenate([v0, v1 - v0, v2 - v0], axis=-1)  # [F, 9]
    uvs = jnp.asarray(uvs, jnp.float32)
    uv_tri = jnp.concatenate(
        [uvs[faces[:, 0]], uvs[faces[:, 1]], uvs[faces[:, 2]]], axis=-1
    )  # [F, 6]
    return {"tri": tri, "uv_tri": uv_tri}


def mesh_orientation(verts, faces):
    """+1 if the mesh is wound with outward normals (positive signed
    volume), -1 if inward, 0 if degenerate/ambiguous (|V| tiny). Host-side,
    used to pick the backface-cull sign for closed shells."""
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    vol = np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2))) / 6.0
    scale = np.abs(verts).max() + 1e-12
    if np.abs(vol) < 1e-9 * scale**3:
        return 0
    return 1 if vol > 0 else -1


def _project_face_bboxes(verts, faces, intrinsics, w2c, near, cull_sign):
    """Shared projection stage of every binning variant: camera-space
    projection, near-plane validity, optional backface cull, per-face screen
    bbox. Returns (x0, x1, y0, y1 [F] floats, valid [F] bool)."""
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    pc = verts @ R.T + t  # camera space
    z = pc[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    sx = fx * pc[:, 0] / z_safe + cx
    sy = fy * pc[:, 1] / z_safe + cy
    f_sx = sx[faces]  # [F, 3]
    f_sy = sy[faces]
    f_z = z[faces]
    valid = jnp.all(f_z > near, axis=-1)
    if cull_sign:
        origin = -R.T @ t  # camera center in world space
        wv0 = verts[faces[:, 0]]
        n = jnp.cross(verts[faces[:, 1]] - wv0, verts[faces[:, 2]] - wv0)
        facing = jnp.einsum("ij,ij->i", n, wv0 - origin[None, :])
        valid = valid & (jnp.float32(cull_sign) * facing < 0.0)
    x0 = jnp.min(f_sx, axis=-1)
    x1 = jnp.max(f_sx, axis=-1)
    y0 = jnp.min(f_sy, axis=-1)
    y1 = jnp.max(f_sy, axis=-1)
    return x0, x1, y0, y1, valid


def _tile_overlap(x0, x1, y0, y1, valid, width, height, tile_h, tile_w):
    """[tiles, F] bool: face bbox overlaps the tile (row-major tiles)."""
    tx0 = jnp.floor(x0 / tile_w).astype(jnp.int32)
    tx1 = jnp.floor(x1 / tile_w).astype(jnp.int32)
    ty0 = jnp.floor(y0 / tile_h).astype(jnp.int32)
    ty1 = jnp.floor(y1 / tile_h).astype(jnp.int32)
    n_tx = _pad_to(width, tile_w) // tile_w
    n_ty = _pad_to(height, tile_h) // tile_h
    tiles_x = jnp.arange(n_tx, dtype=jnp.int32)
    tiles_y = jnp.arange(n_ty, dtype=jnp.int32)
    ox = (tx0[None, :] <= tiles_x[:, None]) & (tiles_x[:, None] <= tx1[None, :])
    oy = (ty0[None, :] <= tiles_y[:, None]) & (tiles_y[:, None] <= ty1[None, :])
    F = x0.shape[0]
    ovl = (
        oy.reshape(n_ty, 1, F) & ox.reshape(1, n_tx, F)
    ).reshape(n_ty * n_tx, F)
    return ovl & valid[None, :]




def bin_triangles(verts, faces, intrinsics, w2c, width, height, nr_cand,
                  near=0.05, tile_h=TILE_H, tile_w=TILE_W, cull_sign=0):
    """Project vertices and build fixed-size per-tile candidate lists.

    cull_sign: 0 keeps every triangle; +-1 drops backfaces of a closed,
    consistently wound mesh (sign = mesh_orientation). Only valid when the
    camera is outside the mesh — there the closest hit is always a front
    face, so culling cannot change the rendered image.

    Returns cand [T, K] int32 face ids (-1 empty), and overflow [T] bool
    (true where more than K triangles overlapped the tile).
    """
    x0, x1, y0, y1, valid = _project_face_bboxes(
        verts, faces, intrinsics, w2c, near, cull_sign
    )
    ovl = _tile_overlap(x0, x1, y0, y1, valid, width, height, tile_h, tile_w)
    F = x0.shape[0]

    # fixed-size candidate ids: smallest face indices first via top_k on
    # (F - index) scores; 0 means "no triangle". (A cumsum+searchsorted
    # compaction was tried and measures 5.2 vs 7.2 Mrays/s end to end —
    # XLA's vmapped binary search lowers worse than the top_k sort.)
    nr_cand = min(nr_cand, F)  # budget can't exceed the face count
    iota = jnp.arange(F, dtype=jnp.int32)
    scores = jnp.where(ovl, F - iota, 0)
    topv, _ = jax.lax.top_k(scores, nr_cand)
    cand = jnp.where(topv > 0, F - topv, -1)  # [T, K]
    count = jnp.sum(ovl, axis=-1)
    overflow = count > nr_cand
    return cand, overflow


def bin_triangle_counts(verts, faces, intrinsics, w2c, width, height,
                        near=0.05, tile_h=TILE_H, tile_w=TILE_W, cull_sign=0):
    """Per-tile candidate-triangle COUNTS only (no candidate lists, no
    top_k) — the cheap pre-pass behind budget suggestion. Same overlap
    logic as bin_triangles. Returns count [T] int32."""
    x0, x1, y0, y1, valid = _project_face_bboxes(
        verts, faces, intrinsics, w2c, near, cull_sign
    )
    ovl = _tile_overlap(x0, x1, y0, y1, valid, width, height, tile_h, tile_w)
    return jnp.sum(ovl, axis=-1)


def bin_triangles_2level(verts, faces, intrinsics, w2c, width, height,
                         nr_cand, nr_coarse_cand=None, near=0.05,
                         cull_sign=0):
    """Two-level binning: coarse 32x64 px blocks first, then fine 8x16 tiles
    against only the coarse candidates. Cuts the top_k work ~9x vs the
    single-level [tiles, faces] mask (the dominant binning cost).

    cull_sign: as in bin_triangles (backface culling for closed shells).

    Returns (cand [T, K], overflow [T])."""
    if nr_coarse_cand is None:
        nr_coarse_cand = int(min(faces.shape[0], max(2 * nr_cand, 256)))
    x0, x1, y0, y1, valid = _project_face_bboxes(
        verts, faces, intrinsics, w2c, near, cull_sign
    )
    faces = jnp.asarray(faces, jnp.int32)

    n_tx = _pad_to(width, TILE_W) // TILE_W
    n_ty = _pad_to(height, TILE_H) // TILE_H
    CW, CH = 4, 4  # coarse block = 4x4 fine tiles (64x32 px)
    n_cx = _pad_to(n_tx, CW) // CW
    n_cy = _pad_to(n_ty, CH) // CH
    F = faces.shape[0]

    # ---- coarse level -------------------------------------------------------
    cw_px, ch_px = CW * TILE_W, CH * TILE_H
    ctx0 = jnp.floor(x0 / cw_px).astype(jnp.int32)
    ctx1 = jnp.floor(x1 / cw_px).astype(jnp.int32)
    cty0 = jnp.floor(y0 / ch_px).astype(jnp.int32)
    cty1 = jnp.floor(y1 / ch_px).astype(jnp.int32)
    cxs = jnp.arange(n_cx, dtype=jnp.int32)
    cys = jnp.arange(n_cy, dtype=jnp.int32)
    ox = (ctx0[None, :] <= cxs[:, None]) & (cxs[:, None] <= ctx1[None, :])
    oy = (cty0[None, :] <= cys[:, None]) & (cys[:, None] <= cty1[None, :])
    covl = (oy.reshape(n_cy, 1, F) & ox.reshape(1, n_cx, F)).reshape(-1, F)
    covl = covl & valid[None, :]
    iota = jnp.arange(F, dtype=jnp.int32)
    cscores = jnp.where(covl, F - iota, 0)
    ctopv, _ = jax.lax.top_k(cscores, nr_coarse_cand)
    ccand = jnp.where(ctopv > 0, F - ctopv, 0)  # [Tc, Kc]; 0 is safe filler
    ccand_valid = ctopv > 0
    c_overflow = jnp.sum(covl, axis=-1) > nr_coarse_cand

    # ---- fine level against coarse candidates -------------------------------
    # bbox data of coarse candidates (small gather)
    g = lambda a: a[ccand]  # [Tc, Kc]
    bx0, bx1, by0, by1 = g(x0), g(x1), g(y0), g(y1)

    # fine tiles grouped [Tc, CH*CW]; fine tile (cyi, fy_, cxi, fx_)
    fys = jnp.arange(CH)[None, :, None, None]  # within-coarse row
    fxs = jnp.arange(CW)[None, None, None, :]
    cyi = jnp.arange(n_cy)[:, None, None, None]
    cxi = jnp.arange(n_cx)[None, None, :, None]
    tile_y = (cyi * CH + fys)  # [n_cy, CH, 1, 1] broadcast
    tile_x = (cxi * CW + fxs)
    # pixel ranges of each fine tile
    px0 = (tile_x * TILE_W).astype(jnp.float32)
    px1 = px0 + TILE_W
    py0 = (tile_y * TILE_H).astype(jnp.float32)
    py1 = py0 + TILE_H
    # [n_cy, CH, n_cx, CW] -> [Tc, CH*CW]
    shape4 = jnp.broadcast_shapes(px0.shape, py0.shape)
    px0 = jnp.broadcast_to(px0, shape4).reshape(n_cy, CH, n_cx, CW)
    px1 = jnp.broadcast_to(px1, shape4).reshape(n_cy, CH, n_cx, CW)
    py0 = jnp.broadcast_to(py0, shape4).reshape(n_cy, CH, n_cx, CW)
    py1 = jnp.broadcast_to(py1, shape4).reshape(n_cy, CH, n_cx, CW)
    def to_tc(a):
        return jnp.transpose(a, (0, 2, 1, 3)).reshape(n_cy * n_cx, CH * CW)
    px0, px1, py0, py1 = to_tc(px0), to_tc(px1), to_tc(py0), to_tc(py1)

    fovl = (
        (bx0[:, None, :] < px1[:, :, None])
        & (bx1[:, None, :] >= px0[:, :, None])
        & (by0[:, None, :] < py1[:, :, None])
        & (by1[:, None, :] >= py0[:, :, None])
        & ccand_valid[:, None, :]
    )  # [Tc, CH*CW, Kc]
    kc_iota = jnp.arange(nr_coarse_cand, dtype=jnp.int32)
    fscores = jnp.where(fovl, nr_coarse_cand - kc_iota, 0)
    ftopv, _ = jax.lax.top_k(fscores, nr_cand)  # [Tc, CH*CW, K]
    slot = nr_coarse_cand - ftopv
    cand_f = jnp.where(
        ftopv > 0,
        jnp.take_along_axis(
            jnp.broadcast_to(ccand[:, None, :], fovl.shape),
            jnp.minimum(slot, nr_coarse_cand - 1),
            axis=-1,
        ),
        -1,
    )  # [Tc, CH*CW, K]
    f_overflow = (jnp.sum(fovl, axis=-1) > nr_cand) | c_overflow[:, None]

    # reorder [Tc, CH*CW, K] -> [T(row-major fine tiles), K]
    cand_f = cand_f.reshape(n_cy, n_cx, CH, CW, nr_cand)
    cand_f = jnp.transpose(cand_f, (0, 2, 1, 3, 4)).reshape(
        n_cy * CH * n_cx * CW, nr_cand
    )
    f_overflow = f_overflow.reshape(n_cy, n_cx, CH, CW)
    overflow = jnp.transpose(f_overflow, (0, 2, 1, 3)).reshape(-1)

    # crop padded fine-tile rows/cols back to the real tile grid
    full_ty, full_tx = n_cy * CH, n_cx * CW
    cand_f = cand_f.reshape(full_ty, full_tx, nr_cand)[:n_ty, :n_tx].reshape(
        -1, nr_cand
    )
    overflow = overflow.reshape(full_ty, full_tx)[:n_ty, :n_tx].reshape(-1)
    return cand_f, overflow


def tile_rays(intrinsics, c2w, width, height, tile_h=TILE_H, tile_w=TILE_W):
    """Per-tile pixel ray directions in world space, SoA [T, tile_h*tile_w]
    layout, plus the shared origin. Matches datasets.cameras.get_camera_rays
    (pixel centers at +0.5, OpenCV c2w)."""
    n_tx = _pad_to(width, tile_w) // tile_w
    n_ty = _pad_to(height, tile_h) // tile_h
    ty, tx, py, px = jnp.meshgrid(
        jnp.arange(n_ty), jnp.arange(n_tx),
        jnp.arange(tile_h), jnp.arange(tile_w),
        indexing="ij",
    )
    ix = (tx * tile_w + px).astype(jnp.float32) + 0.5  # pixel x
    iy = (ty * tile_h + py).astype(jnp.float32) + 0.5
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    xc = (ix - cx) / fx
    yc = (iy - cy) / fy
    R = c2w[:3, :3]
    dx = R[0, 0] * xc + R[0, 1] * yc + R[0, 2]
    dy = R[1, 0] * xc + R[1, 1] * yc + R[1, 2]
    dz = R[2, 0] * xc + R[2, 1] * yc + R[2, 2]
    norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    shape = (n_ty * n_tx, tile_h * tile_w)
    dirs = (
        (dx / norm).reshape(shape),
        (dy / norm).reshape(shape),
        (dz / norm).reshape(shape),
    )
    origin = c2w[:3, 3]
    return dirs, origin


def raster_meshes_batched(tri_data, cand, dirs, origin, eps=1e-9, chunk=8):
    """Closest hit for a STACK of per-mesh tile workloads in ONE scan.

    The per-mesh raster scans are overhead-bound (each lax.scan step carries
    fixed bookkeeping on TPU and the per-step tensors are small); stacking
    the k meshes' (tile, candidate) workloads along the tile axis runs one
    scan with k-times-fuller lanes — same math, ~k-times fewer scan steps.

    Args:
      tri_data: [Tm, Kp, 9] gathered (v0, e1, e2) rows, zero where empty.
      cand: [Tm, Kp] face ids (-1 empty); Kp must be a multiple of chunk.
      dirs: ([Tm, P], [Tm, P], [Tm, P]) per-row pixel ray directions.
      origin: shared camera origin [3].
    Returns (is_hit [Tm, P], t, u, v, face [Tm, P]).
    """
    dx, dy, dz = dirs
    ox, oy, oz = (jnp.float32(origin[0]), jnp.float32(origin[1]),
                  jnp.float32(origin[2]))
    T, Kp = cand.shape
    P = dx.shape[1]
    assert Kp % chunk == 0

    def step(carry, inp):
        tri_c, fid_c = inp  # [T, chunk, 9], [T, chunk]
        for j in range(chunk):
            t_best, u_b, v_b, f_b = carry
            tri = tri_c[:, j]
            fid = fid_c[:, j]
            c = lambda j: tri[:, j][:, None]
            v0x, v0y, v0z = c(0), c(1), c(2)
            e1x, e1y, e1z = c(3), c(4), c(5)
            e2x, e2y, e2z = c(6), c(7), c(8)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(
                jnp.abs(det) > eps, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
            )
            tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
            u = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            closer = (
                (fid >= 0)[:, None]
                & (jnp.abs(det) > eps)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > 1e-6)
                & (t < t_best)
            )
            t_best = jnp.where(closer, t, t_best)
            u_b = jnp.where(closer, u, u_b)
            v_b = jnp.where(closer, v, v_b)
            f_b = jnp.where(closer, fid[:, None], f_b)
            carry = (t_best, u_b, v_b, f_b)
        return carry, None

    init = (
        jnp.full((T, P), jnp.inf),
        jnp.zeros((T, P)),
        jnp.zeros((T, P)),
        jnp.full((T, P), -1, jnp.int32),
    )
    tri_chunks = jnp.swapaxes(tri_data.reshape(T, Kp // chunk, chunk, 9), 0, 1)
    fid_chunks = jnp.swapaxes(cand.reshape(T, Kp // chunk, chunk), 0, 1)
    (t_best, u_b, v_b, f_b), _ = jax.lax.scan(step, init, (tri_chunks, fid_chunks))
    is_hit = f_b >= 0
    return is_hit, t_best, u_b, v_b, f_b


def gather_tri_data(tables, cand, chunk=8):
    """Gather per-candidate (v0, e1, e2) rows for raster_meshes_batched,
    padding the candidate axis to a chunk multiple. Returns
    (tri_data [T, Kp, 9], cand_padded [T, Kp])."""
    T, K = cand.shape
    Kp = _pad_to(K, chunk)
    if Kp != K:
        cand = jnp.concatenate(
            [cand, jnp.full((T, Kp - K), -1, cand.dtype)], axis=1
        )
    tri_data = jnp.where(
        (cand >= 0)[..., None], tables["tri"][jnp.maximum(cand, 0)], 0.0
    )
    return tri_data, cand


def raster_mesh(tables, cand, dirs, origin, eps=1e-9, chunk=8):
    """Closest hit of every tile pixel against its candidate triangles
    (single-mesh convenience wrapper over raster_meshes_batched: one gather
    of candidate triangle rows, then the chunked-unrolled scan; the inner
    chunk unroll measures ~4x faster than one triangle per scan step at
    identical math — scan steps carry fixed bookkeeping overhead on TPU).

    Returns (is_hit [T, P], t [T, P], u [T, P], v [T, P], face [T, P]).
    """
    tri_data, cand = gather_tri_data(tables, cand, chunk)
    return raster_meshes_batched(tri_data, cand, dirs, origin, eps, chunk)


def interp_uv(tables, f_b, u_b, v_b):
    """Barycentric UV interpolation at hits: one [*, 6] row gather."""
    uv6 = tables["uv_tri"][jnp.maximum(f_b, 0)]  # [T, P, 6]
    w0 = (1.0 - u_b - v_b)[..., None]
    return (
        w0 * uv6[..., 0:2]
        + u_b[..., None] * uv6[..., 2:4]
        + v_b[..., None] * uv6[..., 4:6]
    )


def tiles_to_image(x, width, height, tile_h=TILE_H, tile_w=TILE_W):
    """[T, P, C] tile-order -> [H, W, C] image (crop padding)."""
    n_tx = _pad_to(width, tile_w) // tile_w
    n_ty = _pad_to(height, tile_h) // tile_h
    C = x.shape[-1]
    img = x.reshape(n_ty, n_tx, tile_h, tile_w, C)
    img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(
        n_ty * tile_h, n_tx * tile_w, C
    )
    return img[:height, :width]
