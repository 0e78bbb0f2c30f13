"""Iso-surface extraction via vectorized marching tetrahedra.

Replaces the reference's skimage.measure.marching_cubes dependency
(reference volsurfs_py/utils/mesh_extraction.py:224-372): the environment
ships no skimage, and marching tetrahedra needs only a 16-case table that is
trivially verifiable. Each grid cube is split into 6 tetrahedra; zero
crossings on tet edges are interpolated and welded exactly by grid-edge key,
so the output mesh is watertight wherever the field is.

Everything is vectorized numpy over all tets at once (the field evaluation
itself runs chunked under jit on device; see extract_mesh_from_fn).
"""

from __future__ import annotations

import numpy as np

# 6 tetrahedra per cube, as corner indices of the cube (0..7, bit order xyz:
# corner c has offset (c&1, (c>>1)&1, (c>>2)&1)). All share the main diagonal
# 0-7 so faces of adjacent tets match.
_CUBE_TETS = np.asarray(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    np.int32,
)

# tet edges as pairs of local vertex ids
_TET_EDGES = np.asarray(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32
)

# triangle table: for each of the 16 sign cases (bit i set = vertex i inside,
# i.e. sdf < 0), the triangles as triples of tet-edge ids (-1 padded, max 2).
# Orientation is fixed afterwards against the field gradient.
_TRI_TABLE = -np.ones((16, 2, 3), np.int64)


def _fill_tri_table():
    # single-vertex cases: one triangle on the three edges touching the vertex
    vertex_edges = {
        0: [0, 1, 2],
        1: [0, 3, 4],
        2: [1, 3, 5],
        3: [2, 4, 5],
    }
    for v, edges in vertex_edges.items():
        _TRI_TABLE[1 << v, 0] = edges  # vertex inside
        case = 15 ^ (1 << v)  # vertex outside, others inside
        _TRI_TABLE[case, 0] = edges[::-1]
    # two-vertex cases: quad on the four crossing edges -> two triangles
    pair_quads = {
        (0, 1): [1, 2, 4, 3],
        (0, 2): [0, 3, 5, 2],
        (0, 3): [0, 4, 5, 1],
        (1, 2): [0, 1, 5, 4],
        (1, 3): [0, 2, 5, 3],
        (2, 3): [1, 3, 4, 2],
    }
    for (a, b), quad in pair_quads.items():
        case = (1 << a) | (1 << b)
        _TRI_TABLE[case, 0] = [quad[0], quad[1], quad[2]]
        _TRI_TABLE[case, 1] = [quad[0], quad[2], quad[3]]
        inv = 15 ^ case
        _TRI_TABLE[inv, 0] = [quad[2], quad[1], quad[0]]
        _TRI_TABLE[inv, 1] = [quad[3], quad[2], quad[0]]


_fill_tri_table()


def marching_tetrahedra(values: np.ndarray, origin, spacing):
    """Extract the zero level set of a dense scalar grid.

    Args:
      values: [nx, ny, nz] float field (sdf-like; negative = inside).
      origin: [3] world position of grid node (0,0,0).
      spacing: [3] world distance between grid nodes.
    Returns:
      (vertices [V, 3] float32, faces [F, 3] int32) with triangle normals
      oriented along the field gradient (outward for an SDF).
    """
    values = np.asarray(values, np.float64)
    nx, ny, nz = values.shape
    origin = np.asarray(origin, np.float64)
    spacing = np.asarray(spacing, np.float64)

    # node linear ids
    def node_id(ix, iy, iz):
        return (ix * ny + iy) * nz + iz

    # cube base coords
    bx, by, bz = np.meshgrid(
        np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1), indexing="ij"
    )
    bx, by, bz = bx.ravel(), by.ravel(), bz.ravel()

    # corner node ids per cube [C, 8]
    corner_ids = np.stack(
        [
            node_id(bx + (c & 1), by + ((c >> 1) & 1), bz + ((c >> 2) & 1))
            for c in range(8)
        ],
        axis=1,
    )
    flat_vals = values.ravel()

    # tets [C*6, 4] node ids
    tets = corner_ids[:, _CUBE_TETS].reshape(-1, 4)
    tet_vals = flat_vals[tets]  # [T, 4]

    inside = tet_vals < 0.0
    case = (
        inside[:, 0].astype(np.int64)
        | (inside[:, 1] << 1)
        | (inside[:, 2] << 2)
        | (inside[:, 3] << 3)
    )
    active = (case != 0) & (case != 15)
    tets = tets[active]
    tet_vals = tet_vals[active]
    case = case[active]
    if tets.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    # gather triangles (edge ids) per active tet
    tris_e = _TRI_TABLE[case]  # [T, 2, 3]
    valid_tri = tris_e[:, :, 0] >= 0  # [T, 2]
    t_idx, tri_idx = np.nonzero(valid_tri)
    tri_edges = tris_e[t_idx, tri_idx]  # [F, 3] edge ids in their tets

    # edge endpoints as global node ids
    ev = _TET_EDGES[tri_edges]  # [F, 3, 2] local vertex ids
    tet_nodes = tets[t_idx]  # [F, 4]
    n0 = np.take_along_axis(tet_nodes, ev[..., 0], axis=1)  # [F, 3]
    n1 = np.take_along_axis(tet_nodes, ev[..., 1], axis=1)

    # weld by undirected grid edge key
    lo = np.minimum(n0, n1)
    hi = np.maximum(n0, n1)
    edge_key = lo.astype(np.int64) * (nx * ny * nz) + hi
    unique_keys, inverse = np.unique(edge_key.ravel(), return_inverse=True)
    faces = inverse.reshape(-1, 3).astype(np.int32)

    # interpolate vertex positions on unique edges
    u_lo = (unique_keys // (nx * ny * nz)).astype(np.int64)
    u_hi = (unique_keys % (nx * ny * nz)).astype(np.int64)
    v_lo = flat_vals[u_lo]
    v_hi = flat_vals[u_hi]
    t = v_lo / np.where(np.abs(v_lo - v_hi) < 1e-12, 1e-12, v_lo - v_hi)
    t = np.clip(t, 0.0, 1.0)

    def node_pos(ids):
        iz = ids % nz
        iy = (ids // nz) % ny
        ix = ids // (nz * ny)
        return origin[None] + np.stack([ix, iy, iz], -1) * spacing[None]

    verts = node_pos(u_lo) + t[:, None] * (node_pos(u_hi) - node_pos(u_lo))

    # drop degenerate faces (edges on the same grid edge)
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[ok]

    # orient triangles along the field gradient (outward for an SDF)
    grad = np.stack(np.gradient(values, *spacing), axis=-1)  # [nx, ny, nz, 3]
    centers = verts[faces].mean(axis=1)
    idx = np.clip(
        np.round((centers - origin) / spacing).astype(np.int64),
        0,
        [nx - 1, ny - 1, nz - 1],
    )
    g = grad[idx[:, 0], idx[:, 1], idx[:, 2]]
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    n = np.cross(e1, e2)
    flip = np.sum(n * g, axis=-1) < 0.0
    faces[flip] = faces[flip][:, [0, 2, 1]]

    return verts.astype(np.float32), faces


def extract_mesh_from_fn(
    sdf_fn,
    resolution: int = 128,
    bounds: float = 1.0,
    chunk: int = 65536,
    level: float = 0.0,
):
    """Evaluate an SDF callable on a dense grid (chunked) and extract the
    ``level`` set (reference utils/mesh_extraction.py:224-372 semantics:
    chunked dense grid eval then marching; level!=0 extracts offset shells).

    Args:
      sdf_fn: [N, 3] -> [N] or [N, 1] field values.
    """
    import numpy as np

    lin = np.linspace(-bounds, bounds, resolution, dtype=np.float32)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    pts = grid.reshape(-1, 3)
    out = []
    for i in range(0, pts.shape[0], chunk):
        v = np.asarray(sdf_fn(pts[i : i + chunk]))
        out.append(v.reshape(-1))
    values = np.concatenate(out).reshape(resolution, resolution, resolution)
    spacing = np.full(3, 2.0 * bounds / (resolution - 1), np.float64)
    origin = np.full(3, -bounds, np.float64)
    return marching_tetrahedra(values - level, origin, spacing)


def post_process_mesh(verts, faces, cluster_to_keep: int = 1000,
                      min_triangles: int = 50):
    """Filter floaters / disconnected parts from an extracted mesh
    (reference utils/mesh_extraction.py:18-47 ``post_process_mesh``:
    cluster connected triangles, keep the ``cluster_to_keep`` largest
    clusters but never clusters below ``min_triangles`` faces, then drop
    unreferenced vertices).

    Connectivity is via shared vertices (a superset of open3d's shared-edge
    clustering; identical for the closed level-set shells the baker
    extracts). Pure numpy union-find.

    Returns (verts', faces') with faces reindexed.
    """
    verts = np.asarray(verts)
    faces = np.asarray(faces, np.int64)
    if len(faces) == 0:
        return verts, faces

    # union-find over vertices
    parent = np.arange(len(verts), dtype=np.int64)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for f in faces:
        ra, rb, rc = find(f[0]), find(f[1]), find(f[2])
        parent[rb] = ra
        parent[rc] = ra
    roots = np.asarray([find(v) for v in faces[:, 0]])

    labels, counts = np.unique(roots, return_counts=True)
    order = np.argsort(-counts)
    if len(order) > cluster_to_keep:
        thresh = counts[order[cluster_to_keep - 1]]
    else:
        thresh = 0
    thresh = max(thresh, min_triangles)
    keep_labels = set(labels[counts >= thresh].tolist())
    if not keep_labels:  # degenerate: everything smaller than min_triangles
        keep_labels = {labels[order[0]]}
    keep = np.asarray([r in keep_labels for r in roots])
    faces = faces[keep]

    used = np.unique(faces)
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces]
