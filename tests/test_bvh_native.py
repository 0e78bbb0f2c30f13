"""Native SAH BVH builder vs Python median-split: identical closest hits."""

import numpy as np
import pytest


def _icosphere(radius=0.5, subdiv=2):
    from volsurfs_tpu.baking.marching import extract_mesh_from_fn

    def sdf(p):
        return np.linalg.norm(p, axis=-1) - radius

    return extract_mesh_from_fn(sdf, resolution=24)


@pytest.fixture(scope="module")
def mesh():
    return _icosphere()


def test_native_builder_available(mesh):
    from volsurfs_tpu.ops.bvh import _build_bvh_native

    v, f = mesh
    bvh = _build_bvh_native(np.asarray(v, np.float32), np.asarray(f), 4)
    assert bvh is not None, "native BVH library failed to build/load"
    n = bvh.node_lo.shape[0]
    skip = np.asarray(bvh.node_skip)
    assert (skip > np.arange(n)).all() and (skip <= n).all()
    tri_id = np.asarray(bvh.tri_id)
    assert sorted(t for t in tri_id if t >= 0) == list(range(f.shape[0]))


def test_native_and_python_traces_agree(mesh):
    import jax.numpy as jnp

    from volsurfs_tpu.ops import bvh as B

    v, f = mesh
    native = B._build_bvh_native(np.asarray(v, np.float32), np.asarray(f), B.LEAF_TRIS)
    assert native is not None

    # force the Python path by rebuilding through the internal fallback:
    # temporarily knock out the native loader
    orig = B._build_bvh_native
    try:
        B._build_bvh_native = lambda *a, **k: None
        python_bvh = B.build_bvh(v, f)
    finally:
        B._build_bvh_native = orig

    rng = np.random.default_rng(1)
    n = 256
    rays_o = np.tile(np.array([[0.0, 0.0, -2.0]], np.float32), (n, 1))
    dirs = np.concatenate(
        [rng.uniform(-0.4, 0.4, (n, 2)), np.ones((n, 1))], axis=1
    ).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    hit_a = B.trace(native, jnp.asarray(rays_o), jnp.asarray(dirs))
    hit_b = B.trace(python_bvh, jnp.asarray(rays_o), jnp.asarray(dirs))

    np.testing.assert_array_equal(
        np.asarray(hit_a["is_hit"]), np.asarray(hit_b["is_hit"])
    )
    np.testing.assert_allclose(
        np.asarray(hit_a["depth"]), np.asarray(hit_b["depth"]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(hit_a["triangles_id"]), np.asarray(hit_b["triangles_id"])
    )


def test_trace_all_matches_per_mesh_trace(mesh):
    import jax.numpy as jnp

    from volsurfs_tpu.ops import bvh as B

    v, f = mesh
    shells = []
    for scale in (0.8, 1.0, 1.2):
        shells.append(B.build_bvh(v * scale, f))
    stacked = B.stack_bvhs(shells)

    rng = np.random.default_rng(7)
    n = 128
    rays_o = np.tile(np.array([[0.0, 0.0, -2.0]], np.float32), (n, 1))
    dirs = np.concatenate(
        [rng.uniform(-0.5, 0.5, (n, 2)), np.ones((n, 1))], axis=1
    ).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays_o, dirs = jnp.asarray(rays_o), jnp.asarray(dirs)

    all_hits = B.trace_all(stacked, rays_o, dirs)
    for i, bvh in enumerate(shells):
        single = B.trace(bvh, rays_o, dirs)
        np.testing.assert_array_equal(
            np.asarray(all_hits["is_hit"][i]), np.asarray(single["is_hit"])
        )
        np.testing.assert_allclose(
            np.asarray(all_hits["depth"][i]), np.asarray(single["depth"]),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(all_hits["triangles_id"][i]),
            np.asarray(single["triangles_id"]),
        )
        np.testing.assert_allclose(
            np.asarray(all_hits["barycentric"][i]),
            np.asarray(single["barycentric"]),
            atol=1e-6,
        )
