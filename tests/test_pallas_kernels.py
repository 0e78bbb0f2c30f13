"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

def test_pallas_scatter_add_levels_matches_numpy():
    """ops/pallas/scatter_add.py vs numpy add.at (interpret mode on CPU)."""
    import numpy as np
    import jax.numpy as jnp

    from volsurfs_tpu.ops.pallas.scatter_add import scatter_add_levels

    rng = np.random.default_rng(3)
    L, M, T, F = 3, 1500, 512, 2
    idx = rng.integers(0, T, (L, M)).astype(np.int32)
    upd = rng.standard_normal((L, M, F)).astype(np.float32)
    out = np.asarray(scatter_add_levels(jnp.asarray(idx), jnp.asarray(upd), T))
    ref = np.zeros((L, T, F), np.float32)
    for l in range(L):
        np.add.at(ref[l], idx[l], upd[l])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
