"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from volsurfs_tpu.models.mlp import MLP
from volsurfs_tpu.ops.pallas.fused_mlp import fused_mlp, mlp_params_to_arrays


def test_fused_mlp_matches_flax():
    mlp = MLP((64, 64, 35), last_layer_linear=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1000, 50))
    params = mlp.init(jax.random.PRNGKey(1), x)
    expect = mlp.apply(params, x)

    weights, biases = mlp_params_to_arrays(params["params"])
    got = fused_mlp(x, weights, biases, activation="gelu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)


def test_fused_mlp_relu_and_odd_sizes():
    mlp = MLP((32, 1), last_layer_linear=True, activation="relu")
    x = jax.random.normal(jax.random.PRNGKey(2), (77, 3))
    params = mlp.init(jax.random.PRNGKey(3), x)
    expect = mlp.apply(params, x)
    weights, biases = mlp_params_to_arrays(params["params"])
    got = fused_mlp(x, weights, biases, activation="relu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)


def test_fused_mlp_gradients():
    mlp = MLP((32, 32, 4), last_layer_linear=True)
    x = jax.random.normal(jax.random.PRNGKey(4), (64, 16))
    params = mlp.init(jax.random.PRNGKey(5), x)
    weights, biases = mlp_params_to_arrays(params["params"])

    def loss_pallas(ws):
        return jnp.sum(fused_mlp(x, ws, biases, interpret=True) ** 2)

    def loss_flax(ws):
        p = {"params": {f"dense_{i}": {"kernel": w, "bias": biases[i]}
                        for i, w in enumerate(ws)}}
        return jnp.sum(mlp.apply(p, x) ** 2)

    g_p = jax.grad(loss_pallas)(list(weights))
    g_f = jax.grad(loss_flax)(list(weights))
    for a, b in zip(g_p, g_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4)


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
