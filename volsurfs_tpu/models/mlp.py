"""MLP building blocks: plain GELU MLP and Lipschitz-bounded MLP.

Reference: volsurfs_py/models/mlp.py:8-69 (Linear+GELU stack, optional linear
last layer) and volsurfs_py/models/lipshitz_mlp.py:7-81 (per-layer learnable
Lipschitz bound c_i, rows rescaled by min(1, softplus(c_i)/sum|w_row|),
following arxiv 2202.08345). Widths are small (32-128), which maps cleanly
onto the MXU as [batch, width] x [width, width] matmuls; batch is the ray x
sample axis and is large.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    """Linear + activation stack; last layer optionally linear.

    activation: "gelu" (reference models/mlp.py default) or "relu" (used by
    the tcnn FullyFusedMLP texture networks, reference neural_texture.py:66-72).
    """

    layer_dims: Sequence[int]  # output dims per layer (reference semantics)
    last_layer_linear: bool = True
    use_bias: bool = True
    activation: str = "gelu"
    # computation dtype (params stay f32). bf16 is the TPU-native reading of
    # the reference's fp16 GradScaler training (base_method.py:80-83,
    # trainer.py:262-276): bf16 shares f32's exponent range so no loss
    # scaling is needed. None = float32.
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, tangents=None):
        """x [..., D] -> [..., layer_dims[-1]].

        tangents [K, ..., D]: optionally propagate K jacobian-vector products
        alongside the primal (returns (y, dy [K, ..., out])). The K axis
        LEADS (encoder jacobian convention): a trailing size-3 axis would
        make XLA pad its 128-lane tile 42x on every materialized tangent
        tensor. The tangents ride the SAME Dense submodules as extra batch
        rows (bias is cancelled with a zero row), so the parameter tree is
        unchanged and the extra cost is one wider matmul per layer — this is
        how spatial SDF gradients chain through the MLP without
        re-evaluating the encoder (see encodings._hash_lookup_grad_cm)."""
        act = {"gelu": nn.gelu, "relu": nn.relu}[self.activation]
        dtype = jnp.dtype(self.dtype) if self.dtype is not None else None
        n = len(self.layer_dims)
        if tangents is None:
            for i, dim in enumerate(self.layer_dims):
                x = nn.Dense(
                    dim, use_bias=self.use_bias, dtype=dtype, name=f"dense_{i}"
                )(x)
                is_last = i == n - 1
                if not (is_last and self.last_layer_linear):
                    x = act(x)
            return x if dtype is None else x.astype(jnp.float32)

        t = tangents  # [K, ..., D]
        for i, dim in enumerate(self.layer_dims):
            dense = nn.Dense(
                dim, use_bias=self.use_bias, dtype=dtype, name=f"dense_{i}"
            )
            stacked = jnp.concatenate(
                [x[None], t, jnp.zeros_like(x)[None]], axis=0
            )
            out = dense(stacked)
            z = out[0]
            dz = out[1:-1] - out[-1][None]  # subtract the bias row
            is_last = i == n - 1
            if not (is_last and self.last_layer_linear):
                x, act_deriv = jax.jvp(act, (z,), (jnp.ones_like(z),))
                t = dz * act_deriv[None]
            else:
                x, t = z, dz
        if dtype is not None:
            x = x.astype(jnp.float32)
            t = t.astype(jnp.float32)
        return x, t


class LipshitzMLP(nn.Module):
    """MLP whose per-layer Lipschitz constant is learnable and penalized.

    forward: w_row <- w_row * min(1, softplus(c)/sum|w_row|) before each
    matmul; ``lipshitz_bound_full`` = prod_i softplus(c_i) is the loss term
    (reference models/lipshitz_mlp.py:22-46).
    """

    layer_dims: Sequence[int]
    last_layer_linear: bool = True
    dtype: str | None = None  # computation dtype (see MLP.dtype)

    @nn.compact
    def __call__(self, x):
        dtype = jnp.dtype(self.dtype) if self.dtype is not None else None
        n = len(self.layer_dims)
        for i, dim in enumerate(self.layer_dims):
            in_dim = x.shape[-1]
            w = self.param(
                f"w_{i}", nn.initializers.lecun_uniform(), (in_dim, dim)
            )
            b = self.param(f"b_{i}", nn.initializers.zeros, (dim,))
            c = self.param(
                f"c_{i}",
                lambda key, shape, w=w: jnp.max(jnp.sum(jnp.abs(w), axis=0))
                * 2.0
                * jnp.ones(shape),
                (1,),
            )
            absrowsum = jnp.sum(jnp.abs(w), axis=0)  # per-output-row in torch layout
            scale = jnp.clip(jax.nn.softplus(c) / absrowsum, max=1.0)
            wb = w * scale[None, :]
            if dtype is not None:
                x, wb, b = x.astype(dtype), wb.astype(dtype), b.astype(dtype)
            x = x @ wb + b
            is_last = i == n - 1
            if not (is_last and self.last_layer_linear):
                x = nn.gelu(x)
        return x if dtype is None else x.astype(jnp.float32)

    @staticmethod
    def lipshitz_bound_full(params) -> jnp.ndarray:
        """prod softplus(c_i) over the layers of a LipshitzMLP param subtree."""
        bound = jnp.asarray(1.0)
        for name, value in params.items():
            if name.startswith("c_"):
                bound = bound * jax.nn.softplus(value[0])
        return bound
