"""Fused multi-layer MLP evaluation as a single Pallas TPU kernel.

The tiny field MLPs (32-128 wide, 2-4 layers) are evaluated over very large
sample batches (rays x samples). Under plain XLA each layer's activations
round-trip through HBM; this kernel keeps the whole layer chain in VMEM per
row tile: one grid step loads a [TILE_N, C_in] tile and every (padded) weight
matrix, runs the matmul+activation chain on the MXU, and writes only the
final output — the TPU-native equivalent of tiny-cuda-nn's FullyFusedMLP
(reference models/neural_texture.py:62-86 uses tcnn for exactly this reason).

Feature dimensions are zero-padded to multiples of 128 lanes; zero columns
are inert through matmul and GELU/ReLU (activation(0)=0 feeds 0 forward).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512
LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad2(w, rows: int, cols: int):
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, cols - w.shape[1])))


def _pad1(b, cols: int):
    return jnp.pad(b, (0, cols - b.shape[0]))


def _mlp_kernel(*refs, n_layers: int, activation: str, last_layer_linear: bool):
    x_ref = refs[0]
    w_refs = refs[1 : 1 + n_layers]
    b_refs = refs[1 + n_layers : 1 + 2 * n_layers]
    out_ref = refs[1 + 2 * n_layers]

    act = jax.nn.gelu if activation == "gelu" else jax.nn.relu
    h = x_ref[:]
    for i in range(n_layers):
        h = (
            jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
            + b_refs[i][:]
        )
        is_last = i == n_layers - 1
        if not (is_last and last_layer_linear):
            h = act(h)
    out_ref[:] = h


def _mlp_reference(x, weights, biases, activation, last_layer_linear):
    """Plain-XLA forward used for the custom VJP backward (rematerialized)."""
    act = jax.nn.gelu if activation == "gelu" else jax.nn.relu
    h = x
    n = len(weights)
    for i, (w, b) in enumerate(zip(weights, biases)):
        h = h @ w + b
        if not (i == n - 1 and last_layer_linear):
            h = act(h)
    return h


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def fused_mlp(
    x,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    activation: str = "gelu",
    last_layer_linear: bool = True,
    interpret: bool = False,
):
    """Evaluate an MLP with one fused Pallas kernel (custom VJP: the forward
    runs fused in VMEM, the backward rematerializes through plain XLA —
    Pallas calls have no automatic reverse-mode).

    Args:
      x: [N, C_in] float32.
      weights: list of [C_i, C_{i+1}] matrices; biases matching.
    Returns: [N, C_out] float32.
    """
    return _fused_mlp_forward(
        x, tuple(weights), tuple(biases), activation, last_layer_linear, interpret
    )


def _fused_mlp_fwd(x, weights, biases, activation, last_layer_linear, interpret):
    out = _fused_mlp_forward(
        x, tuple(weights), tuple(biases), activation, last_layer_linear, interpret
    )
    return out, (x, tuple(weights), tuple(biases))


def _fused_mlp_bwd(activation, last_layer_linear, interpret, res, g):
    x, weights, biases = res
    _, vjp = jax.vjp(
        lambda x_, w_, b_: _mlp_reference(x_, w_, b_, activation, last_layer_linear),
        x, list(weights), list(biases),
    )
    dx, dw, db = vjp(g)
    return dx, dw, db


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


@functools.partial(
    jax.jit, static_argnames=("activation", "last_layer_linear", "interpret")
)
def _fused_mlp_forward(
    x,
    weights,
    biases,
    activation: str = "gelu",
    last_layer_linear: bool = True,
    interpret: bool = False,
):
    n_layers = len(weights)
    N, c_in = x.shape
    dims = [c_in] + [w.shape[1] for w in weights]
    padded = [_round_up(d, LANE) for d in dims]
    c_out = weights[-1].shape[1]

    n_pad = _round_up(max(N, 1), TILE_N)
    x_p = jnp.pad(x, ((0, n_pad - N), (0, padded[0] - c_in)))
    w_p = [
        _pad2(w, padded[i], padded[i + 1]) for i, w in enumerate(weights)
    ]
    b_p = [_pad1(b, padded[i + 1]).reshape(1, -1) for i, b in enumerate(biases)]

    grid = (n_pad // TILE_N,)
    in_specs = [
        pl.BlockSpec((TILE_N, padded[0]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for li in range(n_layers):
        in_specs.append(
            pl.BlockSpec(
                (padded[li], padded[li + 1]), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    for li in range(n_layers):
        in_specs.append(
            pl.BlockSpec((1, padded[li + 1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    out_spec = pl.BlockSpec(
        (TILE_N, padded[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _mlp_kernel,
        n_layers=n_layers,
        activation=activation,
        last_layer_linear=last_layer_linear,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, padded[-1]), jnp.float32),
        interpret=interpret,
    )(x_p, *w_p, *b_p)
    return out[:N, :c_out]


def mlp_params_to_arrays(params: dict):
    """Extract (weights, biases) lists from a flax MLP param subtree
    (models/mlp.MLP layout: dense_0..dense_{L-1} with kernel/bias)."""
    weights, biases = [], []
    i = 0
    while f"dense_{i}" in params:
        layer = params[f"dense_{i}"]
        weights.append(layer["kernel"])
        biases.append(layer["bias"])
        i += 1
    return weights, biases
