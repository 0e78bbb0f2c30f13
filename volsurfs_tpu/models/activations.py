"""Activations: truncated exponential with clamped backward.

Reference volsurfs_py/activations/truncated_exp.py:27-43 (instant-ngp style
density activation; the reference currently prefers softplus but keeps this
available)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def truncated_exp(x, threshold: float = 10.0):
    return jnp.exp(x)


def _fwd(x, threshold=10.0):
    return jnp.exp(x), (x, threshold)


def _bwd(res, g):
    x, threshold = res
    # clamp the input in the backward so huge densities don't explode grads
    grad = g * jnp.exp(jnp.clip(x, -threshold, threshold))
    return grad, None


truncated_exp.defvjp(_fwd, _bwd)
