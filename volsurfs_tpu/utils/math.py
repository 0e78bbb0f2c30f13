"""Small numeric helpers."""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x, axis=-1, keepdims=False, eps: float = 1e-12):
    """L2 norm with a well-defined gradient at 0 (sqrt(0) backward is NaN)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def safe_normalize(x, axis=-1, eps: float = 1e-12):
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)
