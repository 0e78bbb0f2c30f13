"""Small numeric helpers."""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x, axis=-1, keepdims=False, eps: float = 1e-12):
    """L2 norm with a well-defined gradient at 0 (sqrt(0) backward is NaN)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def safe_normalize(x, axis=-1, eps: float = 1e-12):
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)


def small_cumsum(x, axis: int):
    """Unrolled cumulative sum along a tiny static axis (e.g. the nr_surfs
    axis, <= ~9). jnp.cumsum/cumprod lower to reduce-windows that the TPU
    fusion emitter miscompiles in some stop-gradient graphs (CHECK
    window_bounds == strides in fusion_emitter.cc, hit by the offsets
    color-init phase); a static chain of adds is also faster at this size."""
    import jax

    k = x.shape[axis]
    slices = [jax.lax.index_in_dim(x, i, axis, keepdims=True) for i in range(k)]
    acc = slices[0]
    outs = [acc]
    for i in range(1, k):
        acc = acc + slices[i]
        outs.append(acc)
    return jnp.concatenate(outs, axis=axis)


def small_cumprod(x, axis: int):
    """Unrolled cumulative product along a tiny static axis (see
    small_cumsum for why)."""
    import jax

    k = x.shape[axis]
    slices = [jax.lax.index_in_dim(x, i, axis, keepdims=True) for i in range(k)]
    acc = slices[0]
    outs = [acc]
    for i in range(1, k):
        acc = acc * slices[i]
        outs.append(acc)
    return jnp.concatenate(outs, axis=axis)
