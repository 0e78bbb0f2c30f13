"""Small numeric helpers."""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x, axis=-1, keepdims=False, eps: float = 1e-12):
    """L2 norm with a well-defined gradient at 0 (sqrt(0) backward is NaN)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def safe_normalize(x, axis=-1, eps: float = 1e-12):
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)


def take_rev(x, axis: int):
    """Reverse along a tiny static axis via a constant-index gather.

    jnp.flip lowers to an XLA reverse op; on TPU the fusion emitter's
    ReverseInput path can CHECK-fail (fusion_emitter.cc window_bounds ==
    strides) when a reverse feeds certain fused scans — observed
    intermittently on the offsets color-init train-step compile. A gather
    with a static reversed iota never takes that path, and the axes
    reversed here are tiny (nr_surfs <= 9)."""
    k = x.shape[axis]
    idx = jnp.arange(k - 1, -1, -1, dtype=jnp.int32)
    return jnp.take(x, idx, axis=axis)


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
