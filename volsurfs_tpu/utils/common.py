"""Layout converters, color-space transforms and misc numeric helpers
(reference volsurfs_py/utils/common.py, jnp-native)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---- layout converters (reference common.py:6-80) ---------------------------

def nchw2nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc2nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def lin2hwc(x, h, w):
    return x.reshape(h, w, x.shape[-1])


def hwc2lin(x):
    return x.reshape(-1, x.shape[-1])


def lin2nchw(x, h, w):
    return nhwc2nchw(x.reshape(1, h, w, x.shape[-1]))


def img2tex(x):
    return jnp.transpose(x, (0, 2, 3, 1))[0]


def tex2img(x):
    return nhwc2nchw(x[None])


# ---- color spaces (reference common.py:84-93, instant-ngp convention) --------

def srgb_to_linear(img):
    limit = 0.04045
    return jnp.where(
        img > limit, jnp.power((img + 0.055) / 1.055, 2.4), img / 12.92
    )


def linear_to_srgb(img):
    limit = 0.0031308
    return jnp.where(
        img > limit, 1.055 * jnp.power(img, 1.0 / 2.4) - 0.055, 12.92 * img
    )


# ---- smoothsteps / ranges (reference common.py:102-160) ----------------------

def map_range_val(x, in_start, in_end, out_start, out_end):
    from volsurfs_tpu.utils.schedules import map_range_val as _m

    return _m(x, in_start, in_end, out_start, out_end)


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def smootherstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return (t**3) * (t * (t * 6 - 15) + 10)


def smoothstop_n(t, n):
    return 1.0 - (1.0 - t) ** n


def next_power_of_2(x: int) -> int:
    return 1 if x == 0 else 2 ** (int(x) - 1).bit_length()


def previous_power_of_2(n: int) -> int:
    return 1 << (int(n).bit_length() - 1) if n > 0 else 0
