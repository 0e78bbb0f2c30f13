"""Schedules: map_range, variance/cos-anneal, logistic beta, LR schedule.

Reference math pinned exactly:
- map_range_val (volsurfs_py/utils/common.py:102-107),
- logistic beta = clip(exp(10*variance), 1e-6, 1e6)
  (volsurfs_py/utils/logistic_distribution.py:5-8),
- logistic stdev = pi/(beta*sqrt(3)) (:27-29),
- MultiStepLR gamma 0.3 + linear warmup after the init phase
  (volsurfs_py/methods/base_method.py:70-76, schedulers/warmup.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def map_range_val(x, in_start, in_end, out_start, out_end):
    """Works on Python floats and traced scalars."""
    x = jnp.clip(x, in_start, in_end)
    if in_start >= in_end:
        return jnp.asarray(out_end, jnp.float32)
    return out_start + (out_end - out_start) * (x - in_start) / (in_end - in_start)


def get_logistic_beta_from_variance(variance):
    return jnp.clip(jnp.exp(variance * 10.0), 1e-6, 1e6)


def logistic_distribution_stdev(beta):
    return (np.pi / np.sqrt(3.0)) / beta


def make_lr_schedule(
    base_lr: float,
    milestones,
    gamma: float = 0.3,
    warmup_start_iter: int = 0,
    warmup_iters: int = 0,
):
    """lr(step): linear warmup from warmup_start_iter over warmup_iters, then
    multiplied by gamma at each milestone. Steps before warmup_start_iter
    (e.g. the sphere-init phase, where the reference has no scheduler
    attached) run at base_lr."""
    milestones = jnp.asarray(sorted(milestones), jnp.int32)

    def schedule(step):
        step = jnp.asarray(step)
        decay = gamma ** jnp.sum(step >= milestones)
        if warmup_iters > 0:
            in_warmup = (step >= warmup_start_iter) & (
                step < warmup_start_iter + warmup_iters
            )
            frac = (step - warmup_start_iter) / warmup_iters
            warm = jnp.where(in_warmup, frac, 1.0)
            warm = jnp.where(step < warmup_start_iter, 1.0, warm)
        else:
            warm = 1.0
        return base_lr * warm * decay

    return schedule
