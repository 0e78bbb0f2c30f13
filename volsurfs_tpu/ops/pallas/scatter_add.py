"""Pallas TPU scatter-add for hash-encoding table gradients.

XLA's scatter-add on TPU serializes at ~470ns/update (measured), which makes
hash-table gradients the dominant cost of NeuS/NGP training (~80% of a surf
train step). This kernel keeps each level's gradient table resident in VMEM
in a lane-major layout and applies updates with aligned 128-lane
read-modify-write tiles: per update it loads the [8, 128] tile containing
the target row, adds a one-hot masked update built from SMEM scalars, and
stores it back — no HBM round trip and no unaligned access.

Measured result: ~2.3M updates/s on v5e — PARITY with XLA's scatter, not a
win. The read-modify-write chain through one VMEM tile serializes exactly
like XLA's implementation because consecutive updates may alias. Kept as a
working, tested alternative backend and as the measurement record; the
known paths to an actual win are (a) dense-gradient accumulation for the
coarse hash levels whose reachable cell sets are small and enumerable at
init (one-hot matmuls on the MXU + a tiny scatter), and (b) a bucketed
two-pass variant once updates arrive pre-partitioned. Tracked for the next
round.

Grid is (levels, chunks); the output BlockSpec maps every chunk of a level
to the same block, so the accumulator survives in VMEM across chunks
(revisiting-accumulation pattern) and is flushed to HBM once per level.
Index/update scalars are DMA'd chunk-by-chunk into SMEM (the scalar unit
cannot read arbitrary VMEM lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 8192
LANES = 128


SUBL = 8  # sublane tile: the F axis is padded to a full tile


def _make_kernel(mp: int, F: int):
    def _kernel(idx_hbm, upd_hbm, out_ref, idx_smem, upd_smem, sem0, sem1):
        l = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        start = pl.multiple_of(l * mp + c * CHUNK, CHUNK)
        dma0 = pltpu.make_async_copy(
            idx_hbm.at[pl.ds(start, CHUNK)], idx_smem, sem0
        )
        dma1 = pltpu.make_async_copy(
            upd_hbm.at[pl.ds(start * F, CHUNK * F)], upd_smem, sem1
        )
        dma0.start()
        dma1.start()
        dma0.wait()
        dma1.wait()

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, SUBL, LANES), 2)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, SUBL, LANES), 1)

        def body(i, carry):
            r = idx_smem[i]
            tile0 = pl.multiple_of((r // LANES) * LANES, LANES)
            lane = r % LANES
            # one-hot [1, 8, 128] update tile from SMEM scalars
            vals = jnp.zeros((1, SUBL, LANES), jnp.float32)
            for f in range(F):
                vals = jnp.where(
                    (sub_iota == f) & (lane_iota == lane),
                    upd_smem[i * F + f], vals,
                )
            cur = out_ref[:, :, pl.ds(tile0, LANES)]
            out_ref[:, :, pl.ds(tile0, LANES)] = cur + vals
            return carry

        jax.lax.fori_loop(0, CHUNK, body, 0)

    return _kernel


@functools.partial(jax.jit, static_argnames=("nr_rows",))
def scatter_add_levels(idx, upd, nr_rows: int):
    """Per-level scatter-add: out[l, idx[l, m], :] += upd[l, m, :].

    idx: [L, M] int32 in [0, nr_rows); upd: [L, M, F].
    Returns [L, nr_rows, F] float32. M is padded internally with zero
    updates; nr_rows must be a multiple of 128.
    """
    L, M = idx.shape
    F = upd.shape[-1]
    assert nr_rows % LANES == 0
    Mp = (M + CHUNK - 1) // CHUNK * CHUNK
    if Mp != M:
        idx = jnp.pad(idx, ((0, 0), (0, Mp - M)))
        upd = jnp.pad(upd, ((0, 0), (0, Mp - M), (0, 0)))

    grid = (L, Mp // CHUNK)
    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        _make_kernel(Mp, F),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # idx in HBM -> SMEM DMA
            pl.BlockSpec(memory_space=pltpu.ANY),   # upd in HBM -> SMEM DMA
        ],
        out_specs=pl.BlockSpec((1, SUBL, nr_rows), lambda l, c: (l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((L, SUBL, nr_rows), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((CHUNK,), jnp.int32),
            pltpu.SMEM((CHUNK * F,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(idx.astype(jnp.int32).reshape(-1),
      upd.astype(jnp.float32).reshape(-1))
    return jnp.transpose(out[:, :F, :], (0, 2, 1))
