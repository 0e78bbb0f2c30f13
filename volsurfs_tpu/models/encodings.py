"""Input encodings: identity, frequency, spherical harmonics, multires hash.

Replaces the reference's encoder zoo (volsurfs_py/encodings/ +
volsurfs_py/utils/encoder.py:8-45): the CUDA permutohedral-lattice encoding
(vendored submodule, reference volsurfs_py/encodings/permutohash.py) and the
tiny-cuda-nn 3D hash grid (encodings/gridhash.py) both become a pure-JAX
multi-resolution hash encoding whose gathers XLA vectorizes on TPU. A
permutohedral (simplex) variant with 4 taps instead of 8 is provided as
``PermutoEncoder``.

Shared semantics kept exactly:
- coarse-to-fine window t = map_range(iter, 0, nr_iters_c2f, 0.3, 1.0)
  gating the per-level features (reference encodings/permutohash.py:72-77),
- bounding-box rescale of inputs to [0, 1] plus an out-of-bounds mask
  (reference encodings/permutohash.py:79-91),
- concat of the scaled points to the encoded features with the last element
  dropped (reference permutohash.py:28-66: concat_points=True,
  remove_last_element=True).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from volsurfs_tpu.ops.sh import num_sh_coeffs, sh_basis

# large primes for spatial hashing (standard instant-ngp choice)
_PRIMES = (1, 2654435761, 805459861)


def map_range_val(x, in_start, in_end, out_start, out_end):
    """Scalar map_range (reference volsurfs_py/utils/common.py:102-107)."""
    x = jnp.clip(x, in_start, in_end)
    if in_start >= in_end:
        return jnp.asarray(out_end, jnp.float32)
    return out_start + (out_end - out_start) * (x - in_start) / (in_end - in_start)


def c2f_window(t, nr_levels: int):
    """Coarse-to-fine level window: levels activate progressively with t.

    Equivalent role to permuto_enc.Coarse2Fine in the reference: a [L] vector
    in [0, 1] gating per-level features; cosine-eased ramp (BARF-style).
    """
    alpha = t * nr_levels
    idx = jnp.arange(nr_levels, dtype=jnp.float32)
    w = jnp.clip(alpha - idx, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(jnp.pi * w))


def _rescale_to_unit(points, bb_sides):
    """bb-centered points -> [0,1]^d + out-of-bounds mask
    (reference encodings/permutohash.py:79-91)."""
    if bb_sides is None:
        return points, None
    half = jnp.asarray(bb_sides, jnp.float32) / 2.0
    out_of_bounds = jnp.any((points <= -half) | (points >= half), axis=-1)
    unit = (points / half + 1.0) / 2.0
    return unit, out_of_bounds


class IdentityEncoder(nn.Module):
    """Pass-through (reference encodings/identity.py)."""

    input_dim: int = 3

    @property
    def output_dim(self) -> int:
        return self.input_dim

    @nn.compact
    def __call__(self, points, iter_nr=None, with_grads=False):
        if with_grads:
            # K-leading jacobian [3, ..., 3] (shared encoder convention)
            batch = points.shape[:-1]
            eye = jnp.eye(3).reshape((3,) + (1,) * len(batch) + (3,))
            return points, jnp.broadcast_to(eye, (3,) + batch + (3,)), None
        return points, None


class FrequencyEncoder(nn.Module):
    """sin/cos positional encoding (reference encodings/frequency.py:11-52)."""

    input_dim: int = 3
    multires: int = 6
    include_input: bool = True

    @property
    def output_dim(self) -> int:
        return self.input_dim * self.multires * 2 + (
            self.input_dim if self.include_input else 0
        )

    @nn.compact
    def __call__(self, points, iter_nr=None, with_grads=False):
        feats = [points] if self.include_input else []
        for level in range(self.multires):
            freq = 2.0**level
            feats.append(jnp.sin(points * freq))
            feats.append(jnp.cos(points * freq))
        out = jnp.concatenate(feats, axis=-1)
        if not with_grads:
            return out, None
        eye = jnp.eye(3)
        diag = lambda v: v[..., :, None] * eye  # [..., 3, 3]
        dfeats = [diag(jnp.ones_like(points))] if self.include_input else []
        for level in range(self.multires):
            freq = 2.0**level
            dfeats.append(diag(freq * jnp.cos(points * freq)))
            dfeats.append(diag(-freq * jnp.sin(points * freq)))
        # K-leading jacobian (shared encoder convention)
        return out, jnp.moveaxis(jnp.concatenate(dfeats, axis=-2), -1, 0), None


class SHEncoder(nn.Module):
    """Spherical-harmonics direction encoding
    (reference encodings/sphericalharmonics.py:36-160)."""

    degree: int = 3

    @property
    def output_dim(self) -> int:
        return num_sh_coeffs(self.degree)

    @nn.compact
    def __call__(self, dirs, iter_nr=None):
        return sh_basis(dirs, self.degree), None


def _hash_coords(coords, table_size):
    """Spatial hash of lattice coords [..., 3] -> [...] int32 in [0, table_size).

    uint32 arithmetic (the instant-ngp primes exceed int32 range).
    table_size may be a scalar or a per-level array broadcastable to the
    result (per-level table sizing)."""
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (c[..., 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (c[..., 2] * jnp.uint32(_PRIMES[2]))
    return (h % jnp.asarray(table_size, jnp.uint32)).astype(jnp.int32)


# ---- per-level table sizing ---------------------------------------------------
# Coarse levels have enumerably few lattice cells; giving each level only the
# rows it needs (like tiny-cuda-nn / the reference's permutohedral encoding,
# which size each level min(needed, capacity)) shrinks the parameter table and
# makes the coarse levels' gradient accumulation a dense problem: levels with
# at most _DENSE_ACCUM_MAX_ROWS rows accumulate gradients with a one-hot
# matmul on the MXU instead (see _segment_sum_matmul / _table_grad_accumulate).
# Cutoff measured on v5e (scripts/bench_accum.py, 49152x24x4 updates):
# all-scatter 120 ms, 2048 -> 111 ms, 8192 -> 141 ms, 32768 -> 195 ms — the
# one-hot scan only beats the scatter while the dense row count stays ~3k.
_DENSE_ACCUM_MAX_ROWS = 2048


def _next_pow2(n: int) -> int:
    return 1 << max(0, int(n - 1)).bit_length()


def _level_layout(sizes):
    """sizes: per-level row counts (non-decreasing). Returns
    (offsets [L] np.int32, total_rows, nr_dense_levels, dense_rows) where the
    dense prefix is every level with <= _DENSE_ACCUM_MAX_ROWS rows."""
    sizes = list(int(s) for s in sizes)
    offsets = np.concatenate([[0], np.cumsum(sizes)])[:-1].astype(np.int32)
    k = 0
    while k < len(sizes) and sizes[k] <= _DENSE_ACCUM_MAX_ROWS:
        k += 1
    return offsets, int(np.sum(sizes)), k, int(np.sum(sizes[:k]))


class HashGridEncoder(nn.Module):
    """Multi-resolution trilinear hash-grid encoding (instant-ngp style).

    TPU-native stand-in for both the permutohedral encoding and the tcnn 3D
    hash grid used by the reference. Capacity/levels/features follow the
    reference defaults (24 levels, 2 features, 2^18 capacity —
    reference encodings/permutohash.py:12-20); per-level resolutions are
    geometrically spaced like the reference's geomspace scale list.
    """

    input_dim: int = 3
    nr_levels: int = 24
    log2_hashmap_size: int = 18
    nr_feat_per_level: int = 2
    coarsest_res: float = 4.0
    finest_res: float = 4096.0
    nr_iters_for_c2f: int = 0
    concat_points: bool = True
    remove_last_element: bool = True
    bb_sides: float | Sequence[float] | None = 2.0

    @property
    def output_dim(self) -> int:
        d = self.nr_levels * self.nr_feat_per_level
        if self.concat_points:
            d += self.input_dim
        if self.remove_last_element:
            d -= 1
        return d

    def _resolutions(self):
        return np.geomspace(self.coarsest_res, self.finest_res, self.nr_levels)

    def _level_sizes(self):
        """Per-level (rows, direct_side): collision-free direct indexing when
        the level's full corner grid fits the capacity (tiny-cuda-nn's rule),
        the hashed capacity otherwise. direct_side == 0 marks hashed levels."""
        T = 2**self.log2_hashmap_size
        sizes, direct = [], []
        for r in self._resolutions():
            side = int(np.floor(r)) + 2  # corner coords span [0, floor(r)+1]
            if side**3 <= T:
                sizes.append(side**3)
                direct.append(side)
            else:
                sizes.append(T)
                direct.append(0)
        return sizes, direct

    @nn.compact
    def __call__(self, points, iter_nr=None, with_grads=False):
        """points [..., 3] in the bb -> ([..., output_dim], out_of_bounds [...]),
        or with_grads=True -> (feats, dfeats/dpoints [3, ..., output_dim], oob)
        — the jacobian is K-LEADING (spatial dim first, shared encoder
        convention) and computed analytically from the same gathered corners
        (one accumulation in the backward; see _hash_lookup_grad)."""
        assert points.shape[-1] == self.input_dim == 3
        L, F = self.nr_levels, self.nr_feat_per_level
        sizes, direct = self._level_sizes()
        offsets, total_rows, nr_dense, dense_rows = _level_layout(sizes)
        layout = (nr_dense, dense_rows, tuple(int(s) for s in sizes))

        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(key, shape, minval=-1e-4, maxval=1e-4),
            (total_rows, F),
        )

        unit, out_of_bounds = _rescale_to_unit(points, self.bb_sides)
        if self.bb_sides is None:
            dunit_dp = jnp.ones((3,), jnp.float32)
        else:
            half = jnp.broadcast_to(
                jnp.asarray(self.bb_sides, jnp.float32) / 2.0, (3,)
            )
            dunit_dp = 1.0 / (2.0 * half)  # [3]

        # c2f window (reference permutohash.py:72-77)
        if iter_nr is None:
            t = jnp.asarray(1.0)
        else:
            t = map_range_val(
                jnp.asarray(iter_nr, jnp.float32), 0.0, float(self.nr_iters_for_c2f), 0.3, 1.0
            )
        window = c2f_window(t, L)  # [L]

        res = jnp.asarray(self._resolutions(), jnp.float32)  # [L]
        batch_shape = unit.shape[:-1]
        p = unit.reshape(-1, 3)  # [N, 3]

        # [N, L, 3] scaled coords per level
        scaled = p[:, None, :] * res[None, :, None]
        floor = jnp.floor(scaled)
        frac = scaled - floor
        floor = floor.astype(jnp.int32)

        # 8 trilinear corners, fetched with one fused lookup (single gather;
        # custom VJP emits one accumulation — see _hash_lookup)
        level_off = jnp.asarray(offsets, jnp.int32)[None, :]
        sizes_arr = jnp.asarray(sizes, jnp.int32)[None, :]  # [1, L]
        direct_side = jnp.asarray(direct, jnp.int32)[None, :]  # [1, L], 0=hashed
        corner_idx, corner_w, corner_dw = [], [], []
        for corner in range(8):
            offset = jnp.asarray(
                [(corner >> 0) & 1, (corner >> 1) & 1, (corner >> 2) & 1],
                jnp.int32,
            )
            c = floor + offset[None, None, :]
            hashed = _hash_coords(c, sizes_arr)  # [N, L]
            # direct levels: collision-free linear index (clamp keeps
            # out-of-bounds points — masked downstream — in range)
            cd = jnp.clip(
                c, 0, jnp.maximum(direct_side, 1)[..., None] - 1
            )
            lin = cd[..., 0] + direct_side * (
                cd[..., 1] + direct_side * cd[..., 2]
            )
            corner_idx.append(
                jnp.where(direct_side > 0, lin, hashed) + level_off
            )  # [N, L]
            terms = jnp.where(offset[None, None, :] == 1, frac, 1.0 - frac)
            corner_w.append(jnp.prod(terms, axis=-1))
            if with_grads:
                # d w_c / d p_k = sign_k * prod_{d != k} t_d * res_l * dunit_k
                sign = jnp.where(offset == 1, 1.0, -1.0)  # [3]
                pe = jnp.stack(
                    [
                        terms[..., 1] * terms[..., 2],
                        terms[..., 0] * terms[..., 2],
                        terms[..., 0] * terms[..., 1],
                    ],
                    axis=-1,
                )  # [N, L, 3]
                corner_dw.append(
                    sign[None, None, :] * pe
                    * res[None, :, None] * dunit_dp[None, None, :]
                )
        flat_idx = jnp.stack(corner_idx, axis=-1)  # [N, L, 8]
        weights = jnp.stack(corner_w, axis=-1)  # [N, L, 8]

        if not with_grads:
            feats = _hash_lookup(layout, table, flat_idx, weights)
            feats = feats * window[None, :, None]
            feats = feats.reshape(*batch_shape, L * F)
            if self.concat_points:
                feats = jnp.concatenate([feats, unit], axis=-1)
            if self.remove_last_element:
                feats = feats[..., :-1]
            return feats, out_of_bounds

        dweights = jnp.stack(corner_dw, axis=-2)  # [N, L, 8, 3]
        feats, dfeats = _hash_lookup_grad(layout, table, flat_idx, weights, dweights)
        feats = feats * window[None, :, None]
        dfeats = dfeats * window[None, :, None, None]
        feats = feats.reshape(*batch_shape, L * F)
        dfeats = dfeats.reshape(*batch_shape, L * F, 3)
        if self.concat_points:
            feats = jnp.concatenate([feats, unit], axis=-1)
            dunit = jnp.broadcast_to(
                jnp.diag(dunit_dp), batch_shape + (3, 3)
            )
            dfeats = jnp.concatenate([dfeats, dunit], axis=-2)
        if self.remove_last_element:
            feats = feats[..., :-1]
            dfeats = dfeats[..., :-1, :]
        # K-leading jacobian (shared encoder convention; see PermutoEncoder)
        return feats, jnp.moveaxis(dfeats, -1, 0), out_of_bounds


# ---- table-gradient scatter --------------------------------------------------
# Mode switch for the hash-table gradient accumulation (the dominant
# train-step cost on TPU; scripts/bench_scatter.py):
#   "flat"   — one scalar-flat scatter-add with duplicate indices
#   "sorted" — sort updates by row, collapse each duplicate run with an
#              associative-scan cumsum, then TWO unique-index scatters
#              (run ends get +inclusive-cumsum, run starts get -exclusive);
#              unique indices let XLA vectorize the scatter instead of
#              serializing over duplicates.
#   "mxu"    — [hi, lane]-factorized one-hot segment-sum on the MXU
#              (split-bf16 two-pass: f32-exact to ~4e-6 rel); see
#              _segment_sum_hi_lane
#   "mxu_bf16" — same with single-pass bf16 update values (~2x faster;
#              per-update rel err ~2e-3 — below minibatch gradient noise;
#              same family norm as tcnn's fp16 gradient atomics)
# Default mxu_bf16 (surf step 348 -> 225 ms; convergence PSNR verified
# unchanged on-chip, see RESULTS.md). Override with the
# VOLSURFS_TABLE_GRAD_MODE env var or set_table_grad_mode().
_TABLE_GRAD_MODE = os.environ.get("VOLSURFS_TABLE_GRAD_MODE", "mxu_bf16")


def set_table_grad_mode(mode: str):
    """Switch the table-gradient scatter formulation.

    The mode is read at TRACE time, so already-jitted train steps would
    silently keep their old mode; changing the mode therefore clears the
    jit caches to force a retrace of every compiled function."""
    global _TABLE_GRAD_MODE
    # zero = profiling ablation; cplx = F=2 features packed into one
    # complex64 update each (XLA's TPU scatter cost is per-update, so
    # packing halves it)
    assert mode in ("flat", "sorted", "zero", "cplx", "mxu", "mxu_bf16"), mode
    if mode != _TABLE_GRAD_MODE:
        _TABLE_GRAD_MODE = mode
        jax.clear_caches()


def _segment_sum_hi_lane(idx, upd_fs, nr_rows: int, single_pass: bool):
    """Segment-sum per-level table updates on the MXU via the [hi, lane]
    row factorization: row r lives at (hi = r // 128, lane = r % 128) of a
    [ceil(T/128), 128] accumulator per feature.

    Each update's value is routed to its lane by a compare-generated one-hot
    V [chunk, 128*F] (cheap VPU work), then summed over hi with a one-hot
    matmul [HI, chunk] @ [chunk, 128*F]. Per-update cost is T*F MACs on the
    MXU — measured 89 TFLOP/s bf16 on v5e (scripts/bench_mxu_scatter.py) —
    instead of a serialized scalar scatter (~28M row-upd/s ceiling in every
    XLA formulation: plain, pre-sorted, and unique-index scatters all
    measure the same). At the surf-step shape (196k updates/level, 2^18
    rows) this measures 45.8M row-upd/s split / ~84M single-pass bf16.

    The lane axis absorbs a 128x factor of the table for free, which is why
    this one formulation replaces BOTH the old dense coarse-level matmul
    (tiny HI -> near-free) and the fine-level scalar-flat scatters.

    idx [M] absolute rows in [0, nr_rows); upd_fs: tuple of F arrays [M]
    (separate per-feature 1-D arrays — stacking to [M, F] would materialize
    a minor-2 tensor). Returns [nr_rows, F] f32.
    """
    M = idx.shape[0]
    F = len(upd_fs)
    dtype = upd_fs[0].dtype
    LANEW = 128
    HI = -(-nr_rows // LANEW)
    chunk = 4096 if HI >= 1024 else 8192
    chunk = min(chunk, _next_pow2(M))
    pad = (-M) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        upd_fs = [jnp.concatenate([u, jnp.zeros((pad,), dtype)]) for u in upd_fs]
        M = M + pad
    nch = M // chunk
    hi = (idx // LANEW).astype(jnp.int32).reshape(nch, chunk)
    lane = (idx % LANEW).astype(jnp.int32).reshape(nch, chunk)
    upd_c = tuple(u.astype(jnp.float32).reshape(nch, chunk) for u in upd_fs)
    rows = jnp.arange(HI, dtype=jnp.int32)
    lane_iota = jnp.arange(LANEW, dtype=jnp.int32)

    def body(acc, xs):
        h, l = xs[0], xs[1]
        vs = xs[2:]
        onehot = (rows[:, None] == h[None, :]).astype(jnp.bfloat16)  # [HI, chunk]
        sel = l[:, None] == lane_iota[None, :]  # [chunk, LANEW]
        V = jnp.concatenate(
            [jnp.where(sel, v[:, None], 0.0) for v in vs], axis=1
        )  # [chunk, LANEW*F]
        if single_pass:
            d = jax.lax.dot(
                onehot, V.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            # split-bf16: V = vh + vl to ~2^-17 relative; each dot is exact
            # bf16xbf16->f32 on the MXU. The barrier on vh is LOAD-BEARING:
            # without it XLA folds the f32->bf16->f32 convert chain to the
            # identity, so vl simplifies to V - V = 0 and the result
            # silently degrades to single-pass bf16 (measured: bit-identical
            # to single_pass=True; with the barrier, 2.3e-6 max rel err).
            vh = jax.lax.optimization_barrier(V.astype(jnp.bfloat16))
            vl = (V - vh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = jax.lax.dot(onehot, vh, preferred_element_type=jnp.float32)
            d = d + jax.lax.dot(onehot, vl, preferred_element_type=jnp.float32)
        return acc + d, None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((HI, LANEW * F), jnp.float32), (hi, lane) + upd_c
    )
    out = jnp.stack(
        [acc[:, f * LANEW:(f + 1) * LANEW].reshape(-1) for f in range(F)], -1
    )
    return out[:nr_rows].astype(dtype)


def _segment_sum_matmul(idx, upd, nr_rows: int):
    """Segment-sum upd [M, F] by idx [M] into [nr_rows, F] via one-hot
    matmuls on the MXU (chunked over M so the one-hot stays ~16 MB).

    The dense-accumulation path for coarse hash levels: their scatter-adds
    are duplicate-heavy (many samples per cell) which serializes the XLA
    scatter, while as a matmul the duplicates are just a longer contraction.
    Exact: one-hot entries are 0/1, so products are exact; HIGHEST precision
    keeps f32 accumulation off the bf16 MXU path."""
    M, F = upd.shape
    dtype = upd.dtype
    chunk = min(_next_pow2(M), max(512, _next_pow2((1 << 22) // max(nr_rows, 1))))
    pad = (-M) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        upd = jnp.concatenate([upd, jnp.zeros((pad, F), dtype)])
    idx = idx.reshape(-1, chunk)
    upd = upd.reshape(-1, chunk, F)
    rows = jnp.arange(nr_rows, dtype=idx.dtype)

    def body(acc, xs):
        i, u = xs
        onehot = (rows[:, None] == i[None, :]).astype(dtype)  # [nr_rows, chunk]
        return (
            acc
            + jax.lax.dot(onehot, u, precision=jax.lax.Precision.HIGHEST)
        ), None

    acc, _ = jax.lax.scan(body, jnp.zeros((nr_rows, F), dtype), (idx, upd))
    return acc


def _table_grad_accumulate(flat_idx, upd, layout, total_rows: int, dtype):
    """Table cotangent: dense one-hot matmul for the coarse-level prefix,
    flat scatter for the fine levels.

    flat_idx [N, L, C] absolute rows; upd [N, L, C, F];
    layout = (nr_dense_levels, dense_rows) — static per-encoder constants
    from _level_layout. Levels are laid out coarse-to-fine, so the dense
    levels' rows are exactly [0, dense_rows)."""
    F = upd.shape[-1]
    if _TABLE_GRAD_MODE == "zero":
        return jnp.zeros((total_rows, F), dtype) + 0.0 * upd.reshape(-1, F)[0]
    if _TABLE_GRAD_MODE in ("mxu", "mxu_bf16") and len(layout) > 2:
        sizes = layout[2]
        single = _TABLE_GRAD_MODE == "mxu_bf16"
        off = 0
        parts = []
        for lvl, rows in enumerate(sizes):
            rows = int(rows)
            idx_l = flat_idx[:, lvl].reshape(-1) - off
            upd_l = tuple(upd[:, lvl, :, f].reshape(-1) for f in range(F))
            parts.append(_segment_sum_hi_lane(idx_l, upd_l, rows, single))
            off += rows
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    k, dense_rows = layout[0], layout[1]
    if k <= 0 or dense_rows <= 0:
        return _table_grad_scatter(
            flat_idx.reshape(-1), upd.reshape(-1, F), total_rows, dtype
        )
    d_dense = _segment_sum_matmul(
        flat_idx[:, :k].reshape(-1), upd[:, :k].reshape(-1, F), dense_rows
    )
    if k >= flat_idx.shape[1]:
        return d_dense
    d_fine = _table_grad_scatter(
        flat_idx[:, k:].reshape(-1) - dense_rows,
        upd[:, k:].reshape(-1, F),
        total_rows - dense_rows,
        dtype,
    )
    return jnp.concatenate([d_dense.astype(dtype), d_fine], axis=0)


def _table_grad_scatter(rows, upd, table_rows: int, dtype):
    """Accumulate upd [M, F] into rows [M] of a zero [table_rows, F] table."""
    F = upd.shape[-1]
    if _TABLE_GRAD_MODE == "zero":
        # ablation for profiling: costs of everything EXCEPT the scatter
        return jnp.zeros((table_rows, F), dtype) + 0.0 * upd[0]
    if _TABLE_GRAD_MODE == "sorted":
        order = jnp.argsort(rows)
        r = rows[order]
        us = upd[order]
        # associative_scan, not jnp.cumsum: the reduce-window lowering of
        # cumsum trips the TPU fusion emitter (see ops/volume_rendering)
        csum = jax.lax.associative_scan(jnp.add, us, axis=0)
        excl = csum - us
        boundary = r[1:] != r[:-1]
        is_end = jnp.concatenate([boundary, jnp.ones((1,), bool)])
        is_start = jnp.concatenate([jnp.ones((1,), bool), boundary])
        # non-boundary entries land in DISTINCT padding rows (sliced off
        # below) so unique_indices=True is honest
        pad = table_rows + jnp.arange(r.shape[0], dtype=rows.dtype)
        d = jnp.zeros((table_rows + r.shape[0], F), dtype)
        d = d.at[jnp.where(is_end, r, pad)].add(csum, unique_indices=True)
        d = d.at[jnp.where(is_start, r, pad)].add(-excl, unique_indices=True)
        return d[:table_rows]
    if _TABLE_GRAD_MODE == "cplx" and F == 2:
        # pack the two features into one complex update each: the XLA TPU
        # scatter serializes per UPDATE (not per byte), so this halves it
        cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        rdtype = jnp.float64 if dtype == jnp.float64 else jnp.float32
        u = upd.astype(rdtype)
        z = jax.lax.complex(u[:, 0], u[:, 1])
        acc = jnp.zeros((table_rows,), cdtype).at[rows].add(z)
        return jnp.stack([jnp.real(acc), jnp.imag(acc)], axis=-1).astype(dtype)
    # scalar-flat scatter: one 1-D scatter of M*F scalars instead of M rows
    # of F — measures 3x faster on v5e than the row form
    # (scripts/bench_scatter.py: 34 vs 11.5 M row-updates/s)
    i2 = (rows[:, None] * F + jnp.arange(F, dtype=rows.dtype)[None, :]).reshape(-1)
    return (
        jnp.zeros((table_rows * F,), dtype).at[i2].add(upd.reshape(-1)).reshape(
            table_rows, F
        )
    )



def _gather_levels(flat_table, flat_idx, layout):
    """[R, F] concatenated table + [N, L, C] absolute rows -> [N, L, C, F].

    One flat gather. Measured dead end (v5e, surf step ablation): splitting
    this into L per-level gathers from each level's own [T_l, F] slice —
    motivated by the small-table gather rates in RESULTS.md — made the
    no-scatter step 45 ms SLOWER (223 -> 268 ms): at ~200k rows per level
    the per-gather op overhead dominates, and XLA handles the one big
    row-pair gather better than the microbench big-table rates suggested."""
    return flat_table[flat_idx]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hash_lookup(layout, flat_table, flat_idx, bary):
    """Fused multi-level multi-corner hash-table lookup.

    layout: static (nr_dense_levels, dense_rows[, per-level sizes]) from
    _level_layout. flat_table [R, F] concatenated per-level tables;
    flat_idx [N, L, C] absolute rows; bary [N, L, C].
    Returns feats [N, L, F] = sum_c bary_c * table[idx_c].

    custom_vjp so the backward is exactly ONE accumulation over all
    (point, level, corner) updates — a dense one-hot matmul for the coarse
    levels plus one scatter-add for the fine levels: the autodiff transpose
    of the per-level vmapped gather emits a per-level scatter pattern that
    measures ~8x slower on TPU.
    """
    g = _gather_levels(flat_table, flat_idx, layout)  # [N, L, C, F]
    return jnp.sum(bary[..., None] * g, axis=2)


def _hash_lookup_fwd(layout, flat_table, flat_idx, bary):
    g = _gather_levels(flat_table, flat_idx, layout)
    feats = jnp.sum(bary[..., None] * g, axis=2)
    return feats, (g, flat_idx, bary, flat_table.shape)


def _hash_lookup_bwd(layout, res, dout):
    g, flat_idx, bary, table_shape = res
    # dout [N, L, F]
    d_bary = jnp.sum(g * dout[:, :, None, :], axis=-1)  # [N, L, C]
    upd = bary[..., None] * dout[:, :, None, :]  # [N, L, C, F]
    d_table = _table_grad_accumulate(
        flat_idx, upd, layout, table_shape[0], dout.dtype
    )
    return d_table, None, d_bary


_hash_lookup.defvjp(_hash_lookup_fwd, _hash_lookup_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hash_lookup_grad(layout, flat_table, flat_idx, bary, dbary):
    """Fused lookup returning features AND their spatial jacobian from ONE
    gather set.

    layout: static (nr_dense_levels, dense_rows[, per-level sizes]) from
    _level_layout. flat_table [R, F]; flat_idx [N, L, C]; bary [N, L, C]
    interpolation weights; dbary [N, L, C, 3] their analytic spatial
    derivatives. Returns (feats [N, L, F], dfeats [N, L, F, 3]).

    The TPU-native replacement for the reference's 4-point finite-difference
    field gradients (volsurfs_py/utils/fields_utils.py:6-80): both outputs
    share the gathered corner rows, and the custom VJP merges the feature
    and jacobian cotangents into ONE accumulation — table-gradient scatter
    traffic (the dominant train-step cost on TPU; scripts/bench_scatter.py)
    drops ~5x vs differentiating 4 separate evaluations.
    """
    g = _gather_levels(flat_table, flat_idx, layout)  # [N, L, C, F]
    feats = jnp.sum(bary[..., None] * g, axis=2)
    dfeats = jnp.einsum("nlck,nlcf->nlfk", dbary, g)
    return feats, dfeats


def _hash_lookup_grad_fwd(layout, flat_table, flat_idx, bary, dbary):
    g = _gather_levels(flat_table, flat_idx, layout)
    feats = jnp.sum(bary[..., None] * g, axis=2)
    dfeats = jnp.einsum("nlck,nlcf->nlfk", dbary, g)
    return (feats, dfeats), (g, flat_idx, bary, dbary, flat_table.shape)


def _hash_lookup_grad_bwd(layout, res, cots):
    g, flat_idx, bary, dbary, table_shape = res
    gf, gd = cots  # [N, L, F], [N, L, F, 3]
    # corner-row cotangent from BOTH outputs, one accumulation
    cot_g = bary[..., None] * gf[:, :, None, :] + jnp.einsum(
        "nlck,nlfk->nlcf", dbary, gd
    )  # [N, L, C, F]
    d_bary = jnp.sum(g * gf[:, :, None, :], axis=-1)
    d_dbary = jnp.einsum("nlcf,nlfk->nlck", g, gd)
    d_table = _table_grad_accumulate(
        flat_idx, cot_g, layout, table_shape[0], gf.dtype
    )
    return d_table, None, d_bary, d_dbary


_hash_lookup_grad.defvjp(_hash_lookup_grad_fwd, _hash_lookup_grad_bwd)


# ---- corner-major fused lookup (2-D, layout-safe) ----------------------------
# The [N, L, C(, F|3)] tensor shapes of the lookup above make XLA:TPU tile
# the two MINOR axes to (sublane, 128): a trailing dim of 2/3/4 pads 32-64x,
# so every materialized intermediate costs 32-64x its true HBM footprint and
# VPU work (measured: the surf eval graph at 2048 rays OOMs on 18 GB of HLO
# temps that hold 544 MB of data — f32[N,24,4,3] "T(4,128)" = 42.7x padding).
# The _cm ("corner-major") formulation below keeps EVERY tensor 2-D and
# N-major — [N, C*L] with corner-c/level-l at column c*L + l — so the lane
# axis is always a wide fused dimension. Small static axes (corners,
# features, spatial dims) become Python loops over column slices, and the
# only reshapes are exact 0/1 matmuls (interleave/deinterleave), which stay
# on the MXU instead of forcing a relayout.


def _interleave_mats(L: int, F: int):
    """S_f [L, L*F] one-hot scatter mats: column l*F+f <- part_f column l."""
    mats = []
    for f in range(F):
        S = np.zeros((L, L * F), np.float32)
        S[np.arange(L), np.arange(L) * F + f] = 1.0
        mats.append(jnp.asarray(S))
    return mats


def _interleave_lf(parts):
    """F tensors [N, L] -> [N, L*F] with column l*F+f (the same l-major,
    f-minor order the [N, L, F].reshape(N, L*F) of the legacy path used, so
    downstream MLP weights keep their meaning)."""
    L = parts[0].shape[-1]
    F = len(parts)
    if F == 1:
        return parts[0]
    mats = _interleave_mats(L, F)
    out = jnp.dot(parts[0], mats[0], preferred_element_type=jnp.float32)
    for f in range(1, F):
        out = out + jnp.dot(parts[f], mats[f], preferred_element_type=jnp.float32)
    return out


def _deinterleave_lf(x, L: int, F: int):
    """[N, L*F] -> F tensors [N, L] (transpose of _interleave_lf)."""
    if F == 1:
        return [x]
    mats = _interleave_mats(L, F)
    return [
        jnp.dot(x, m.T, preferred_element_type=jnp.float32) for m in mats
    ]


def _tile_c(x, C: int):
    """[N, L] -> [N, C*L]: the per-level tensor repeated for every corner."""
    return jnp.tile(x, (1, C))


def _cm_gathers(flat_table, idx_cat, F: int):
    """Row gather + per-feature column split: F tensors [N, C*L].

    One [R, F]-row gather per lookup — TPU random-gather cost is per
    ACCESS, not per byte, so one F-wide row access beats F scalar
    gathers. Measured at the real shape (N=49152, C*L=96, R=3.95M rows,
    /tmp/bench_cm_gather.py on v5e): row gather 21 ms vs 68 ms for two
    1-D scalar gathers vs 103 ms for a complex64-packed gather (complex
    lowering is bad on TPU, like the round-3 cplx scatter). The gather
    result feeds straight into 2-D [N, C*L] slices, which XLA lays out
    fine — the 42x padding pathology was specific to the einsum/conv
    consumption of the legacy [N, L, C, F] form."""
    g = flat_table[idx_cat]  # [N, C*L, F]
    return [g[..., f] for f in range(F)]


def _cm_feats(gs, bary, L: int, C: int):
    """feats parts: per feature f, sum_c bary[:, cL:(c+1)L] * g_f[...]."""
    parts = []
    for g_f in gs:
        wg = bary * g_f
        acc = wg[:, :L]
        for c in range(1, C):
            acc = acc + wg[:, c * L : (c + 1) * L]
        parts.append(acc)
    return parts


def _segment_sum_matmul_parts(idx, upd_fs, nr_rows: int):
    """_segment_sum_matmul with the F update features passed as separate
    1-D arrays (stacking them to [M, F] up front would materialize a
    minor-(M, F) tensor; here only [chunk, F] slices exist inside the scan)."""
    M = idx.shape[0]
    F = len(upd_fs)
    dtype = upd_fs[0].dtype
    chunk = min(_next_pow2(M), max(512, _next_pow2((1 << 22) // max(nr_rows, 1))))
    pad = (-M) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        upd_fs = [
            jnp.concatenate([u, jnp.zeros((pad,), dtype)]) for u in upd_fs
        ]
    idx = idx.reshape(-1, chunk)
    upd_fs = tuple(u.reshape(-1, chunk) for u in upd_fs)
    rows = jnp.arange(nr_rows, dtype=idx.dtype)

    def body(acc, xs):
        i = xs[0]  # [chunk]
        u = jnp.stack(xs[1:], axis=-1)  # [chunk, F] — chunk-sized only
        onehot = (rows[:, None] == i[None, :]).astype(dtype)
        return (
            acc + jax.lax.dot(onehot, u, precision=jax.lax.Precision.HIGHEST)
        ), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((nr_rows, F), dtype), (idx,) + upd_fs
    )
    return acc


def _table_grad_accumulate_cm(meta, idx_cat, upd_fs, total_rows: int, dtype):
    """Corner-major table cotangent: idx_cat [N, C*L] absolute rows,
    upd_fs F tensors [N, C*L]. Dense one-hot matmul for the coarse-level
    prefix (levels are the L axis of each corner block; the dense prefix is
    columns c*L..c*L+k of every corner), then ONE scalar-flat scatter PER
    FINE LEVEL into that level's own [size_l * F] block: XLA's TPU scatter
    runs ~1.5x faster against <= 2^18-row tables than against the 3.7M-row
    concatenation (74.6 vs 49.7 M row-updates/s at the real 2.75M-update
    shape, /tmp/bench_cm_scatter.py on v5e; a [M, 2] row scatter is 2x
    slower than scalar-flat in both regimes). Returns [total_rows, F]."""
    k, dense_rows, L, C, F = meta[:5]
    sizes = meta[5] if len(meta) > 5 else None
    if _TABLE_GRAD_MODE == "zero":
        return jnp.zeros((total_rows, F), dtype) + 0.0 * upd_fs[0][0, 0]

    if _TABLE_GRAD_MODE in ("mxu", "mxu_bf16") and sizes is not None:
        # one uniform MXU formulation for every level (coarse levels have
        # tiny HI so their one-hot matmuls are near-free — this replaces
        # both the dense prefix and the fine-level scatters)
        single = _TABLE_GRAD_MODE == "mxu_bf16"

        def take_l(lvl, x):
            return jnp.concatenate(
                [x[:, c * L + lvl : c * L + lvl + 1] for c in range(C)], axis=1
            ).reshape(-1)

        off = 0
        parts = []
        for lvl in range(L):
            rows = int(sizes[lvl])
            idx_l = take_l(lvl, idx_cat) - off
            upd_l = tuple(take_l(lvl, u) for u in upd_fs)
            parts.append(
                _segment_sum_hi_lane(idx_l, upd_l, rows, single).astype(dtype)
            )
            off += rows
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def take(cols_lo, cols_hi, x):
        return jnp.concatenate(
            [x[:, c * L + cols_lo : c * L + cols_hi] for c in range(C)], axis=1
        ).reshape(-1)

    def flat_scatter(idx, val_fs, rows):
        i2 = jnp.concatenate([idx * F + f for f in range(F)])
        vals = jnp.concatenate(val_fs)
        return jnp.zeros((rows * F,), dtype).at[i2].add(vals).reshape(rows, F)

    parts = []
    if k > 0 and dense_rows > 0:
        idx_dense = take(0, k, idx_cat)
        dense_fs = [take(0, k, u) for u in upd_fs]
        parts.append(
            _segment_sum_matmul_parts(idx_dense, dense_fs, dense_rows).astype(
                dtype
            )
        )
        if k >= L:
            return parts[0]
    else:
        k, dense_rows = 0, 0

    if sizes is None:
        # no per-level sizing info: one combined scatter over the fine block
        parts.append(
            flat_scatter(
                take(k, L, idx_cat) - dense_rows,
                [take(k, L, u) for u in upd_fs],
                total_rows - dense_rows,
            )
        )
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    off = dense_rows
    for lvl in range(k, L):
        rows = int(sizes[lvl])
        idx_l = take(lvl, lvl + 1, idx_cat) - off
        parts.append(
            flat_scatter(idx_l, [take(lvl, lvl + 1, u) for u in upd_fs], rows)
        )
        off += rows
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hash_lookup_cm(meta, flat_table, idx_cat, bary):
    """Fused multi-level multi-corner lookup, corner-major 2-D form.

    meta: static (nr_dense_levels, dense_rows, L, C, F).
    flat_table [R, F]; idx_cat [N, C*L] absolute rows (column c*L + l);
    bary [N, C*L] interpolation weights.
    Returns feats [N, L*F] (column l*F + f — identical ordering to the
    legacy [N, L, F].reshape). custom_vjp: backward is ONE accumulation
    (dense matmul prefix + one flat scatter), like _hash_lookup."""
    _, _, L, C, F = meta[:5]
    gs = _cm_gathers(flat_table, idx_cat, F)
    return _interleave_lf(_cm_feats(gs, bary, L, C))


def _hash_lookup_cm_fwd(meta, flat_table, idx_cat, bary):
    _, _, L, C, F = meta[:5]
    gs = _cm_gathers(flat_table, idx_cat, F)
    feats = _interleave_lf(_cm_feats(gs, bary, L, C))
    return feats, (tuple(gs), idx_cat, bary, flat_table.shape[0])


def _hash_lookup_cm_bwd(meta, res, dout):
    gs, idx_cat, bary, table_rows = res
    _, _, L, C, F = meta[:5]
    douts = _deinterleave_lf(dout, L, F)  # F x [N, L]
    d_bary = None
    upd_fs = []
    for f in range(F):
        dt = _tile_c(douts[f], C)  # [N, C*L]
        contrib = gs[f] * dt
        d_bary = contrib if d_bary is None else d_bary + contrib
        upd_fs.append(bary * dt)
    d_table = _table_grad_accumulate_cm(
        meta, idx_cat, upd_fs, table_rows, dout.dtype
    )
    return d_table, None, d_bary


_hash_lookup_cm.defvjp(_hash_lookup_cm_fwd, _hash_lookup_cm_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hash_lookup_grad_cm(meta, flat_table, idx_cat, bary, dbary):
    """Corner-major fused lookup returning features AND their spatial
    jacobian from one gather set (the 2-D replacement of _hash_lookup_grad).

    dbary [3, N, C*L]: K-LEADING spatial weight derivatives (the K axis
    leads so no tensor ever has a size-3 minor dim). Returns
    (feats [N, L*F], dfeats [3, N, L*F])."""
    _, _, L, C, F = meta[:5]
    gs = _cm_gathers(flat_table, idx_cat, F)
    feats = _interleave_lf(_cm_feats(gs, bary, L, C))
    dfeats = jnp.stack(
        [
            _interleave_lf(_cm_feats(gs, dbary[k], L, C))
            for k in range(dbary.shape[0])
        ],
        axis=0,
    )
    return feats, dfeats


def _hash_lookup_grad_cm_fwd(meta, flat_table, idx_cat, bary, dbary):
    _, _, L, C, F = meta[:5]
    gs = _cm_gathers(flat_table, idx_cat, F)
    feats = _interleave_lf(_cm_feats(gs, bary, L, C))
    dfeats = jnp.stack(
        [
            _interleave_lf(_cm_feats(gs, dbary[k], L, C))
            for k in range(dbary.shape[0])
        ],
        axis=0,
    )
    return (feats, dfeats), (
        tuple(gs), idx_cat, bary, dbary, flat_table.shape[0]
    )


def _hash_lookup_grad_cm_bwd(meta, res, cots):
    gs, idx_cat, bary, dbary, table_rows = res
    _, _, L, C, F = meta[:5]
    gf, gd = cots  # [N, L*F], [K, N, L*F]
    K = dbary.shape[0]
    douts = _deinterleave_lf(gf, L, F)
    gdouts = [_deinterleave_lf(gd[k], L, F) for k in range(K)]
    d_bary = None
    d_dbary_ks = []
    upd_fs = []
    for f in range(F):
        dt = _tile_c(douts[f], C)
        contrib = gs[f] * dt
        d_bary = contrib if d_bary is None else d_bary + contrib
        upd = bary * dt
        for k in range(K):
            upd = upd + dbary[k] * _tile_c(gdouts[k][f], C)
        upd_fs.append(upd)
    for k in range(K):
        acc = None
        for f in range(F):
            contrib = gs[f] * _tile_c(gdouts[k][f], C)
            acc = contrib if acc is None else acc + contrib
        d_dbary_ks.append(acc)
    d_table = _table_grad_accumulate_cm(
        meta, idx_cat, upd_fs, table_rows, gf.dtype
    )
    return d_table, None, d_bary, jnp.stack(d_dbary_ks, axis=0)


_hash_lookup_grad_cm.defvjp(_hash_lookup_grad_cm_fwd, _hash_lookup_grad_cm_bwd)


class PermutoEncoder(nn.Module):
    """Permutohedral-lattice hash encoding (4 simplex taps per level in 3D).

    JAX re-design of the reference's vendored CUDA permutohedral_encoding
    (usage: reference volsurfs_py/encodings/permutohash.py:28-99). Each 3D
    point is embedded on the hyperplane x·1=0 of R^4, the enclosing
    permutohedral simplex is found by ranking the residuals, and the d+1=4
    lattice corners are hashed into the feature table — half the gather
    traffic of the 8-tap cubic grid at equal quality.

    Per-level scales follow the reference geomspace(coarsest, finest).
    """

    input_dim: int = 3
    nr_levels: int = 24
    log2_hashmap_size: int = 18
    nr_feat_per_level: int = 2
    coarsest_scale: float = 1.0
    finest_scale: float = 0.0001
    nr_iters_for_c2f: int = 0
    concat_points: bool = True
    remove_last_element: bool = True
    bb_sides: float | Sequence[float] | None = 2.0

    @property
    def output_dim(self) -> int:
        d = self.nr_levels * self.nr_feat_per_level
        if self.concat_points:
            d += self.input_dim
        if self.remove_last_element:
            d -= 1
        return d

    def _scales(self):
        return np.geomspace(self.coarsest_scale, self.finest_scale, self.nr_levels)

    def _level_sizes(self):
        """Per-level rows: the lattice sites reachable from the unit cube at
        scale s number ~(1/s + 3)^3; give each level twice that (rounded up
        to a power of two) capped at the hash capacity — the reference's
        permutohedral encoding sizes its levels the same way
        (min(needed, capacity))."""
        T = 2**self.log2_hashmap_size
        sizes = []
        for s in self._scales():
            cells = int(np.ceil(1.0 / s) + 3) ** 3
            sizes.append(min(T, max(64, _next_pow2(2 * cells))))
        return sizes

    @nn.compact
    def __call__(self, points, iter_nr=None, with_grads=False):
        assert points.shape[-1] == self.input_dim == 3
        L, F = self.nr_levels, self.nr_feat_per_level
        d = 3
        sizes = self._level_sizes()
        offsets, total_rows, nr_dense, dense_rows = _level_layout(sizes)

        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(key, shape, minval=-1e-4, maxval=1e-4),
            (total_rows, F),
        )
        unit, out_of_bounds = _rescale_to_unit(points, self.bb_sides)
        if self.bb_sides is None:
            dunit_dp = jnp.ones((3,), jnp.float32)
        else:
            half = jnp.broadcast_to(
                jnp.asarray(self.bb_sides, jnp.float32) / 2.0, (3,)
            )
            dunit_dp = 1.0 / (2.0 * half)  # [3]

        if iter_nr is None:
            t = jnp.asarray(1.0)
        else:
            t = map_range_val(
                jnp.asarray(iter_nr, jnp.float32), 0.0, float(self.nr_iters_for_c2f), 0.3, 1.0
            )
        window = c2f_window(t, L)

        scales_np = np.asarray(self._scales(), np.float32)
        batch_shape = unit.shape[:-1]
        p = unit.reshape(-1, 3)

        # ---- corner-major 2-D formulation ----------------------------------
        # Every tensor below is [N, L] or [N, (d+1)*L]: small static axes
        # (the d+1 simplex residuals j, the d+1 corners c, the 3 spatial
        # dims k) are Python loops over column slices, never tensor axes —
        # a size-3/4 minor axis would make XLA pad its 128-lane tile 32-64x
        # (see the _cm primitives above for the measured failure).

        # embed into the hyperplane sum(x)=0 of R^{d+1} (standard
        # permutohedral basis: E maps R^d isometrically onto H_d); the
        # per-level 1/scale is folded into one [3, (d+1)*L] projection
        # matrix so elevation is a single matmul
        E = np.zeros((d + 1, d), np.float32)
        for i in range(d):
            E[: i + 1, i] = 1.0 / np.sqrt((i + 1) * (i + 2))
            E[i + 1, i] = -(i + 1) / np.sqrt((i + 1) * (i + 2))
        E = E * np.sqrt(2.0 / 3.0) * (d + 1)  # scale to lattice units
        W = np.zeros((3, (d + 1) * L), np.float32)
        for j in range(d + 1):
            W[:, j * L : (j + 1) * L] = E[j, :, None] / scales_np[None, :]
        elev = jnp.dot(p, jnp.asarray(W), preferred_element_type=jnp.float32)
        ej = [elev[:, j * L : (j + 1) * L] for j in range(d + 1)]
        # re-project onto the sum=0 hyperplane: exact in real arithmetic, but
        # float32 drift at fine scales otherwise breaks the single-wrap rank
        # correction (sum_rem must stay in [-(d+1)/2, (d+1)/2])
        mean = (ej[0] + ej[1] + ej[2] + ej[3]) * (1.0 / (d + 1))
        ej = [e - mean for e in ej]

        # closest remainder-0 lattice point, per residual j
        rem0 = []
        for e in ej:
            down = jnp.floor(e / (d + 1)) * (d + 1)
            up = down + (d + 1)
            rem0.append(jnp.where(e - down < up - e, down, up))
        sum_rem = (rem0[0] + rem0[1] + rem0[2] + rem0[3]) * (1.0 / (d + 1))

        # rank the residuals to identify the simplex: rank_i = number of
        # residuals greater than diff_i (largest -> rank 0), ties broken by
        # index — the classic pairwise loop of the permutohedral lattice
        # (6 [N, L] comparisons; equals the stable double-argsort)
        diff = [ej[j] - rem0[j] for j in range(d + 1)]
        rank = [jnp.zeros_like(diff[0], dtype=jnp.int32) for _ in range(d + 1)]
        for i in range(d + 1):
            for j in range(i + 1, d + 1):
                lt = (diff[i] < diff[j]).astype(jnp.int32)
                rank[i] = rank[i] + lt
                rank[j] = rank[j] + (1 - lt)
        sr = sum_rem.astype(jnp.int32)
        for j in range(d + 1):
            r = rank[j] + sr
            rem0[j] = jnp.where(r < 0, rem0[j] + (d + 1), rem0[j])
            r = jnp.where(r < 0, r + (d + 1), r)
            rem0[j] = jnp.where(r > d, rem0[j] - (d + 1), rem0[j])
            rank[j] = jnp.where(r > d, r - (d + 1), r)

        # barycentric slots: b[d-rank_j] += diff_j, b[d+1-rank_j] -= diff_j,
        # b[0] += 1 + b[d+1] — fixed-size masked sums, pure VPU work
        diff = [(ej[j] - rem0[j]) * (1.0 / (d + 1)) for j in range(d + 1)]
        idx_b = [d - rank[j] for j in range(d + 1)]
        bary_slots = []
        masks = []  # per (slot, j) +-1 masks, reused by the jacobian
        for slot in range(d + 2):
            pos = neg = None
            mrow = []
            for j in range(d + 1):
                pos_m = idx_b[j] == slot
                neg_m = idx_b[j] == slot - 1
                pj = jnp.where(pos_m, diff[j], 0.0)
                nj = jnp.where(neg_m, diff[j], 0.0)
                pos = pj if pos is None else pos + pj
                neg = nj if neg is None else neg + nj
                if with_grads:
                    mrow.append(
                        pos_m.astype(jnp.float32) - neg_m.astype(jnp.float32)
                    )
            bary_slots.append(pos - neg)
            masks.append(mrow)
        bary_slots[0] = bary_slots[0] + (1.0 + bary_slots[d + 1])
        # corner weights c=0..d, concatenated corner-major [N, (d+1)*L]
        bary_cat = jnp.concatenate(bary_slots[: d + 1], axis=1)

        # corner keys -> hashed absolute rows, per corner (key = rem0 +
        # (d+1) for coordinates whose rank >= d+1-corner; last coord dropped)
        level_off = jnp.asarray(offsets, jnp.int32)[None, :]
        sizes_arr = jnp.asarray(sizes, jnp.uint32)[None, :]
        primes = [jnp.uint32(_PRIMES[0]), jnp.uint32(_PRIMES[1]),
                  jnp.uint32(_PRIMES[2])]
        idx_corners = []
        for corner in range(d + 1):
            h = None
            for k3 in range(d):  # first d of the d+1 lattice coords
                add = jnp.where(
                    rank[k3] >= d + 1 - corner, float(d + 1), 0.0
                )
                key = (rem0[k3] + add).astype(jnp.int32).astype(jnp.uint32)
                term = key * primes[k3]
                h = term if h is None else h ^ term
            idx_corners.append(
                (h % sizes_arr).astype(jnp.int32) + level_off
            )
        idx_cat = jnp.concatenate(idx_corners, axis=1)  # [N, (d+1)*L]

        meta = (
            nr_dense, dense_rows, L, d + 1, F,
            tuple(int(s) for s in sizes),
        )
        window_rep = jnp.repeat(window, F)  # [L*F], traced (c2f)

        if not with_grads:
            feats = _hash_lookup_cm(meta, table, idx_cat, bary_cat)
            feats = feats * window_rep[None, :]
            feats = feats.reshape(*batch_shape, L * F)
            if self.concat_points:
                feats = jnp.concatenate([feats, unit], axis=-1)
            if self.remove_last_element:
                feats = feats[..., :-1]
            return feats, out_of_bounds

        # jacobian of the corner weights: d diff_j / d p_k is constant
        # inside a simplex — ddiff[j][k] = E[j, k] / ((d+1) * scales_l)
        # * dunit_dp_k, a [L] vector per (residual j, spatial k)
        ddiff = [
            [
                jnp.asarray(E[j, k3] / (d + 1) / scales_np) * dunit_dp[k3]
                for k3 in range(3)
            ]
            for j in range(d + 1)
        ]
        dbary_ks = []
        for k3 in range(3):
            slots = []
            for slot in range(d + 2):
                acc = None
                for j in range(d + 1):
                    term = masks[slot][j] * ddiff[j][k3][None, :]
                    acc = term if acc is None else acc + term
                slots.append(acc)
            slots[0] = slots[0] + slots[d + 1]
            dbary_ks.append(jnp.concatenate(slots[: d + 1], axis=1))
        dbary = jnp.stack(dbary_ks, axis=0)  # [3, N, (d+1)*L]

        feats, dfeats = _hash_lookup_grad_cm(
            meta, table, idx_cat, bary_cat, dbary
        )
        feats = feats * window_rep[None, :]
        dfeats = dfeats * window_rep[None, None, :]
        feats = feats.reshape(*batch_shape, L * F)
        dfeats = dfeats.reshape(3, *batch_shape, L * F)
        if self.concat_points:
            feats = jnp.concatenate([feats, unit], axis=-1)
            # d unit_i / d p_k = diag(dunit_dp): K-leading broadcast
            dunit = jnp.broadcast_to(
                jnp.diag(dunit_dp).reshape(
                    (3,) + (1,) * len(batch_shape) + (3,)
                ),
                (3,) + batch_shape + (3,),
            )
            dfeats = jnp.concatenate([dfeats, dunit], axis=-1)
        if self.remove_last_element:
            feats = feats[..., :-1]
            dfeats = dfeats[..., :-1]
        return feats, dfeats, out_of_bounds


def spher2cart(r, theta, phi):
    """Spherical -> Cartesian (reference encodings/sphericalgaussians.py:31-39)."""
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [r * sin_t * jnp.cos(phi), r * sin_t * jnp.sin(phi), r * jnp.cos(theta)],
        axis=-1,
    )


def eval_sg(sg_lambda, sg_mu, sg_coeffs, dirs):
    """Evaluate a spherical-gaussian mixture at view directions
    (reference encodings/sphericalgaussians.py:42-72: per-lobe
    ``coeffs * exp(lambda * (dot(mu, d) - 1))`` summed over lobes).

    sg_lambda: [..., K] sharpness (kept positive via abs like the reference),
    sg_mu: [..., K, 3] lobe axes, sg_coeffs: [..., K, C], dirs: [..., 3].
    Returns [..., C].
    """
    sg_lambda = jnp.abs(sg_lambda)
    dots = jnp.sum(sg_mu * dirs[..., None, :], axis=-1)  # [..., K]
    basis = jnp.exp(sg_lambda * (dots - 1.0))
    return jnp.sum(sg_coeffs * basis[..., None], axis=-2)


class SphericalGaussianEncoder(nn.Module):
    """Fixed Fibonacci-lattice SG basis over directions; the trainable
    coefficients live in the consuming MLP (unused by any reference config —
    encodings/sphericalgaussians.py has no imports — but kept for API parity).
    Output: [..., nr_lobes] basis values."""

    nr_lobes: int = 16
    sharpness: float = 8.0

    @property
    def output_dim(self):
        return self.nr_lobes

    @nn.compact
    def __call__(self, dirs, iter_nr=None):
        k = jnp.arange(self.nr_lobes, dtype=jnp.float32)
        golden = (1.0 + 5.0**0.5) / 2.0
        theta = jnp.arccos(1.0 - 2.0 * (k + 0.5) / self.nr_lobes)
        phi = 2.0 * jnp.pi * k / golden
        mu = spher2cart(1.0, theta, phi)  # [K, 3]
        dots = dirs @ mu.T
        return jnp.exp(self.sharpness * (dots - 1.0))


def get_encoder(encoding: str, **kwargs):
    """Encoder factory (reference volsurfs_py/utils/encoder.py:8-45)."""
    if encoding == "none":
        return IdentityEncoder(input_dim=kwargs.get("input_dim", 3))
    if encoding == "frequency":
        return FrequencyEncoder(
            input_dim=kwargs.get("input_dim", 3), multires=kwargs.get("multires", 6)
        )
    if encoding == "spherical_harmonics":
        return SHEncoder(degree=kwargs.get("degree", 3))
    if encoding == "spherical_gaussians":
        return SphericalGaussianEncoder(
            nr_lobes=kwargs.get("nr_lobes", 16),
            sharpness=kwargs.get("sharpness", 8.0),
        )
    if encoding == "permutohash":
        return PermutoEncoder(
            input_dim=kwargs.get("input_dim", 3),
            nr_levels=kwargs.get("nr_levels", 24),
            nr_iters_for_c2f=kwargs.get("nr_iters_for_c2f", 0),
            bb_sides=kwargs.get("bb_sides", 2.0),
        )
    if encoding == "gridhash":
        return HashGridEncoder(
            input_dim=kwargs.get("input_dim", 3),
            nr_levels=kwargs.get("nr_levels", 24),
            nr_iters_for_c2f=kwargs.get("nr_iters_for_c2f", 0),
            bb_sides=kwargs.get("bb_sides", 2.0),
        )
    raise NotImplementedError(
        f"unknown encoding {encoding}; choose from "
        "[none, frequency, spherical_harmonics, spherical_gaussians, "
        "permutohash, gridhash]"
    )
