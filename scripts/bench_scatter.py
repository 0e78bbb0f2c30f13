"""Scatter-add formulation shootout on the real chip.

Workload: hash-encoder gradient shape from a surf train step —
N=49152 sample points x L=24 levels x C=4 permuto corners = 4.7M updates
of F=2 floats into 24 tables of 2^18 rows.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

L, T, F = 24, 2**18, 2
N, C = 49_152, 4
M = N * C  # updates per level


def timed(fn, *args, reps=3):
    jfn = jax.jit(fn)
    out = jax.tree.leaves(jfn(*args))[0]
    float(out.reshape(-1)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.tree.leaves(jfn(*args))[0]
        float(out.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def report(name, t):
    print(f"{name:<44} {t*1e3:8.1f} ms  {L*M/t/1e6:7.1f} M upd/s", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (L, M), 0, T, jnp.int32)
    upd = jax.random.normal(k2, (L, M, F), jnp.float32)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "xla2d"):
        # current: one big scatter into the flat [L*T, F] table
        def xla2d(idx, upd):
            flat_idx = (idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
            return jnp.zeros((L * T, F), jnp.float32).at[flat_idx].add(
                upd.reshape(-1, F)
            )

        report("xla scatter rows [4.7M -> LT,2]", timed(xla2d, idx, upd))

    if which in ("all", "xla1d"):
        def xla1d(idx, upd):
            flat_idx = (idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
            i2 = jnp.stack([flat_idx * F, flat_idx * F + 1], -1).reshape(-1)
            return jnp.zeros((L * T * F,), jnp.float32).at[i2].add(
                upd.reshape(-1)
            )

        report("xla scatter scalars [9.4M -> LT*2]", timed(xla1d, idx, upd))

    if which in ("all", "sorted"):
        idx_s = jnp.sort(idx, axis=1)

        def xla_sorted(idx_s, upd):
            flat_idx = (idx_s + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
            return jnp.zeros((L * T, F), jnp.float32).at[flat_idx].add(
                upd.reshape(-1, F), indices_are_sorted=True, mode="drop"
            )

        report("xla scatter rows PRE-SORTED", timed(xla_sorted, idx_s, upd))

    if which in ("all", "segsum"):
        idx_s = jnp.sort(idx, axis=1)

        def seg(idx_s, upd):
            flat_idx = (idx_s + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
            return jax.ops.segment_sum(
                upd.reshape(-1, F), flat_idx, num_segments=L * T,
                indices_are_sorted=True,
            )

        report("segment_sum PRE-SORTED", timed(seg, idx_s, upd))

    if which in ("all", "uniq"):
        # sort by row -> run totals via inclusive/exclusive cumsum -> TWO
        # unique-index scatters (run starts get -excl, run ends get +incl;
        # their sum per row is the run total). All steps are parallel VPU
        # work except the scatters, which XLA can vectorize because
        # unique_indices=True.
        def uniq(idx, upd):
            flat_idx = (idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
            u = upd.reshape(-1, F)
            order = jnp.argsort(flat_idx)
            r = flat_idx[order]
            us = u[order]
            csum = jnp.cumsum(us, axis=0)
            excl = csum - us
            is_end = jnp.concatenate([r[1:] != r[:-1], jnp.ones((1,), bool)])
            is_start = jnp.concatenate([jnp.ones((1,), bool), r[1:] != r[:-1]])
            # non-end entries scatter into DISTINCT padding rows so
            # unique_indices=True is honest; padding is sliced off after
            pad = L * T + jnp.arange(r.shape[0], dtype=jnp.int32)
            end_rows = jnp.where(is_end, r, pad)
            start_rows = jnp.where(is_start, r, pad)
            d = jnp.zeros((L * T + r.shape[0], F), jnp.float32)
            d = d.at[end_rows].add(csum, unique_indices=True)
            d = d.at[start_rows].add(-excl, unique_indices=True)
            return d[: L * T]

        report("sort+cumsum+2 unique scatters", timed(uniq, idx, upd))

    if which in ("all", "sorttime"):
        def s(idx):
            return jnp.sort(idx, axis=1)

        report("(jnp.sort of the 4.7M keys alone)", timed(s, idx))

    if which in ("all", "onehot"):
        # MXU factorization: d[hi, lo*F+f] = sum_m 1[hi_m==hi] Elo[m,lo]*u[m,f]
        HI = 512
        LO = T // HI

        def onehot(idx, upd):
            outs = []
            for l in range(2):  # 2 of 24 levels, extrapolate
                hi = (idx[l] // LO).astype(jnp.int32)
                lo = idx[l] % LO
                ehi = (hi[None, :] == jnp.arange(HI, dtype=jnp.int32)[:, None])
                ehi = ehi.astype(jnp.bfloat16)  # [HI, M]
                elo = (lo[:, None] == jnp.arange(LO, dtype=jnp.int32)[None, :])
                b = (elo[:, :, None] * upd[l][:, None, :].astype(jnp.bfloat16)).reshape(M, LO * F)
                d = jax.lax.dot(ehi, b, preferred_element_type=jnp.float32)
                outs.append(d)
            return jnp.stack(outs)

        t = timed(onehot, idx, upd) * 12  # scale 2 -> 24 levels
        report("one-hot MXU 512x512 (extrapolated 24L)", t)


if __name__ == "__main__":
    main()
