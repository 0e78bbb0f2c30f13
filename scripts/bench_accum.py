"""Microbench of the table-gradient accumulation formulations at the surf
workload shape (49152 points x 24 permuto levels x 4 corners, F=2).

Measures, inside one executable (fori_loop, net of dispatch):
  - flat scalar scatter over all levels (round-2 shipped form),
  - dense one-hot matmul for the coarse prefix + flat scatter for the rest
    (current form), for several dense cutoffs,
and prints ms per accumulation. Run on the TPU host:
  python scripts/bench_accum.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from volsurfs_tpu.models import encodings as E


def timed(fn, *args, iters=8, reps=3):
    def make(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                out = fn(a[0] + acc * 1e-30, *a[1:])
                return jnp.sum(out) * 1e-20 + acc * 0.5

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    run_n, run_1 = make(iters), make(1)
    float(run_n(*args))
    float(run_1(*args))
    tn, t1 = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_n(*args))
        tn.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run_1(*args))
        t1.append(time.perf_counter() - t0)
    return (min(tn) - min(t1)) / (iters - 1)


def main():
    enc = E.PermutoEncoder(nr_levels=24, log2_hashmap_size=18)
    sizes = enc._level_sizes()
    print("level sizes:", sizes, flush=True)

    N, C, F = 49152, 4, 2
    L = len(sizes)
    offsets = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    total = int(np.sum(sizes))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    # per-level uniform random local rows (real coarse-level indices are even
    # more duplicate-heavy, so this under-states the dense win)
    local = jax.random.randint(
        k1, (N, L, C), 0, np.broadcast_to(np.asarray(sizes), (L,))[None, :, None]
    )
    idx = (local + jnp.asarray(offsets, jnp.int32)[None, :, None]).astype(jnp.int32)
    upd = jax.random.normal(k2, (N, L, C, F), jnp.float32)

    for mode in ("flat", "cplx"):
        E.set_table_grad_mode(mode)
        for max_rows in (0, 2048, 8192, 32768, 131072):
            keep = E._DENSE_ACCUM_MAX_ROWS
            E._DENSE_ACCUM_MAX_ROWS = max_rows
            _, _, k, dense_rows = E._level_layout(sizes)
            E._DENSE_ACCUM_MAX_ROWS = keep
            layout = (k, dense_rows)

            def accum(u, i):
                return E._table_grad_accumulate(i, u, layout, total, jnp.float32)

            t = timed(accum, upd, idx)
            print(
                f"mode={mode:<5} dense_max={max_rows:>7} (k={k:2d} levels, "
                f"{dense_rows:>7} rows): {t*1e3:7.2f} ms per accumulation",
                flush=True,
            )
    E.set_table_grad_mode("flat")


if __name__ == "__main__":
    main()
