"""Microbenchmark: TPU random-row gather rate vs table rows / row width / dtype.

Methodology notes (basis for the baked-renderer texture layout):
- one host dispatch costs ~28 ms through the axon tunnel, so G gathers are
  chained inside ONE jit and the marginal cost per gather is reported
  (slope between G=4 and G=20 runs);
- tables are random (a gather from a jnp.ones table constant-folds away);
- each gather uses a different index vector so nothing is CSE'd.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def run(table, idxs, G):
    @jax.jit
    def red(tb, ix):
        acc = jnp.zeros((), jnp.float32)
        for i in range(G):
            acc += jnp.sum(tb[ix[i]].astype(jnp.float32)) * (i + 1)
        return acc

    float(red(table, idxs))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(red(table, idxs))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)
    N = 262_144

    for rows in [65_536, 1_048_576, 4_194_304]:
        for width, dtype in [(4, jnp.float16), (16, jnp.float16),
                             (64, jnp.float16), (128, jnp.float32)]:
            k1, k2, key = jax.random.split(key, 3)
            table = jax.random.normal(k1, (rows, width), jnp.float32).astype(dtype)
            idxs = jax.random.randint(k2, (20, N), 0, rows, jnp.int32)
            t4 = run(table, idxs, 4)
            t20 = run(table, idxs, 20)
            per = (t20 - t4) / 16
            rate = N / per / 1e6
            mb = N * width * table.dtype.itemsize / 1e6
            print(
                f"rows={rows:>8} width={width:>4} {np.dtype(dtype).name:>8}"
                f"  {per*1e3:7.2f} ms/gather  {rate:7.1f} Mrows/s"
                f"  {mb/per/1e3:6.2f} GB/s"
            )
        print()


if __name__ == "__main__":
    main()
