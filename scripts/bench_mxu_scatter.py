"""Measure (1) true MXU matmul peak with dispatch amortized inside one jit,
(2) the [hi, lane]-factorized one-hot segment-sum vs XLA scatter at the real
hash-encoder gradient shape.

The [hi, lane] idea: table rows r in [0, T) live at (hi = r // 128,
lane = r % 128) of a [T/128, 128] accumulator per feature. Route each
update's value to its lane with a compare-generated one-hot V [M, 128*F]
(VPU, ~0.5 elem-ops/update), then one-hot segment-sum over hi on the MXU:
out[hi, lane*F+f] = sum_m 1[hi_m == hi] V[m, lane*F+f]. Per update cost is
(T/128)*128*F MACs on the MXU instead of a serialized scalar scatter.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

T = 2**18
F = 2
N, C = 49_152, 4
M = N * C  # per-level updates
NLVL = 14  # fine levels in the real workload
HI = T // 128


def timed(jfn, *args, reps=3):
    out = jax.tree.leaves(jfn(*args))[0]
    np.asarray(out[..., :1, :1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.tree.leaves(jfn(*args))[0]
        np.asarray(out[..., :1, :1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    if which in ("all", "peak"):
        # 32 dependent 4096^2 bf16 matmuls inside one jit
        a = jax.random.normal(k1, (4096, 4096), jnp.bfloat16)
        b = jax.random.normal(k2, (4096, 4096), jnp.bfloat16)

        @jax.jit
        def peak(a, b):
            def body(x, _):
                return jax.lax.dot(x, b, preferred_element_type=jnp.bfloat16), None
            x, _ = jax.lax.scan(body, a, None, length=32)
            return x

        t = timed(peak, a, b)
        fl = 32 * 2 * 4096**3
        print(f"bf16 peak (32 chained 4096^3): {t*1e3:8.1f} ms  {fl/t/1e12:6.1f} TFLOP/s")

        @jax.jit
        def peak32(a, b):
            af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
            def body(x, _):
                return jax.lax.dot(x, bf, precision=jax.lax.Precision.HIGHEST), None
            x, _ = jax.lax.scan(body, af, None, length=8)
            return x

        t = timed(peak32, a, b)
        fl = 8 * 2 * 4096**3
        print(f"f32 HIGHEST  (8 chained 4096^3): {t*1e3:8.1f} ms  {fl/t/1e12:6.1f} TFLOP/s")

    idx = jax.random.randint(k1, (NLVL, M), 0, T, jnp.int32)
    upd = jax.random.normal(k2, (NLVL, M, F), jnp.float32)

    if which in ("all", "xla"):
        @jax.jit
        def xla1d(idx, upd):
            def per_level(i, u):
                i2 = (i[:, None] * F + jnp.arange(F, dtype=jnp.int32)[None, :]).reshape(-1)
                return jnp.zeros((T * F,), jnp.float32).at[i2].add(u.reshape(-1))
            return jax.vmap(per_level)(idx, upd)

        t = timed(xla1d, idx, upd)
        print(f"XLA scalar-flat scatter ({NLVL} lvls): {t*1e3:8.1f} ms  "
              f"{NLVL*M/t/1e6:6.1f} M row-upd/s")

    if which in ("all", "mxu"):
        lane_iota = jnp.arange(128, dtype=jnp.int32)

        def level_mxu(i, u, chunk, split):
            # i [M], u [M, F] -> [T, F]
            hi = (i // 128).astype(jnp.int32)
            lane = (i % 128).astype(jnp.int32)
            nch = M // chunk
            hi_c = hi.reshape(nch, chunk)
            lane_c = lane.reshape(nch, chunk)
            u_c = u.reshape(nch, chunk, F)
            rows = jnp.arange(HI, dtype=jnp.int32)

            def body(acc, xs):
                h, l, v = xs
                onehot = (rows[:, None] == h[None, :]).astype(jnp.bfloat16)  # [HI, chunk]
                sel = (l[:, None] == lane_iota[None, :])  # [chunk, 128]
                Vs = [jnp.where(sel, v[:, f:f+1], 0.0) for f in range(F)]
                V = jnp.concatenate(Vs, axis=1)  # [chunk, 128*F]
                if split:
                    vh = V.astype(jnp.bfloat16)
                    vl = (V - vh.astype(jnp.float32)).astype(jnp.bfloat16)
                    d = jax.lax.dot(onehot, vh, preferred_element_type=jnp.float32)
                    d = d + jax.lax.dot(onehot, vl, preferred_element_type=jnp.float32)
                else:
                    d = jax.lax.dot(
                        onehot.astype(jnp.float32), V,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                return acc + d, None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((HI, 128 * F), jnp.float32), (hi_c, lane_c, u_c)
            )
            # [HI, 128*F] -> [T, F]
            return jnp.stack(
                [acc[:, f * 128:(f + 1) * 128].reshape(-1) for f in range(F)], -1
            )

        for chunk in (1024, 2048, 4096):
            for split in (True, False):
                jf = jax.jit(lambda i, u, c=chunk, s=split: jax.vmap(
                    lambda ii, uu: level_mxu(ii, uu, c, s))(i, u))
                t = timed(jf, idx, upd)
                print(f"MXU hi/lane segsum chunk={chunk} split={split}: "
                      f"{t*1e3:8.1f} ms  {NLVL*M/t/1e6:6.1f} M row-upd/s")

    if which in ("all", "check"):
        # correctness of the mxu formulation vs scatter on one small level
        i = jax.random.randint(k1, (M,), 0, T, jnp.int32)
        u = jax.random.normal(k2, (M, F), jnp.float32)
        ref = jnp.zeros((T, F)).at[i].add(u)
        lane_iota = jnp.arange(128, dtype=jnp.int32)
        hi = i // 128
        lane = i % 128
        rows = jnp.arange(HI, dtype=jnp.int32)
        chunk = 2048
        acc = jnp.zeros((HI, 128 * F), jnp.float32)
        for c0 in range(0, M, chunk):
            h, l, v = hi[c0:c0+chunk], lane[c0:c0+chunk], u[c0:c0+chunk]
            onehot = (rows[:, None] == h[None, :]).astype(jnp.bfloat16)
            sel = (l[:, None] == lane_iota[None, :])
            V = jnp.concatenate(
                [jnp.where(sel, v[:, f:f+1], 0.0) for f in range(F)], axis=1)
            vh = V.astype(jnp.bfloat16)
            vl = (V - vh.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot(onehot, vh, preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot(onehot, vl, preferred_element_type=jnp.float32)
        got = jnp.stack([acc[:, f*128:(f+1)*128].reshape(-1) for f in range(F)], -1)
        err = jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref))
        print(f"mxu-vs-scatter max rel err: {float(err):.3e}")


if __name__ == "__main__":
    main()
