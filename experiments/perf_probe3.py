"""On-chip probe v3: x8-row gathers (4-entry buckets), row scatters,
and f32 bitcast overhead. Host-synced, in-jit loops."""

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 23
K = 16


def timed(name, fn, *args, elems=N * K, bytes_per=4, calls=3):
    r = fn(*args)
    float(jax.device_get(jnp.sum(r)))
    t0 = time.time()
    for _ in range(calls):
        r = fn(*args)
    float(jax.device_get(jnp.sum(r)))
    dt = (time.time() - t0) / calls
    print(f"{name:40s} {elems/dt/1e9:8.3f} G elem/s  "
          f"{elems*bytes_per/dt/1e9:7.1f} GB/s  {dt*1e3:8.1f} ms/call",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    S = 1 << 13

    idx = jnp.asarray(rng.integers(0, S, (N,), dtype=np.int32))

    for ncol in (8, 16):
        tc = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, (S, ncol), np.int32))

        def loop_rows(t, i0, S=S):
            def body(k, acc):
                i = (i0 + k) & (S - 1)
                return acc + jnp.take(t, i, axis=0).sum(dtype=jnp.int32)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        timed(f"take int32x{ncol} rows", jax.jit(loop_rows), tc, idx,
              bytes_per=4 * ncol)

    # Simulated single-probe bucket: 1 x8 row gather + 4-way check/select.
    t8 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S, 8), np.int32))
    fp2 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (N,), np.int32))

    def loop_bucket(t, i0, f):
        def body(k, acc):
            i = (i0 + k) & (S - 1)
            r = jnp.take(t, i, axis=0)  # (N, 8)
            m0 = r[:, 0] == f
            m1 = r[:, 2] == f
            m2 = r[:, 4] == f
            m3 = r[:, 6] == f
            s = jnp.where(m0, r[:, 1],
                          jnp.where(m1, r[:, 3],
                                    jnp.where(m2, r[:, 5],
                                              jnp.where(m3, r[:, 7], 0))))
            return acc + s.sum(dtype=jnp.int32)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    timed("bucket probe x8 (1 gather+select)", jax.jit(loop_bucket), t8,
          idx, fp2, bytes_per=32)

    # Two-table cuckoo probe for comparison (2 x2-row gathers + select).
    t2a = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S, 2), np.int32))
    t2b = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S, 2), np.int32))

    def loop_cuckoo(a, b, i0, f):
        def body(k, acc):
            i1 = (i0 + k) & (S - 1)
            i2 = (i0 * 3 + k) & (S - 1)
            r1 = jnp.take(a, i1, axis=0)
            r2 = jnp.take(b, i2, axis=0)
            m1 = r1[:, 0] == f
            m2 = r2[:, 0] == f
            s = jnp.where(m1, r1[:, 1], jnp.where(m2, r2[:, 1], 0))
            return acc + s.sum(dtype=jnp.int32)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    timed("cuckoo probe 2x rows (2 gathers)", jax.jit(loop_cuckoo), t2a,
          t2b, idx, fp2, bytes_per=8)

    # Scatter-add of 2-column rows vs single column.
    vals = jnp.asarray(rng.random((N,), np.float32))
    vals2 = jnp.asarray(rng.random((N, 2), np.float32))

    def loop_scat1(i0, v):
        def body(k, acc):
            i = (i0 + k) & (S - 1)
            return acc.at[i].add(v)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((S,), jnp.float32))

    timed("scatter-add f32 1col", jax.jit(loop_scat1), idx, vals)

    def loop_scat2(i0, v):
        def body(k, acc):
            i = (i0 + k) & (S - 1)
            return acc.at[i].add(v)
        return jax.lax.fori_loop(0, K, body,
                                 jnp.zeros((S, 2), jnp.float32))

    timed("scatter-add f32 2col rows", jax.jit(loop_scat2), idx, vals2,
          bytes_per=8)


if __name__ == "__main__":
    main()
