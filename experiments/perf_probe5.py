"""Scatter-add layout ladder: can lane-spread 2D tables beat the
~0.145 G elem/s 1D scatter-add roofline measured in perf_probe4?

Candidates (all accumulate N*K random-addressed f32 adds into S bins):
  a) 1D baseline:       acc[S];        acc.at[idx].add(v)
  b) lane-column 2D:    acc[S, 128];   acc.at[idx, i & 127].add(v)
     (each vector lane writes its own column -> no cross-lane conflict)
  c) column-scatter 2D: values reshaped (n, 128), per-column row index;
     one scatter with a 2-d index vector
  d) sort + segment-sum: jnp.sort cost dominates? measure both halves
Host-synced, in-jit fori loops, same shape as perf_probe4.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 23
K = 8
S = 1 << 14


def timed(name, fn, *args, elems=N * K, calls=3):
    r = fn(*args)
    float(jax.device_get(jnp.sum(r)))
    t0 = time.time()
    for _ in range(calls):
        r = fn(*args)
    float(jax.device_get(jnp.sum(r)))
    dt = (time.time() - t0) / calls
    print(f"{name:44s} {elems/dt/1e9:8.3f} G elem/s {dt*1e3:8.1f} ms/call",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random((N,), np.float32))
    idx = jnp.asarray(rng.integers(0, S, (N,), dtype=np.int32))

    @jax.jit
    def scat1d(idx, v):
        def body(k, acc):
            return acc.at[(idx + k) & (S - 1)].add(v)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((S,), jnp.float32))

    timed("a) 1D scatter baseline", scat1d, idx, vals)

    lane = jnp.arange(N, dtype=jnp.int32) & 127

    @jax.jit
    def scat_lane(idx, v, lane):
        def body(k, acc):
            return acc.at[(idx + k) & (S - 1), lane].add(v)
        acc = jax.lax.fori_loop(0, K, body,
                                jnp.zeros((S, 128), jnp.float32))
        return acc.sum(axis=1)

    timed("b) 2D lane-column (S,128)", scat_lane, idx, vals, lane)

    # c) values as (n, 128): column j scatters into column j of acc.
    n = N // 128
    v2 = vals.reshape(n, 128)
    i2 = idx.reshape(n, 128)

    @jax.jit
    def scat_col(i2, v2):
        def body(k, acc):
            return acc.at[(i2 + k) & (S - 1), jnp.arange(128)].add(v2)
        acc = jax.lax.fori_loop(0, K, body,
                                jnp.zeros((S, 128), jnp.float32))
        return acc.sum(axis=1)

    timed("c) 2D column-scatter (n,128)->(S,128)", scat_col, i2, v2)

    # d) sort + segment-sum (one K pass at a time to bound memory)
    @jax.jit
    def sort_only(idx, v):
        si = jnp.sort(idx)
        return si

    timed("d1) sort 8M int32 (per pass)", sort_only, idx, vals,
          elems=N, calls=3)

    @jax.jit
    def seg(idx, v):
        order = jnp.argsort(idx)
        si = idx[order]
        sv = v[order]
        return jax.ops.segment_sum(sv, si, num_segments=S)

    timed("d2) argsort+gather+segsum (per pass)", seg, idx, vals,
          elems=N, calls=3)

    # e) bf16 accumulate then widen (halves scatter bytes; counts are
    # statistical so precision loss may be acceptable for probing only)
    vb = vals.astype(jnp.bfloat16)

    @jax.jit
    def scat_bf16(idx, v):
        def body(k, acc):
            return acc.at[(idx + k) & (S - 1)].add(v)
        return jax.lax.fori_loop(
            0, K, body, jnp.zeros((S,), jnp.bfloat16)).astype(jnp.float32)

    timed("e) 1D scatter bf16", scat_bf16, idx, vb)


if __name__ == "__main__":
    main()
