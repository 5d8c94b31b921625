"""Scatter-add behavior: do duplicate indices (the miss-sentinel bin)
serialize TPU scatters? Host-synced, in-jit loops."""

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

    def loop(idx_fn):
        def run(i0, v):
            def body(k, acc):
                return acc.at[idx_fn(i0, k)].add(v)
            return jax.lax.fori_loop(0, K, body,
                                     jnp.zeros((S + 4096,), jnp.float32))
        return jax.jit(run)

    idx_rand = jnp.asarray(rng.integers(0, S, (N,), dtype=np.int32))
    timed("scatter random idx", loop(lambda i0, k: (i0 + k) & (S - 1)),
          idx_rand, vals)

    # 85% of updates on ONE address (the miss-sentinel pattern).
    miss = jnp.asarray(
        np.where(rng.random(N) < 0.85, S,
                 rng.integers(0, S, N)).astype(np.int32))
    timed("scatter 85%-one-addr", loop(lambda i0, k: i0), miss, vals)

    # Same, with the hot address spread over 4096 scratch bins.
    lane = jnp.asarray((np.arange(N) % 4096).astype(np.int32))

    def spread(i0, k):
        return jnp.where(i0 >= S, S + lane, i0)

    timed("scatter 85%-spread-4096", loop(spread), miss, vals)

    # All-unique (iota) for the upper bound.
    ordered = jnp.asarray((np.arange(N) % S).astype(np.int32))
    timed("scatter sequential idx", loop(lambda i0, k: i0), ordered, vals)


if __name__ == "__main__":
    main()
