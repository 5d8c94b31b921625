"""Scatter-free segment reduction over a STATIC index set.

EM count accumulation is `counts[slot_p] += w_p` where the slot array is
cached per group for a whole DeviceTrainSession (perf ledger): the
sparsity pattern is fixed, only w varies per pass. So we can pay an
argsort ONCE per group and replace every pass's scatter-add
(0.145 G elem/s wall, perf_probe5) with:

    gather w by perm  ->  cumsum  ->  diff at segment boundaries

Measured here:
  a) pre-sorted segment_sum (indices_are_sorted=True) - does XLA care?
  b) permute gather of 8M f32 (word layout) by a fixed perm
  c) cumsum 8M f32 / f64
  d) full pipeline f32: gather+cumsum+boundary-gather-diff
  e) precision of (d) vs f64 scatter reference
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 23
S = 1 << 14
K = 8  # repeat factor to match probe5 elems


def timed(name, fn, *args, elems=N, calls=3):
    r = fn(*args)
    float(jax.device_get(jnp.sum(r)))
    t0 = time.time()
    for _ in range(calls):
        r = fn(*args)
    float(jax.device_get(jnp.sum(r)))
    dt = (time.time() - t0) / calls
    print(f"{name:46s} {elems/dt/1e9:8.3f} G elem/s {dt*1e3:8.1f} ms/call",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    vals_h = rng.random((N,), np.float32)
    idx_h = rng.integers(0, S, (N,), dtype=np.int32)
    vals = jnp.asarray(vals_h)
    idx = jnp.asarray(idx_h)

    # one-time (per session) host prep of the static structure
    perm_h = np.argsort(idx_h, kind="stable").astype(np.int32)
    sorted_idx = idx_h[perm_h]
    # boundary[s] = first position with slot >= s  (counts via diff)
    starts_h = np.searchsorted(sorted_idx, np.arange(S + 1)).astype(np.int32)
    perm = jnp.asarray(perm_h)
    starts = jnp.asarray(starts_h)

    @jax.jit
    def seg_sorted(v, p):
        sv = v[p]
        si = jnp.sort(idx)  # cheat: reuse; cost measured separately
        return jax.ops.segment_sum(sv, si, num_segments=S,
                                   indices_are_sorted=True)

    @jax.jit
    def permute_only(v, p):
        def body(k, acc):
            return acc + v[(p + k) & (N - 1)]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((N,), jnp.float32))

    timed(f"b) permute gather x{K} (word)", permute_only, vals, perm,
          elems=N * K)

    @jax.jit
    def csum32(v):
        def body(k, acc):
            return acc + jnp.cumsum(v + k.astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, jnp.zeros((N,), jnp.float32))

    timed(f"c1) cumsum f32 x{K}", csum32, vals, elems=N * K)

    @jax.jit
    def csum64(v):
        v = v.astype(jnp.float64)
        def body(k, acc):
            return acc + jnp.cumsum(v + k.astype(jnp.float64))
        return jax.lax.fori_loop(0, K, body, jnp.zeros((N,), jnp.float64))

    timed(f"c2) cumsum f64 x{K}", csum64, vals, elems=N * K)

    @jax.jit
    def pipeline32(v, p, st):
        def body(k, acc):
            sv = v[p]  # static perm
            c = jnp.cumsum(sv)
            z = jnp.concatenate([jnp.zeros((1,), c.dtype), c])
            return acc + (z[st[1:]] - z[st[:-1]])
        return jax.lax.fori_loop(0, K, body, jnp.zeros((S,), jnp.float32))

    timed(f"d) gather+cumsum+diff f32 x{K}", pipeline32, vals, perm, starts,
          elems=N * K)

    timed("a) segment_sum sorted (incl sort)", seg_sorted, vals, perm,
          elems=N)

    # e) precision: one pass vs f64 reference
    ref = np.zeros((S,), np.float64)
    np.add.at(ref, idx_h, vals_h.astype(np.float64))
    got = np.asarray(jax.device_get(
        jax.jit(lambda v, p, st: (lambda c: (lambda z: z[st[1:]] - z[st[:-1]])(
            jnp.concatenate([jnp.zeros((1,), c.dtype), c])))(
                jnp.cumsum(v[p])))(vals, perm, starts)))
    scat = np.zeros((S,), np.float32)
    np.add.at(scat, idx_h, vals_h)
    err_pipe = np.max(np.abs(got - ref) / np.maximum(ref, 1e-9))
    err_scat = np.max(np.abs(scat - ref) / np.maximum(ref, 1e-9))
    print(f"e) rel err: cumsum-diff {err_pipe:.3e}  f32 scatter {err_scat:.3e}",
          flush=True)


if __name__ == "__main__":
    main()
