"""On-chip probe v2: host-synced, in-jit-looped gather rooflines.

Each measurement runs K gather rounds inside ONE jit (amortizing the
~35ms tunnel dispatch) and syncs by materializing the scalar result on
host. Index streams are perturbed per round to defeat CSE.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 23  # 8.4M indices per round
K = 16       # rounds per jit call


def timed(name, fn, *args, elems=N * K, bytes_per=4, calls=3):
    r = fn(*args)
    float(jax.device_get(r))  # sync (compile + run)
    t0 = time.time()
    for _ in range(calls):
        r = fn(*args)
    float(jax.device_get(r))
    dt = (time.time() - t0) / calls
    print(f"{name:34s} {elems/dt/1e9:8.3f} G elem/s  "
          f"{elems*bytes_per/dt/1e9:7.1f} GB/s  {dt*1e3:8.1f} ms/call",
          flush=True)
    return elems / dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def loop_take(t, i0, S):
        def body(k, acc):
            i = (i0 + k) & (S - 1)
            return acc + jnp.take(t, i, axis=0).sum(dtype=jnp.int32)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    for S, tag in [(1 << 13, "8k"), (1 << 17, "128k"), (1 << 21, "2M")]:
        idx = jnp.asarray(rng.integers(0, S, (N,), dtype=np.int32))
        t1 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S,), np.int32))
        f1 = jax.jit(lambda t, i, S=S: loop_take(t, i, S))
        timed(f"take int32 S={tag}", f1, t1, idx)

    # Row gathers: does a (S, k) row fetch cost like one element?
    S = 1 << 13
    idx = jnp.asarray(rng.integers(0, S, (N,), dtype=np.int32))
    for ncol in (2, 4):
        tc = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, (S, ncol), np.int32))

        def loop_rows(t, i0, S=S):
            def body(k, acc):
                i = (i0 + k) & (S - 1)
                return acc + jnp.take(t, i, axis=0).sum(dtype=jnp.int32)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        timed(f"take int32x{ncol} rows S=8k", jax.jit(loop_rows), tc, idx,
              bytes_per=4 * ncol)

    # Scatter-add (EM count accumulation).
    vals = jnp.asarray(rng.random((N,), np.float32))

    def loop_scat(i0, v):
        def body(k, acc):
            i = (i0 + k) & (S - 1)
            return acc.at[i].add(v)
        return jax.lax.fori_loop(0, K, body,
                                 jnp.zeros((S,), jnp.float32)).sum()

    timed("scatter-add f32 S=8k", jax.jit(loop_scat), idx, vals)

    # The probe pattern itself: fp compute + 2-table em-style probe.
    t_em1 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S,), np.int32))
    t_em2 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S,), np.int32))

    def loop_probe(a, b, i0):
        def body(k, acc):
            i1 = (i0 + k) & (S - 1)
            i2 = (i0 * 3 + k) & (S - 1)
            e1 = jnp.take(a, i1, axis=0)
            e2 = jnp.take(b, i2, axis=0)
            m1 = (e1 & -65536) == 0
            q = jnp.where(m1, e1 & 0xFFFF, e2 & 0xFFFF)
            return acc + q.sum(dtype=jnp.int32)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    timed("em probe 2 tables S=8k", jax.jit(loop_probe), t_em1, t_em2, idx,
          elems=2 * N * K)

    # Pallas 2D-operand gather variants.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def try_variant(name, kernel, tab_shape, idx_shape, out_shape):
        tab = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, tab_shape, np.int32))
        idxs = jnp.asarray(rng.integers(0, tab_shape[0], idx_shape,
                                        dtype=np.int32))
        try:
            f = jax.jit(
                lambda t, i: pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(t, i)
            )
            r = jax.device_get(f(tab, idxs))
            print(f"pallas {name}: COMPILES, shape {np.asarray(r).shape}",
                  flush=True)
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"pallas {name}: FAIL {type(e).__name__}: {msg}",
                  flush=True)
            return False

    S2 = 1 << 10

    def k_rows(tab_ref, idx_ref, out_ref):
        # out[i, :] = tab[idx[i], :] -- 2D operand row gather
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    try_variant("row gather (S,128) idx(8,)", k_rows, (S2, 128), (8,),
                (8, 128))

    def k_taa(tab_ref, idx_ref, out_ref):
        # take_along_axis on 2D: out[i, j] = tab[idx[i, j], j]
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    try_variant("take_along_axis (S,128) idx(8,128)", k_taa, (S2, 128),
                (8, 128), (8, 128))

    def k_oh(tab_ref, idx_ref, out_ref):
        # one-hot matmul gather on the MXU (small tables)
        oh = (idx_ref[:][:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (1, S2), 1))
        out_ref[:] = jnp.dot(oh.astype(jnp.float32),
                             tab_ref[:].astype(jnp.float32),
                             preferred_element_type=jnp.float32
                             ).astype(jnp.int32)

    try_variant("onehot-mxu (S,128) idx(128,)", k_oh, (S2, 128), (128,),
                (128, 128))


if __name__ == "__main__":
    main()
