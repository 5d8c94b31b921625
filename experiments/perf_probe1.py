"""On-chip probe: gather rooflines + Mosaic in-kernel gather retry.

Run alone on the TPU (one tunnel process at a time). Prints one line
per measurement: name, elements/s, GB/s.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 23  # 8.4M indices per call (bench chunk scale)
ITERS = 8


def timed(name, fn, *args, elems=N, bytes_per=4):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(ITERS):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / ITERS
    print(f"{name:36s} {elems/dt/1e9:8.3f} G elem/s   "
          f"{elems*bytes_per/dt/1e9:8.1f} GB/s   {dt*1e3:7.1f} ms",
          flush=True)
    return elems / dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for S, tag in [(1 << 13, "8k"), (1 << 17, "128k"), (1 << 21, "2M")]:
        idx = jnp.asarray(rng.integers(0, S, (N,), dtype=np.int32))
        t1 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S,), np.int32))
        f1 = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
        timed(f"take int32 S={tag}", f1, t1, idx)

        t2 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S, 2), np.int32))
        f2 = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
        timed(f"take int32x2 rows S={tag}", f2, t2, idx, bytes_per=8)

        t4 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S, 4), np.int32))
        timed(f"take int32x4 rows S={tag}", f2, t4, idx, bytes_per=16)

        t8 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S, 8), np.int32))
        timed(f"take int32x8 rows S={tag}", f2, t8, idx, bytes_per=32)

    # Gather with a 2-D index layout (as the probe issues it).
    S = 1 << 13
    idx2 = jnp.asarray(rng.integers(0, S, (16, N // 16), dtype=np.int32))
    t1 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S,), np.int32))
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
    timed("take int32 2D idx", f, t1, idx2)

    # Scatter-add roofline (EM count accumulation).
    vals = jnp.asarray(rng.random((N,), np.float32))
    idxs = jnp.asarray(rng.integers(0, S, (N,), dtype=np.int32))
    zero = jnp.zeros((S,), jnp.float32)

    def scat(z, i, v):
        return z.at[i].add(v, mode="drop").sum()

    timed("scatter-add f32 S=8k", jax.jit(scat), zero, idxs, vals)

    # Mosaic in-kernel gather attempts (small shapes first).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = 1 << 13

    def try_variant(name, kernel, idx_shape, out_shape):
        tab = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S,), np.int32))
        idx = jnp.asarray(rng.integers(0, S, idx_shape, dtype=np.int32))
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
            r = f(tab, idx)
            jax.block_until_ready(r)
            # correctness spot check
            want = np.asarray(tab)[np.asarray(idx)]
            ok = np.array_equal(np.asarray(r), want)
            print(f"pallas {name}: COMPILES ok={ok}", flush=True)
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"pallas {name}: FAIL {type(e).__name__}: {msg}",
                  flush=True)
            return False

    def k_direct(tab_ref, idx_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:]]

    def k_take(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    def k_take_flat(tab_ref, idx_ref, out_ref):
        i = idx_ref[:].reshape(-1)
        out_ref[:] = jnp.take(tab_ref[:], i, axis=0).reshape(idx_ref.shape)

    ok = try_variant("direct[idx] (8,128)", k_direct, (8, 128), (8, 128))
    ok2 = try_variant("take (8,128)", k_take, (8, 128), (8, 128))
    ok3 = try_variant("take flat (8,128)", k_take_flat, (8, 128), (8, 128))

    if ok or ok2 or ok3:
        kern = k_direct if ok else (k_take if ok2 else k_take_flat)
        BIG = (4096, 128)  # 512K elements per call
        tab = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S,), np.int32))
        idx = jnp.asarray(rng.integers(0, S, BIG, dtype=np.int32))
        f = jax.jit(
            lambda t, i: pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(BIG, jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i).sum()
        )
        timed("pallas gather 512K", f, tab, idx, elems=BIG[0] * BIG[1])


if __name__ == "__main__":
    main()
