"""Round-5 part 4: does the INDEX-ARRAY SHAPE set the gather rate?

Round-4 microbenches measured 0.39 G rows/s for HBM row gathers using
(Q, 128)-shaped index arrays; every slow variant in parts 1-3 used
flat (N,) chunks. Same table, same count, different index layouts.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

rng = np.random.default_rng(0)
E = 262160  # entries (16385 x16 rows)
rows16 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (16385, 16),
                                  dtype=np.int32))
TOT = 1 << 26  # 67M lookups
idx_flat = rng.integers(0, E, TOT, dtype=np.int32)


def lookup16(rows, sl):
    row = jax.lax.shift_right_logical(sl, jnp.int32(4))
    col = sl & jnp.int32(15)
    r = jnp.take(rows, row, axis=0)
    bits = r[..., 15]
    for k in range(15):
        bits = jnp.where(col == jnp.int32(k), r[..., k], bits)
    return bits


@functools.partial(jax.jit, static_argnames=("shape",))
def v_shape(rows, flat, shape):
    """scan over chunks of 2^21, each reshaped to `shape` before take."""
    N = 1 << 21

    def body(_, i):
        sl = jax.lax.dynamic_slice(flat, (i * N,), (N,)).reshape(shape)
        return None, lookup16(rows, sl).reshape(-1)
    _, ys = jax.lax.scan(body, None, jnp.arange(flat.shape[0] // N))
    return ys.reshape(-1)


@jax.jit
def raw_2d(rows, idx2):
    # single unchunked gather, (Q, 128) indices (round-4 microbench shape)
    return lookup16(rows, idx2)


flat = jnp.asarray(idx_flat)
i2 = jnp.asarray(idx_flat[: (1 << 19)].reshape(-1, 128))  # 512k, (4096,128)
i2big = jnp.asarray(idx_flat[: (1 << 22)].reshape(-1, 128))  # 4M
ref = None
for name, fn, cnt in [
    ("flat (N,)        ", lambda: v_shape(rows16, flat, (1 << 21,)), TOT),
    ("2-D (N/128, 128) ", lambda: v_shape(rows16, flat, (1 << 14, 128)), TOT),
    ("2-D (128, N/128) ", lambda: v_shape(rows16, flat, (128, 1 << 14)), TOT),
    ("3-D (512,32,128) ", lambda: v_shape(rows16, flat, (512, 32, 128)), TOT),
    ("raw 2-D 512k     ", lambda: raw_2d(rows16, i2), 1 << 19),
    ("raw 2-D 4M       ", lambda: raw_2d(rows16, i2big), 1 << 22),
]:
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    n = 3
    for _ in range(n):
        out = fn()
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    o = np.asarray(out).reshape(-1)
    if ref is None:
        ref = o
        ok = "ref"
    else:
        ok = "OK" if np.array_equal(o[: min(o.size, ref.size)],
                                    ref[: min(o.size, ref.size)]) else "DIFF"
    print(f"{name}: {dt*1e3:8.1f} ms  {cnt/dt/1e9:.3f} G rows/s [{ok}]",
          flush=True)
