"""Round-4 probe: in-kernel table lookup via row-broadcast + dim-1
dynamic_gather (the only gather Mosaic lowers on this toolchain:
operand/indices same 2D shape, gather along dim 0 or 1).

Decomposition for a flat E-entry table T viewed as (R, 128), R = E/128:
per query tile (8, 128) with lane = idx & 127, row = idx >> 7:
  for r in range(R):
    g = take_along_axis(broadcast(T[r], (8, 128)), lane, axis=1)
    out = where(row == r, g, out)

Grid iterates over query tiles so only the R-loop is unrolled in the
kernel body. XLA HBM row-gather baseline: 0.39 G rows/s.

Usage: probe_gather_r4b.py E [probe]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(R, probe=False):
    def kern(tab_ref, chk_ref, idx_ref, fp_ref, out_ref):
        it = idx_ref[:]
        lane = it & 127
        row = jax.lax.shift_right_logical(it, 7)
        tab = tab_ref[:]
        if probe:
            chk = chk_ref[:]
            fp = fp_ref[:]
            score = jnp.full((8, 128), -1, jnp.int32)
            for r in range(R):
                crow = jnp.broadcast_to(chk[r][None, :], (8, 128))
                srow = jnp.broadcast_to(tab[r][None, :], (8, 128))
                gc = jnp.take_along_axis(crow, lane, axis=1)
                gs = jnp.take_along_axis(srow, lane, axis=1)
                hit = (gc == fp) & (row == r)
                score = jnp.where(hit, gs, score)
            out_ref[:] = score
        else:
            out = jnp.zeros((8, 128), jnp.int32)
            for r in range(R):
                trow = jnp.broadcast_to(tab[r][None, :], (8, 128))
                g = jnp.take_along_axis(trow, lane, axis=1)
                out = jnp.where(row == r, g, out)
            out_ref[:] = out
    return kern


def run(E, probe=False, Q=4096):
    R = E // 128
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (R, 128), np.int32))
    chk = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (R, 128), np.int32))
    idx = jnp.asarray(rng.integers(0, E, (Q, 128), dtype=np.int32))
    fp = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (Q, 128), np.int32))
    kern = make_kernel(R, probe)
    name = f"{'probe' if probe else 'lookup'} E={E}"
    grid = (Q // 8,)
    rep = pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    qs = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = jax.jit(
        lambda t, c, i, p: pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[rep, rep, qs, qs],
            out_specs=qs,
            out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.int32),
        )(t, c, i, p)
    )
    t0 = time.time()
    r = np.asarray(jax.device_get(f(tab, chk, idx, fp)))
    compile_s = time.time() - t0
    tf = np.asarray(tab).reshape(-1)
    cf = np.asarray(chk).reshape(-1)
    ii = np.asarray(idx)
    if probe:
        want = np.where(cf[ii] == np.asarray(fp), tf[ii], -1)
    else:
        want = tf[ii]
    ok = np.array_equal(r, want)
    calls = max(3, min(50, int(3e8 * 128 / (Q * 128 * R * 3))))
    t0 = time.time()
    for _ in range(calls):
        r = f(tab, chk, idx, fp)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / calls
    n = Q * 128
    print(f"{name}: correct={ok} {n/dt/1e9:.3f} G lookups/s "
          f"({dt*1e6:.0f} us/call, {calls} calls, compile {compile_s:.0f}s)",
          flush=True)


def main():
    print("devices:", jax.devices(), "jax", jax.__version__, flush=True)
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    probe = len(sys.argv) > 2 and sys.argv[2] == "probe"
    run(E, probe=probe)


if __name__ == "__main__":
    main()
