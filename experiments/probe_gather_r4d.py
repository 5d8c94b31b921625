"""Round-4 probe v4: RAW tpu.dynamic_gather op rate (no table scan) —
how many (8,128) lane-gather ops per second does the VPU retire?

Variants:
  g1   : chain of dependent dim-1 gathers on one resident vreg pair
  gpar : independent gathers accumulated with xor (ILP-friendly)
  gsub : dim-0 (sublane) gathers
  bsel : gather + broadcast + compare + select (one table-scan step)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 64


def kern_chain(tab_ref, idx_ref, out_ref):
    t = tab_ref[:]
    x = idx_ref[:]
    for _ in range(UNROLL):
        x = jnp.take_along_axis(t, x & 127, axis=1)
    out_ref[:] = x


def kern_par(tab_ref, idx_ref, out_ref):
    t = tab_ref[:]
    x = idx_ref[:]
    acc = jnp.zeros_like(x)
    for i in range(UNROLL):
        acc = acc ^ jnp.take_along_axis(t, (x + i) & 127, axis=1)
    out_ref[:] = acc


def kern_sub(tab_ref, idx_ref, out_ref):
    t = tab_ref[:]
    x = idx_ref[:]
    acc = jnp.zeros_like(x)
    for i in range(UNROLL):
        acc = acc ^ jnp.take_along_axis(t, (x + i) & 7, axis=0)
    out_ref[:] = acc


def kern_scanstep(tab_ref, idx_ref, out_ref):
    # One table-scan step per iteration: broadcast a row, gather,
    # compare row-id, select.
    t = tab_ref[:]
    x = idx_ref[:]
    lane = x & 127
    row = jax.lax.shift_right_logical(x, 7)
    acc = jnp.zeros_like(x)
    for r in range(UNROLL):
        trow = jnp.broadcast_to(t[r % 8][None, :], (8, 128))
        g = jnp.take_along_axis(trow, lane, axis=1)
        acc = jnp.where(row == r, g, acc)
    out_ref[:] = acc


KERNS = {"g1": kern_chain, "gpar": kern_par, "gsub": kern_sub,
         "bsel": kern_scanstep}


def run(name):
    kern = KERNS[name]
    rng = np.random.default_rng(0)
    TR = UNROLL * 8 if name == "bsel4" else 8
    tab = jnp.asarray(rng.integers(0, 127, (TR, 128), np.int32))
    idx = jnp.asarray(rng.integers(0, 127, (8, 128), dtype=np.int32))
    TILES = 512  # repeat kernel body over grid to amortize launch

    f = jax.jit(
        lambda t, i: pl.pallas_call(
            kern,
            grid=(TILES,),
            in_specs=[
                pl.BlockSpec((TR, 128), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(t, i)
    )
    t0 = time.time()
    jax.block_until_ready(f(tab, idx))
    compile_s = time.time() - t0
    calls = 30
    t0 = time.time()
    for _ in range(calls):
        r = f(tab, idx)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / calls
    nops = TILES * UNROLL
    print(f"{name}: {nops/dt/1e6:.1f} M gather-ops/s "
          f"= {nops*1024/dt/1e9:.2f} G elems/s "
          f"({dt*1e6:.0f} us/call, compile {compile_s:.0f}s)", flush=True)


def main():
    print("devices:", jax.devices(), "jax", jax.__version__, flush=True)
    which = sys.argv[1:] or list(KERNS)
    for name in which:
        run(name)




def kern_scanstep2(tab_ref, idx_ref, out_ref):
    # Pre-broadcast table rows: per scan step = gather + 2 cmp + and +
    # select (no broadcast op).
    t = tab_ref[:]
    x = idx_ref[:]
    lane = x & 127
    row = jax.lax.shift_right_logical(x, 7)
    acc = jnp.zeros_like(x)
    for r in range(UNROLL):
        g = jnp.take_along_axis(t, lane, axis=1)
        hit = (g == x) & (row == r)
        acc = jnp.where(hit, g, acc)
    out_ref[:] = acc


def kern_scanstep3(tab_ref, idx_ref, out_ref):
    # check+score pair per row: 2 gathers + 2 cmp + and + select.
    t = tab_ref[:]
    x = idx_ref[:]
    lane = x & 127
    row = jax.lax.shift_right_logical(x, 7)
    acc = jnp.zeros_like(x)
    for r in range(UNROLL):
        gc = jnp.take_along_axis(t, lane, axis=1)
        gs = jnp.take_along_axis(t, (lane + 1) & 127, axis=1)
        hit = (gc == x) & (row == r)
        acc = jnp.where(hit, gs, acc)
    out_ref[:] = acc


KERNS["bsel2"] = kern_scanstep2
KERNS["bsel3"] = kern_scanstep3




def kern_scanstep4(tab_ref, idx_ref, out_ref):
    # HONEST pre-broadcast scan: each step gathers from a DIFFERENT
    # 8-sublane slice of a (UNROLL*8, 128) check table + score table
    # interleaved in sublanes — no loop-invariant gather to CSE.
    x = idx_ref[:]
    lane = x & 127
    row = jax.lax.shift_right_logical(x, 7)
    acc = jnp.zeros_like(x)
    for r in range(UNROLL):
        tc = tab_ref[8 * r: 8 * r + 8, :]
        gc = jnp.take_along_axis(tc, lane, axis=1)
        gs = jnp.take_along_axis(tc, (lane + 1) & 127, axis=1)
        hit = (gc == x) & (row == r)
        acc = jnp.where(hit, gs, acc)
    out_ref[:] = acc


KERNS["bsel4"] = kern_scanstep4


if __name__ == "__main__":
    main()
