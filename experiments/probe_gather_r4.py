"""Round-4 on-chip probe: Mosaic in-kernel gather support + rates.

Earlier rounds (jax < 0.9) hit "Only 2D gather" + server-side compile
crashes. This re-checks on the current toolchain:

  a) take_along_axis per-lane gather from a lane-replicated (S, 128)
     table at several S — the candidate for in-VMEM score lookup;
  b) the same at throughput scale (how many G lookups/s);
  c) one-dim jnp.take of a flat table inside the kernel.

If (a) runs at >0.39 G lookups/s, the fused probe-in-DP-kernel plan is
live; otherwise the XLA row-gather stays the roofline.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_variant(name, kernel, tab_shape, idx_shape, out_shape,
                check=None):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(-2**31, 2**31 - 1, tab_shape, np.int32))
    idx = jnp.asarray(rng.integers(0, tab_shape[0], idx_shape,
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
        r = np.asarray(jax.device_get(f(tab, idx)))
        ok = ""
        if check is not None:
            want = check(np.asarray(tab), np.asarray(idx))
            ok = f" correct={np.array_equal(r, want)}"
        print(f"OK   {name}: shape {r.shape}{ok}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def k_taa(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)


def k_take_flat(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:].reshape(-1), idx_ref[:], axis=0)


def taa_check(tab, idx):
    return np.take_along_axis(tab, idx, axis=0)


def main():
    print("devices:", jax.devices(), "jax", jax.__version__, flush=True)
    # --- support matrix -------------------------------------------------
    for S in (8, 64, 1024, 8192, 65536):
        try_variant(f"taa (S={S},128) idx(8,128)", k_taa, (S, 128),
                    (8, 128), (8, 128), check=taa_check)
    try_variant("take flat tab(8,128) idx(8,128)", k_take_flat,
                (8, 128), (8, 128), (8, 128))

    # --- throughput -----------------------------------------------------
    rng = np.random.default_rng(0)
    for S in (1024, 8192, 65536):
        Q = 2048  # (Q,128) lookups per call
        REP = 8

        def kern(tab_ref, idx_ref, out_ref):
            acc = jnp.zeros((Q, 128), jnp.int32)
            for r in range(REP):
                acc = acc + jnp.take_along_axis(
                    tab_ref[:], idx_ref[:] ^ r, axis=0)
            out_ref[:] = acc

        tab = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (S, 128),
                                       np.int32))
        idx = jnp.asarray(rng.integers(0, S - 8, (Q, 128), dtype=np.int32))
        try:
            f = jax.jit(
                lambda t, i: pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(t, i).sum()
            )
            jax.block_until_ready(f(tab, idx))
            t0 = time.time()
            CALLS = 50
            for _ in range(CALLS):
                r = f(tab, idx)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / CALLS
            n = Q * 128 * REP
            print(f"RATE taa S={S}: {n/dt/1e9:.3f} G lookups/s "
                  f"({dt*1e6:.0f} us/call)", flush=True)
        except Exception as e:
            print(f"RATE taa S={S}: FAIL {str(e).splitlines()[0][:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
