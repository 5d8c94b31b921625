#!/usr/bin/env python
"""A/B the cached-slot score re-gather and segsum at scale shapes.

Variables: L=15 (scale corpus) vs L=16 (bench), row-gather (H,2) vs
flat word gather (H,), width 3072 vs 8192.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    H = 8 * (1 << 14) + 1  # bucket slot space at 40k vocab

    def bench_case(B, L, C, W):
        slots = jnp.asarray(rng.integers(0, H, (B, L, W), dtype=np.int32))
        rows2 = jnp.asarray(rng.integers(-(2**31), 2**31 - 1,
                                         (H, 2), dtype=np.int32))
        flat = jnp.asarray(rng.integers(-(2**31), 2**31 - 1,
                                        (H,), dtype=np.int32))

        @jax.jit
        def row_gather(rows2, slots):
            def body(out, i):
                sl = jax.lax.dynamic_slice(slots, (0, 0, i * C), (B, L, C))
                r = jnp.take(rows2, sl, axis=0)
                s = jax.lax.bitcast_convert_type(
                    r[..., 0], jnp.float32)
                return jax.lax.dynamic_update_slice(
                    out, s, (0, 0, i * C)), None
            out, _ = jax.lax.scan(body, jnp.zeros((B, L, W), jnp.float32),
                                  jnp.arange(W // C))
            return out

        @jax.jit
        def word_gather(flat, slots):
            def body(out, i):
                sl = jax.lax.dynamic_slice(slots, (0, 0, i * C), (B, L, C))
                s = jax.lax.bitcast_convert_type(
                    jnp.take(flat, sl, axis=0), jnp.float32)
                return jax.lax.dynamic_update_slice(
                    out, s, (0, 0, i * C)), None
            out, _ = jax.lax.scan(body, jnp.zeros((B, L, W), jnp.float32),
                                  jnp.arange(W // C))
            return out

        @jax.jit
        def word_gather_flatidx(flat, slots):
            # One unchunked take over the flattened index array.
            s = jnp.take(flat, slots.reshape(-1), axis=0)
            return jax.lax.bitcast_convert_type(s, jnp.float32)

        n = B * L * W
        for name, fn, a in (("row2", row_gather, rows2),
                            ("word", word_gather, flat),
                            ("wflat", word_gather_flatidx, flat)):
            import jax as _j
            t0 = time.time()
            out = fn(a, slots)
            _j.device_get(out.reshape(-1)[:4])
            tc = time.time() - t0
            runs = []
            for _ in range(2):
                t0 = time.time()
                out = fn(a, slots)
                _j.device_get(out.reshape(-1)[:4])
                runs.append(time.time() - t0)
            best = min(runs)
            print(f"  B={B} L={L} W={W} {name}: compile+1st {tc:.2f}s "
                  f"steady {best:.3f}s = {n/best/1e9:.3f} G elem/s",
                  flush=True)

    print("scale shape (width 3072):", flush=True)
    bench_case(1408, 15, 512, 3072)
    bench_case(1408, 16, 512, 3072)
    print("bench shape (width 8192):", flush=True)
    bench_case(1024, 16, 512, 8192)
    bench_case(1024, 15, 512, 8192)


if __name__ == "__main__":
    main()
