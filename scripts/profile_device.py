"""Host-synced micro-profiler for the device lattice pipeline.

Timing on this environment's async dispatch requires forcing a value to
host every iteration (see BASELINE.md caveats); this tool times each
stage of the hot path that way:

    python scripts/profile_device.py [--mb 4] [--vocab 4096] [--width 8192]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=4)
    ap.add_argument("--vocab", type=int, default=4096)
    ap.add_argument("--width", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_corpus
    from tokengeex_tpu import Model
    from tokengeex_tpu.ops import lattice_jax as lj
    from tokengeex_tpu.ops.match_table import TokenTable
    from tokengeex_tpu.train.generate import VocabularyGenerator
    from tokengeex_tpu.utils.packing import pack_samples

    samples = build_corpus(int(args.mb * 1e6))
    total = sum(map(len, samples))
    gen = VocabularyGenerator(max_token_length=16, insert_probability=1.0,
                              allow=r"^ ?[a-z]+$", seed=0)
    gen.feed([s.decode() for s in samples[:50]])
    model = Model(gen.generate(args.vocab))
    tbl = TokenTable.build(model.vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
    L = dt.max_len
    W = args.width
    C = min(args.chunk, W)
    kernel = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    packed = pack_samples(samples, width=W, max_snippet=W, row_multiple=128)
    batch = lj.prepare_batch(packed, L)
    a8 = (batch.p1, batch.p2, batch.sid, batch.is_start, batch.is_end,
          batch.end_index, batch.rinv1, batch.rinv2)
    print(f"{total/1e6:.1f} MB, rows {packed.rows} x {W}, vocab "
          f"{dt.vocab_size}, L={L}, kernel={kernel}", flush=True)

    def mk(*a):
        return lj.DeviceBatch(p1=a[0], p2=a[1], sid=a[2], is_start=a[3],
                              is_end=a[4], end_index=a[5], rinv1=a[6],
                              rinv2=a[7], width=W, pad=L)

    def bench(name, fn, iters=3):
        f = jax.jit(fn)
        r = f(*a8)
        _ = float(jnp.asarray(r).ravel()[0])  # compile + host sync
        best = 1e9
        for _i in range(iters):
            t0 = time.time()
            r = f(*a8)
            _ = float(jnp.asarray(r).ravel()[0])
            best = min(best, time.time() - t0)
        print(f"{name:>28}: {best*1e3:7.1f}ms  {total/best/1e6:6.1f} MB/s",
              flush=True)

    bench("match_cache(em)",
          lambda *a: lj.match_cache(dt, mk(*a), C=C, probe="em")[0].sum())
    bench("match_cache(fast)",
          lambda *a: lj.match_cache(dt, mk(*a), C=C, probe="fast")[0].sum())

    def fwd(*a):
        b = mk(*a)
        cache = lj.match_cache(dt, b, C=C, probe="em")
        return lj.forward(dt, b, C=C, backend=kernel, probe="em",
                          cache=cache).sum()
    bench("cache + forward", fwd)

    def full_estep(*a):
        b = mk(*a)
        cache = lj.match_cache(dt, b, C=C, probe="em")
        A = lj.forward(dt, b, C=C, backend=kernel, probe="em", cache=cache)
        acc = lj.backward_expected(dt, b, A, C=C, backend=kernel,
                                   probe="em", cache=cache)
        return acc.sum() + A.sum()
    bench("cache + fwd + bwd (E-step)", full_estep)

    def vit(*a):
        return lj.viterbi(dt, mk(*a), C=C, backend=kernel)[0].sum()
    bench("viterbi (inline fast probe)", vit)


if __name__ == "__main__":
    main()
