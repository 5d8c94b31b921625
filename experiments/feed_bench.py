"""Generate-feed throughput: device DFA mask vs threaded native DFA.

VERDICT round-2 item 7: measure the TGX_DEVICE_FEED path on the real
chip and record a device-vs-native generate-feed MB/s row in
BASELINE.md (the generate hot loop; reference: src/generate.rs:54-139).

    python experiments/feed_bench.py [--mb 8] [--max-len 16] [--p 0.01]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=8)
    ap.add_argument("--max-len", type=int, default=16)
    ap.add_argument("--p", type=float, default=0.01,
                    help="insert probability (reference recipes: 0.01-0.1)")
    ap.add_argument("--allow", default=None,
                    help="allow regex (default: data/exact.regex)")
    args = ap.parse_args()

    from bench import build_corpus
    from tokengeex_tpu.core.redfa import compile_dfa
    from tokengeex_tpu.ops.dfa_device import feed_counts_device
    from tokengeex_tpu.utils import nativelib

    allow = args.allow
    if allow is None:
        with open(os.path.join(os.path.dirname(__file__), "..",
                               "data", "exact.regex")) as f:
            allow = f.read().strip()
    dfa = compile_dfa(allow)
    print(f"DFA states: {dfa.next.shape[0]}", flush=True)

    samples = build_corpus(int(args.mb * 1e6))
    total = sum(map(len, samples))
    print(f"corpus: {total/1e6:.1f} MB in {len(samples)} samples", flush=True)

    # Native threaded DFA counter (the default feed path).
    assert nativelib.get_lib() is not None
    for tag in ("native warm", "native"):
        t0 = time.time()
        counts_n = nativelib.substring_count(
            samples, dfa=dfa, max_token_length=args.max_len,
            insert_probability=args.p, seed=7)
        dt = time.time() - t0
        print(f"{tag}: {dt:.2f}s -> {total/dt/1e6:.1f} MB/s "
              f"({len(counts_n)} candidates)", flush=True)

    import jax
    print(f"device: {jax.devices()[0]}", flush=True)

    # Device DFA mask + threaded native drain.
    for tag in ("device warm (incl. compile)", "device"):
        t0 = time.time()
        counts_d = feed_counts_device(
            dfa, samples, args.max_len, args.p, 7)
        dt = time.time() - t0
        print(f"{tag}: {dt:.2f}s -> {total/dt/1e6:.1f} MB/s "
              f"({len(counts_d)} candidates)", flush=True)

    # Phase breakdown: device compute vs host link vs native drain, so
    # the pod-local (no-tunnel) projection is evidence-based.
    import jax.numpy as jnp
    import numpy as np

    from tokengeex_tpu.ops.dfa_device import (DeviceDFA,
                                              candidate_mask_device)

    ddfa = DeviceDFA.from_byte_dfa(dfa)
    W = max(len(s) for s in samples)
    W8 = -(-W // 8) * 8
    B = min(len(samples), max(1, (1 << 23) // W8))
    arr = np.zeros((B, W8), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(samples[:B]):
        arr[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    gbytes = int(lens.sum())

    @jax.jit
    def packed_mask(a, ln, sd):
        mask = candidate_mask_device(ddfa, a, ln, args.max_len, args.p, sd)
        m = mask.reshape(B, args.max_len, W8 // 8, 8)
        w = (1 << jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint32)
        return (m.astype(jnp.uint32) * w).sum(axis=-1).astype(jnp.uint8)

    da = jnp.asarray(arr)
    dl = jnp.asarray(lens)
    out = packed_mask(da, dl, jnp.uint32(1))  # compile
    jax.block_until_ready(out)
    t0 = time.time()
    out = packed_mask(da, dl, jnp.uint32(2))
    jax.block_until_ready(out)
    t_dev = time.time() - t0
    t0 = time.time()
    host_mask = np.asarray(out)
    t_link = time.time() - t0
    print(f"one group ({B} rows, {gbytes/1e6:.1f} MB corpus, "
          f"{host_mask.nbytes/1e6:.1f} MB mask): device compute "
          f"{t_dev:.3f}s -> {gbytes/t_dev/1e6:.1f} MB/s; mask fetch "
          f"{t_link:.3f}s -> link {host_mask.nbytes/t_link/1e6:.1f} MB/s",
          flush=True)

    # Sanity: same candidate universe at p=1 regardless of coin seeds.
    if args.p >= 1.0:
        kn = {k if isinstance(k, str) else k.decode() for k in counts_n}
        kd = {k if isinstance(k, str) else k.decode() for k in counts_d}
        print(f"candidate sets equal: {kn == kd}", flush=True)


if __name__ == "__main__":
    main()
