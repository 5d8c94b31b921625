"""A/B the single-probe bucket table vs the two-table fast probe on the
real chip: full 8 MB Viterbi pipeline, same batch, both jits."""

import importlib.util
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
b = importlib.util.module_from_spec(spec)
spec.loader.exec_module(b)

from tokengeex_tpu import Model  # noqa: E402
from tokengeex_tpu.train.generate import VocabularyGenerator  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from tokengeex_tpu.ops import lattice_jax as lj
    from tokengeex_tpu.ops.match_table import TokenTable
    from tokengeex_tpu.utils.packing import pack_samples

    samples = b.build_corpus(int(8e6))
    total = sum(map(len, samples))
    gen = VocabularyGenerator(max_token_length=16, insert_probability=1.0,
                              allow=r"^ ?[a-z]+$", seed=0)
    gen.feed([s.decode() for s in samples[:50]])
    vocab = gen.generate(4096)
    model = Model(vocab)
    print(f"vocab {len(vocab)}", flush=True)

    tbl = TokenTable.build(model.vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
    L = dt.max_len
    width = 8192
    packed = pack_samples(samples, width=width, max_snippet=width,
                          row_multiple=128)
    batch = lj.prepare_batch(packed, L)
    jax.block_until_ready(batch.p1)
    args = (batch.p1, batch.p2, batch.sid, batch.is_start, batch.is_end,
            batch.end_index, batch.rinv1, batch.rinv2)
    kernel = "pallas" if jax.devices()[0].platform == "tpu" else "xla"

    results = {}
    for probe in ("fast", "bucket"):
        @jax.jit
        def vit(p1, p2, sid, is_start, is_end, end_index, rinv1, rinv2,
                probe=probe):
            bb = lj.DeviceBatch(p1=p1, p2=p2, sid=sid, is_start=is_start,
                                is_end=is_end, end_index=end_index,
                                rinv1=rinv1, rinv2=rinv2, width=width,
                                pad=L)
            return lj.viterbi(dt, bb, C=512, unroll=8, dtype=jnp.float32,
                              backend=kernel, probe=probe)

        t0 = time.time()
        out = vit(*args)
        jax.block_until_ready(out)
        print(f"{probe}: compile+first {time.time()-t0:.1f}s", flush=True)
        runs = []
        for _ in range(3):
            t0 = time.time()
            out = vit(*args)
            jax.block_until_ready(out)
            runs.append(time.time() - t0)
        best = min(runs)
        results[probe] = (best, np.asarray(out[0][:, -1]))
        print(f"{probe}: steady {best:.3f}s -> {total/best/1e6:.1f} MB/s",
              flush=True)

    dp_f = results["fast"][1]
    dp_b = results["bucket"][1]
    same = np.allclose(dp_f, dp_b, equal_nan=True)
    print(f"dp tail equal: {same}", flush=True)
    print(f"speedup bucket vs fast: "
          f"{results['fast'][0]/results['bucket'][0]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
