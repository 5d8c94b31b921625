"""On-chip A/B: fused-probe kernels vs the XLA bucket-gather path at
the bench.py config (8 MB synthetic corpus, vocab 4096, W=8192)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    sys.path.insert(0, "/root/repo")
    import bench as bench_mod

    from tokengeex_tpu.models.unigram import Model
    from tokengeex_tpu.train.generate import VocabularyGenerator
    from tokengeex_tpu.ops import lattice_jax as lj
    from tokengeex_tpu.ops.match_table import TokenTable
    from tokengeex_tpu.utils.packing import pack_samples

    mb = float(os.environ.get("TGX_BENCH_MB", "8"))
    vocab_size = int(os.environ.get("TGX_BENCH_VOCAB", "4096"))
    width = int(os.environ.get("TGX_BENCH_WIDTH", "8192"))
    samples = bench_mod.build_corpus(int(mb * 1e6))
    total = sum(map(len, samples))
    gen = VocabularyGenerator(max_token_length=16, insert_probability=1.0,
                              allow=r"^ ?[a-z]+$", seed=0)
    gen.feed([s.decode() for s in samples[:50]])
    vocab = gen.generate(vocab_size)
    model = Model(vocab)
    tbl = TokenTable.build(model.vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
    L = dt.max_len
    log(f"corpus {total/1e6:.1f}MB vocab {len(vocab)} bits={dt.bits} "
        f"L={L} vscan={lj.has_vscan(dt)} dev={jax.devices()[0]}")

    packed = pack_samples(samples, width=width, max_snippet=width,
                          row_multiple=128)
    t0 = time.time()
    batch = lj.prepare_batch(packed, L)
    jax.block_until_ready(batch.p1)
    log(f"prep {time.time()-t0:.1f}s rows={packed.rows}")
    C = min(512, width)

    def sync(out):
        # device_get forces real completion (block_until_ready does not
        # round-trip through the axon relay).
        leaves = jax.tree_util.tree_leaves(out)
        jax.device_get(leaves[0].ravel()[:1])

    def timed(name, fn, calls=3):
        t0 = time.time()
        sync(fn())
        log(f"{name}: compile+first {time.time()-t0:.1f}s")
        runs = []
        for _ in range(calls):
            t0 = time.time()
            sync(fn())
            runs.append(time.time() - t0)
        best = min(runs)
        log(f"{name}: steady {best:.3f}s -> {total/best/1e6:.1f} MB/s")
        return best

    # Viterbi
    timed("viterbi xla-bucket+pallas-dp",
          lambda: lj.viterbi(dt, batch, C=C, unroll=8, backend="pallas"))
    timed("viterbi FUSED",
          lambda: lj.viterbi(dt, batch, C=C, backend="fused"))

    # EM session pass
    score, slots = lj.match_cache(dt, batch, C=C, dtype=jnp.float32)
    jax.block_until_ready(slots)
    t0 = time.time()
    seg = lj.build_seg_struct(slots, lj.seg_nbins(dt, jnp.float32))
    jax.block_until_ready(seg.perm)
    log(f"seg build {time.time()-t0:.1f}s ({seg.nbytes()/1e6:.0f} MB)")
    slot_rows = lj.slot_score_rows(dt)

    timed("estep cached+segsum (old)",
          lambda: lj.estep_cached(dt, batch, slots, slot_rows, seg=seg,
                                  C=C, backend="pallas"))
    timed("estep FUSED",
          lambda: lj.estep_fused(dt, batch, seg, slot_rows, C=C))
    timed("estep FUSED dropout=0.05",
          lambda: lj.estep_fused(dt, batch, seg, slot_rows,
                                 drop_u=jax.random.PRNGKey(0),
                                 dropout=0.05, C=C))

    # Component breakdown
    timed("forward FUSED",
          lambda: lj.forward(dt, batch, C=C, backend="fused"))
    timed("betas FUSED",
          lambda: lj.backward_betas(dt, batch, C=C, backend="fused"))
    A = lj.forward(dt, batch, C=C, backend="fused")
    Bt = lj.backward_betas(dt, batch, C=C, backend="fused")
    sync((A, Bt))
    timed("segsum only",
          lambda: lj.segsum_expected(dt, batch, A, Bt, seg, slot_rows))
    timed("forward old (cached slots)",
          lambda: lj.forward(dt, batch, C=C, unroll=8, backend="pallas",
                             cache=(score, slots)))


if __name__ == "__main__":
    main()
