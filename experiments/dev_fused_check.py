"""Dev check: fused-probe kernels vs the XLA gather path (CPU
interpret mode). Compares viterbi dp/bestl, forward A, backward betas,
and the full estep accumulator, with and without dropout."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import numpy as np
import jax
import jax.numpy as jnp

from tokengeex_tpu.models.unigram import Model
from tokengeex_tpu.train.generate import VocabularyGenerator
from tokengeex_tpu.ops import lattice_jax as lj
from tokengeex_tpu.ops.match_table import TokenTable
from tokengeex_tpu.utils.packing import pack_samples


def main():
    rng = np.random.default_rng(0)
    words = ["an", "er", "ti", "on", "ra", "lo", "de", "mi", "value",
             "def", "return", "data", "self", "print"]
    samples = []
    for _ in range(300):
        n = rng.integers(2, 30)
        samples.append(" ".join(words[i] for i in
                                rng.integers(0, len(words), n)).encode())

    gen = VocabularyGenerator(max_token_length=11, insert_probability=1.0,
                              allow=r"^ ?[a-z]+$", seed=0)
    gen.feed([s.decode() for s in samples[:100]])
    vocab = gen.generate(900)
    model = Model(vocab)
    tbl = TokenTable.build(model.vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
    assert lj.has_vscan(dt), f"vscan missing (bits={dt.bits})"
    L = dt.max_len
    print(f"vocab={len(vocab)} bits={dt.bits} L={L}")

    W = 512
    packed = pack_samples(samples, width=W, max_snippet=W, row_multiple=128)
    batch = lj.prepare_batch(packed, L)
    C = 256

    for dropout, seed in ((0.0, 0), (0.3, 7)):
        drop_u = None
        if dropout > 0.0:
            key = jax.random.PRNGKey(seed)
            drop_u = jax.random.randint(
                key, (batch.p1.shape[0], batch.sid.shape[1]),
                minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32)

        dp_x, bl_x = lj.viterbi(dt, batch, C=C, drop_u=drop_u,
                                dropout=dropout, backend="xla")
        dp_f, bl_f = lj.viterbi(dt, batch, C=C, drop_u=drop_u,
                                dropout=dropout, backend="fused")
        dp_x, dp_f = np.asarray(dp_x), np.asarray(dp_f)
        bl_x, bl_f = np.asarray(bl_x), np.asarray(bl_f)
        fin = np.isfinite(dp_x)
        assert (fin == np.isfinite(dp_f)).all(), "dp finiteness differs"
        assert np.allclose(dp_x[fin], dp_f[fin], rtol=1e-6, atol=1e-6), (
            np.abs(dp_x[fin] - dp_f[fin]).max())
        assert (bl_x[fin] == bl_f[fin]).all(), "bestl differs"
        print(f"viterbi ok (dropout={dropout})")

        A_x = lj.forward(dt, batch, C=C, drop_u=drop_u, dropout=dropout,
                         backend="xla")
        A_f = lj.forward(dt, batch, C=C, drop_u=drop_u, dropout=dropout,
                         backend="fused")
        A_x, A_f = np.asarray(A_x), np.asarray(A_f)
        fin = np.isfinite(A_x)
        assert (fin == np.isfinite(A_f)).all()
        assert np.allclose(A_x[fin], A_f[fin], rtol=1e-5, atol=1e-5), (
            np.abs(A_x[fin] - A_f[fin]).max())
        print(f"forward ok (dropout={dropout})")

        Bt_x = lj.backward_betas(dt, batch, C=C, drop_u=drop_u,
                                 dropout=dropout)
        Bt_f = lj.backward_betas(dt, batch, C=C, drop_u=drop_u,
                                 dropout=dropout, backend="fused")
        Bt_x, Bt_f = np.asarray(Bt_x), np.asarray(Bt_f)
        fin = np.isfinite(Bt_x)
        assert (fin == np.isfinite(Bt_f)).all()
        assert np.allclose(Bt_x[fin], Bt_f[fin], rtol=1e-5, atol=1e-5), (
            np.abs(Bt_x[fin] - Bt_f[fin]).max())
        print(f"betas ok (dropout={dropout})")

        # Full estep vs the cached-slot reference path.
        score, slots = lj.match_cache(dt, batch, C=C, dtype=jnp.float32)
        seg = lj.build_seg_struct(slots, lj.seg_nbins(dt, jnp.float32))
        slot_rows = lj.slot_score_rows(dt)
        A1, exp1 = lj.estep_cached(dt, batch, slots, slot_rows, seg=seg,
                                   drop_u=drop_u, dropout=dropout, C=C)
        A2, exp2 = lj.estep_fused(dt, batch, seg, slot_rows,
                                  drop_u=drop_u, dropout=dropout, C=C)
        e1 = lj.fold_expected(dt, exp1)
        e2 = lj.fold_expected(dt, exp2)
        assert np.allclose(e1, e2, rtol=1e-4, atol=1e-4), (
            np.abs(e1 - e2).max())
        print(f"estep ok (dropout={dropout}) total={e1.sum():.3f}")

    print("ALL OK")


if __name__ == "__main__":
    main()
