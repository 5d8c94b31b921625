#!/usr/bin/env python
"""Profile DeviceTrainSession.e_step sub-steps on the scale corpus.

Replays exactly what prune does (session probe cache, segsum counts,
dropout) but with host-synced timing per phase to find where the
0.1 MB/s (vs 5-8 MB/s raw-kernel) wall-clock goes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = float(os.environ.get("P_MB", "20"))
GEN = int(os.environ.get("P_GEN", "40000"))
DROP = float(os.environ.get("P_DROP", "0.05"))


def log(*a):
    print(*a, flush=True)


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from bench_scale import build_corpus

    from tokengeex_tpu import Model
    from tokengeex_tpu.train.generate import VocabularyGenerator
    from tokengeex_tpu.train.prune import MAX_SAMPLE_LENGTH
    from tokengeex_tpu.train.device_session import DeviceTrainSession
    from tokengeex_tpu.ops import lattice_jax as lj

    import jax
    import jax.numpy as jnp

    samples = build_corpus(int(MB * 1e6), seed=0)
    nbytes = sum(len(s) for s in samples)
    log(f"corpus {nbytes/1e6:.1f} MB, {len(samples)} samples, "
        f"longest {max(map(len, samples))}")

    allow_path = os.path.join(os.path.dirname(__file__), "..", "data",
                              "exact.regex")
    with open(allow_path) as f:
        allow = f.read().replace("\n", "")
    gen = VocabularyGenerator(max_token_length=16, insert_probability=0.01,
                              allow=allow, seed=0)
    texts = [s.decode("utf-8") for s in samples]
    t0 = time.time()
    gen.feed(texts)
    vocab = gen.generate(GEN)
    model = Model(vocab)
    log(f"vocab {len(vocab)} (feed+gen {time.time()-t0:.1f}s)")

    t0 = time.time()
    sess = DeviceTrainSession(model, samples, MAX_SAMPLE_LENGTH)
    log(f"session init {time.time()-t0:.1f}s: width={sess.width} "
        f"L={sess.L} rows={sess.packed.rows} kernel={sess.kernel} "
        f"n_dev={sess.n_dev} use_mesh={sess.use_mesh} "
        f"segsum={sess.use_segsum}")

    groups = list(sess._groups())
    log(f"{len(groups)} groups; spans per group: "
        f"{[len(sub.spans) for _, sub in groups][:8]}")

    key = jax.random.PRNGKey(0)

    # Phase-by-phase with syncs, group by group (first pass = probe).
    for pas in range(2):
        tpass = time.time()
        acc = None
        for gi, sub in groups:
            t0 = time.time()
            batch = sess._batch_for(gi, sub)
            jax.block_until_ready(batch.p1)
            t_batch = time.time() - t0

            t0 = time.time()
            score, slots = sess._probe_group(gi, batch)
            jax.block_until_ready(slots)
            t_probe = time.time() - t0

            drop_u = None
            t_drop = 0.0
            if DROP > 0.0:
                t0 = time.time()
                key, sk = jax.random.split(key)
                drop_u = jax.random.randint(
                    sk, (batch.p1.shape[0], batch.sid.shape[1]),
                    minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32)
                jax.block_until_ready(drop_u)
                t_drop = time.time() - t0

            t0 = time.time()
            A = lj.forward(sess.dt, batch, C=sess.chunk, dtype=sess.dtype,
                           backend=sess.kernel, cache=(score, slots),
                           drop_u=drop_u, dropout=DROP)
            jax.block_until_ready(A)
            t_fwd = time.time() - t0

            t0 = time.time()
            seg = sess._seg_for(gi, slots)
            if seg is not None:
                jax.block_until_ready(seg.perm)
            t_seg = time.time() - t0

            t0 = time.time()
            if seg is not None:
                Bt = lj.backward_betas(sess.dt, batch, C=sess.chunk,
                                       dtype=sess.dtype,
                                       cache=(score, slots),
                                       drop_u=drop_u, dropout=DROP)
                exp_g = lj.segsum_expected(sess.dt, batch, A, Bt, seg,
                                           sess.slot_rows, drop_u=drop_u,
                                           dropout=DROP, dtype=sess.dtype)
            else:
                exp_g = lj.backward_expected(sess.dt, batch, A,
                                             C=sess.chunk,
                                             dtype=sess.dtype,
                                             backend=sess.kernel,
                                             cache=(score, slots),
                                             drop_u=drop_u, dropout=DROP)
            jax.block_until_ready(exp_g)
            t_bwd = time.time() - t0

            t0 = time.time()
            acc = exp_g if acc is None else acc + exp_g
            spans = sub.spans
            rows_idx = np.asarray([r for (r, _, _, _, _) in spans])
            ends_idx = np.asarray([e for (_, _, e, _, _) in spans])
            z = np.asarray(A[rows_idx, ends_idx])
            t_z = time.time() - t0

            log(f"  pass{pas} g{gi}: batch {t_batch:.2f} probe {t_probe:.2f} "
                f"drop {t_drop:.2f} fwd {t_fwd:.2f} seg {t_seg:.2f} "
                f"bwd+cnt {t_bwd:.2f} zfetch {t_z:.2f} "
                f"(seg={'y' if seg is not None else 'n'}, "
                f"rows={batch.p1.shape[0]})")
        t0 = time.time()
        expected = lj.fold_expected(sess.dt, np.asarray(jax.device_get(acc)))
        log(f"pass{pas} TOTAL {time.time()-tpass:.1f}s "
            f"(fold {time.time()-t0:.2f}s) cache_used="
            f"{sess.cache_used/1e9:.2f}GB slot_groups={len(sess.slot_cache)} "
            f"seg_groups={len(sess.seg_cache)}")


if __name__ == "__main__":
    main()
