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

    # Real session passes, timed end-to-end, with prune-like rebinds.
    import jax

    models = [model]
    for k in range(3):
        v = models[-1].vocab
        singles = [t for t in v if len(t.value) == 1]
        multi = [t for t in v if len(t.value) > 1]
        models.append(Model(singles + multi[: max(0, len(multi) - 2000)]))

    for pas in range(4):
        m = models[min(pas, len(models) - 1)]
        t0 = time.time()
        expected = sess.e_step(m, DROP, seed=pas)
        log(f"e_step pass{pas} vocab={m.vocab_size()}: "
            f"{time.time()-t0:.1f}s  (cache={sess.cache_used/1e9:.2f}GB "
            f"slot={len(sess.slot_cache)} seg={len(sess.seg_cache)})")
    t0 = time.time()
    freqs = sess.count_frequencies(models[-1])
    log(f"count_frequencies: {time.time()-t0:.1f}s")
    t0 = time.time()
    freqs = sess.count_frequencies(models[-1])
    log(f"count_frequencies warm: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
