#!/usr/bin/env python
"""Locate the ~20s gap between raw fused dispatches (~9s) and
DeviceTrainSession.e_step (~29s) at 20 MB / 40k vocab."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from bench_scale import build_corpus

    import jax

    from tokengeex_tpu import Model
    from tokengeex_tpu.train.generate import VocabularyGenerator
    from tokengeex_tpu.train.prune import MAX_SAMPLE_LENGTH
    from tokengeex_tpu.train import device_session as ds
    from tokengeex_tpu.ops import lattice_jax as lj

    samples = build_corpus(int(20e6), seed=0)
    with open(os.path.join(os.path.dirname(__file__), "..", "data",
                           "exact.regex")) as f:
        allow = f.read().replace("\n", "")
    gen = VocabularyGenerator(max_token_length=16, insert_probability=0.01,
                              allow=allow, seed=0)
    gen.feed([s.decode("utf-8") for s in samples])
    model = Model(gen.generate(40000))

    sess = ds.DeviceTrainSession(model, samples, MAX_SAMPLE_LENGTH)

    # Time every interesting callable via wrappers (device calls get a
    # device_get sync so the time lands on the right line).
    def wrap(obj, name, sync=None):
        orig = getattr(obj, name)

        def timed(*a, **k):
            t0 = time.time()
            r = orig(*a, **k)
            if sync is not None:
                sync(r)
            dt = time.time() - t0
            if dt > 0.05:
                print(f"    {name}: {dt:.2f}s", flush=True)
            return r
        setattr(obj, name, timed)

    wrap(lj, "estep_cached", lambda r: jax.device_get(r[1][:1]))
    wrap(lj, "fold_expected")
    wrap(lj, "pick_span_values_device",
         lambda r: jax.device_get(r[:1]))
    wrap(sess, "_rebind")
    wrap(sess, "_batch_for", lambda r: jax.device_get(r.p1[:1, :1]))
    wrap(sess, "_seg_for")

    models = [model]
    v = model.vocab
    singles = [t for t in v if len(t.value) == 1]
    multi = [t for t in v if len(t.value) > 1]
    models.append(Model(singles + multi[: len(multi) - 2000]))
    v2 = models[1].vocab
    multi2 = [t for t in v2 if len(t.value) > 1]
    models.append(Model(singles + multi2[: len(multi2) - 2000]))

    seq = [0, 1, 1, 2]
    for pas in range(4):
        m = models[seq[pas]]
        t0 = time.time()
        sess.e_step(m, 0.05, seed=pas)
        print(f"e_step pass{pas}: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
