"""VERDICT r3 item 7: the 500k-vocab configuration
(reference README.md:155-176 trains generate->500k). Builds a
500k-token vocabulary, times TokenTable.build + rebind + the
DeviceTables derivation, and reports table/HBM sizes. Run with
JAX_PLATFORMS=cpu for the host-side numbers; on the chip it also
uploads the tables and runs one small e-step to prove the session
binds at this scale."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from tokengeex_tpu.core.types import ScoredToken
    from tokengeex_tpu.ops.match_table import TokenTable

    rng = np.random.default_rng(0)
    V = int(os.environ.get("TGX_V", 500_000))
    # Realistic byte-length mix (generate max_token_length 16).
    vocab = [ScoredToken(bytes([b]), -10.0) for b in range(256)]
    seen = set(t.value for t in vocab)
    syll = [b"an", b"er", b"ti", b"on", b"ra", b"lo", b"de", b"mi",
            b"cu", b"va", b"be", b"so", b"ne", b"pa", b"ge", b"st"]
    while len(vocab) < V:
        n = rng.integers(1, 8)
        w = b"".join(syll[i] for i in rng.integers(0, 16, n))[:16]
        if w not in seen:
            seen.add(w)
            vocab.append(ScoredToken(w, float(-2 - 10 * rng.random())))
    print(f"vocab: {len(vocab)} tokens", flush=True)

    t0 = time.time()
    tbl = TokenTable.build(vocab)
    t_build = time.time() - t0
    sizes = dict(
        t1=tbl.t1.nbytes, t2=tbl.t2.nbytes,
        bk=(tbl.bk.nbytes if tbl.bk is not None else 0))
    print(f"build: {t_build:.1f}s bits={tbl.bits} bk_bits={tbl.bk_bits} "
          f"L={tbl.max_token_len} host bytes={sum(sizes.values())/1e6:.0f}MB",
          flush=True)

    # Rebind at a shrunk vocabulary (every EM round does this).
    keep = [t for i, t in enumerate(vocab) if len(t.value) == 1 or i % 5]
    t0 = time.time()
    tbl2 = tbl.rebind(keep)
    print(f"rebind to {len(keep)}: {time.time()-t0:.1f}s", flush=True)

    import jax
    import jax.numpy as jnp
    from tokengeex_tpu.ops import lattice_jax as lj

    t0 = time.time()
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
    jax.block_until_ready(dt.t_bucket)
    hbm = sum(int(np.prod(a.shape)) * 4 for a in
              (dt.t1_fast, dt.t2_fast, dt.t1_exact, dt.t2_exact,
               dt.t_bucket) if a is not None)
    print(f"DeviceTables derive+upload: {time.time()-t0:.1f}s "
          f"device bytes={hbm/1e6:.0f}MB vscan={lj.has_vscan(dt)} "
          f"platform={jax.devices()[0].platform}", flush=True)

    if os.environ.get("TGX_500K_ESTEP", "0") == "1":
        from tokengeex_tpu.models.unigram import Model
        from tokengeex_tpu.train.device_session import DeviceTrainSession

        words = [t.value for t in vocab[256:2000]]
        samples = [b" ".join(words[i] for i in rng.integers(0, len(words),
                                                            rng.integers(3, 9)))
                   for _ in range(2000)]
        model = Model(vocab)
        t0 = time.time()
        sess = DeviceTrainSession(model, samples, max_snippet=1024)
        e = sess.e_step(model, 0.05, 0)
        print(f"500k-session e-step ({sum(map(len, samples))/1e6:.1f}MB "
              f"corpus): {time.time()-t0:.1f}s total={e.sum():.0f}",
              flush=True)
        sess.close()


if __name__ == "__main__":
    main()
