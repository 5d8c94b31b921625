"""Measure the session e_step's true HBM peak by ballast bisection:
hold K 1-GB arrays, run a small session e_step; on OOM drop 1 GB and
retry (compiled executables are reused in-process). First K that
passes => peak ~= capacity(15GB) - K - corpus-resident."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mb = float(os.environ.get("TGX_CEIL_MB", "24"))
vocab_size = int(os.environ.get("TGX_CEIL_VOCAB", "100000"))
start_ballast = int(os.environ.get("TGX_CEIL_BALLAST", "12"))

from scripts.bench_scale import build_corpus  # noqa: E402

train = build_corpus(int(mb * 1e6), seed=0)
nbytes = sum(len(s) for s in train)
print(f"corpus {nbytes/1e6:.1f} MB", flush=True)

from tokengeex_tpu import Model  # noqa: E402
from tokengeex_tpu.train.generate import VocabularyGenerator  # noqa: E402

gen = VocabularyGenerator(max_token_length=16, insert_probability=0.2,
                          allow=None, seed=0)
gen.feed([s.decode("utf-8") for s in train[: len(train) // 8]])
vocab = gen.generate(vocab_size)
model = Model(vocab)
print(f"vocab {len(vocab)}", flush=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tokengeex_tpu.train.device_session import DeviceTrainSession  # noqa: E402

sess = DeviceTrainSession(model, train, max_snippet=81920)
print(f"width={sess.width} rows={sess.packed.rows} L={sess.L}", flush=True)

N = 1 << 28


@jax.jit
def make(x):
    return jnp.full((N,), x, jnp.float32)


for k in range(start_ballast, -1, -1):
    ballast = []
    # fresh pass each try: clear caches so the probe re-runs
    sess.slot_cache.clear()
    sess.cache_used = 0
    try:
        for i in range(k):
            b = make(jnp.float32(i))
            jax.device_get(b[:1])
            ballast.append(b)
        t0 = time.time()
        exp = sess.e_step(model, dropout=0.05, seed=1)
        dt = time.time() - t0
        print(f"PASS with ballast {k} GB ({dt:.1f}s, "
              f"{nbytes/1e6/dt:.1f} MB/s) -> e_step peak <= "
              f"{15 - k} GB incl. caches", flush=True)
        break
    except Exception as e:
        print(f"OOM with ballast {k} GB (held {len(ballast)}): "
              f"{str(e)[:80]}", flush=True)
        del ballast
        time.sleep(5)  # let in-flight failed work drain
