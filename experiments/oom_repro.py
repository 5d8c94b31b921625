"""Reproduce the 100MB/100k-vocab session e_step OOM with per-group
progress so we can see which group (and which pass) dies."""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)

mb = float(os.environ.get("TGX_REPRO_MB", "100"))
vocab_size = int(os.environ.get("TGX_REPRO_VOCAB", "100000"))

from scripts.bench_scale import build_corpus  # noqa: E402

train = build_corpus(int(mb * 1e6), seed=0)
nbytes = sum(len(s) for s in train)
print(f"corpus {nbytes/1e6:.1f} MB, {len(train)} samples", flush=True)

from tokengeex_tpu import Model  # noqa: E402
from tokengeex_tpu.train.generate import VocabularyGenerator  # noqa: E402

gen = VocabularyGenerator(max_token_length=16, insert_probability=0.05,
                          allow=None, seed=0)
# Feed a slice: enough distinct substrings to fill the vocab.
texts = [s.decode("utf-8") for s in train[: len(train) // 5]]
t0 = time.time()
gen.feed(texts)
print(f"feed {time.time()-t0:.1f}s, {gen.current_size()} candidates",
      flush=True)
vocab = gen.generate(vocab_size)
model = Model(vocab)
print(f"vocab {len(vocab)}", flush=True)

from tokengeex_tpu.train.device_session import DeviceTrainSession  # noqa: E402

t0 = time.time()
sess = DeviceTrainSession(model, train, max_snippet=81920)
print(f"session built {time.time()-t0:.1f}s: width={sess.width} "
      f"rows={sess.packed.rows} L={sess.L}", flush=True)

# Patch per-group logging around the group loop.
orig = sess._probe_group


def probe_logged(gi, batch):
    print(f"  probe group {gi} (cached={gi in sess.slot_cache}, "
          f"cache_used={sess.cache_used/1e9:.2f}GB)", flush=True)
    return orig(gi, batch)


sess._probe_group = probe_logged

t0 = time.time()
exp = sess.e_step(model, dropout=0.05, seed=1)
print(f"e_step pass 1: {time.time()-t0:.1f}s "
      f"({nbytes/1e6/(time.time()-t0):.1f} MB/s)", flush=True)
t0 = time.time()
exp = sess.e_step(model, dropout=0.05, seed=2)
print(f"e_step pass 2 (cached): {time.time()-t0:.1f}s "
      f"({nbytes/1e6/(time.time()-t0):.1f} MB/s)", flush=True)
print("expected sum", float(exp.sum()), flush=True)
