"""On-chip repro of the 1 GB-recipe E-step compile OOM (round 5).

The recipe run (W=1024 pack, B=4096 row groups, 249k vocab -> packed
x16 rank rows) OOM'd compiling _op_worker: score_from_slots' former
(B, L, C) chunking produced a 33.5M-element row gather whose unfused
output is (8,128)-padded to 16 GB. This drives ONE session e_step at
exactly those shapes on the real chip to confirm the flat-budget fix.

Usage: python experiments/oom_repro_r5.py [vocab_json] [corpus_bin]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from tokengeex_tpu.core.tokenizer import Tokenizer  # noqa: E402
from tokengeex_tpu.models.unigram import Model  # noqa: E402
from tokengeex_tpu.train.device_session import DeviceTrainSession  # noqa: E402
from tokengeex_tpu.train.prune import MAX_SAMPLE_LENGTH  # noqa: E402

vocab_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale1g_tpu/v-gen.json"
corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus/train/python.bin"
budget = int(sys.argv[3]) if len(sys.argv) > 3 else (8 << 20)

tok = Tokenizer.from_file(vocab_path)
vocab = tok.model.vocab
model = Model(vocab)
print(f"vocab {len(vocab)}", flush=True)

samples = []
got = 0
with open(corpus, "rb") as f:
    for s in f.read(budget * 2).split(b"\x00"):
        if not s:
            continue
        samples.append(s)
        got += len(s)
        if got >= budget:
            break
print(f"corpus {got / 1e6:.1f} MB in {len(samples)} samples", flush=True)

t0 = time.time()
sess = DeviceTrainSession(model, samples, MAX_SAMPLE_LENGTH)
print(f"session built {time.time() - t0:.1f}s width={sess.width}", flush=True)

t0 = time.time()
exp = sess.e_step(model, dropout=0.05, seed=0)
print(f"e_step #1 (compile+run) {time.time() - t0:.1f}s "
      f"sum={float(exp.sum()):.1f}", flush=True)
t0 = time.time()
exp = sess.e_step(model, dropout=0.05, seed=1)
dt = time.time() - t0
print(f"e_step #2 (steady) {dt:.1f}s -> {got / dt / 1e6:.2f} MB/s "
      f"sum={float(exp.sum()):.1f}", flush=True)
sess.close()
