"""Round-5 pre-launch probe: true per-pass cost at recipe scale.

Builds a DeviceTrainSession over ~128 MB of the real recipe corpus at
the 249k generate vocabulary with the W=8192 pack floor (bench-
validated shapes) and times the passes the 1 GB prune actually runs:
E-step (dropout 0.05 and 0) and the Viterbi frequency pass. With the
default 6 GiB cache budget ~half the groups keep slot/seg caches and
the rest re-probe per pass — the honest steady-state mix.

Usage: recipe_probe_r5.py [mb] [dropout]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from tokengeex_tpu.core.tokenizer import Tokenizer  # noqa: E402
from tokengeex_tpu.models.unigram import Model  # noqa: E402
from tokengeex_tpu.train.device_session import DeviceTrainSession  # noqa: E402
from tokengeex_tpu.train.prune import MAX_SAMPLE_LENGTH  # noqa: E402

mb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
budget = mb << 20

tok = Tokenizer.from_file("/tmp/scale1g_tpu/v-gen.json")
model = Model(tok.model.vocab)

samples = []
got = 0
for path in ("/tmp/corpus/train/python.bin", "/tmp/corpus/train/cpp.bin"):
    with open(path, "rb") as f:
        for s in f.read(budget).split(b"\x00"):
            if s:
                samples.append(s)
                got += len(s)
                if got >= budget:
                    break
    if got >= budget:
        break
print(f"vocab {len(tok.model.vocab)}; corpus {got/1e6:.1f} MB "
      f"in {len(samples)} samples", flush=True)

t0 = time.time()
sess = DeviceTrainSession(model, samples, MAX_SAMPLE_LENGTH)
ng = len(list(sess._groups()))
print(f"session built {time.time()-t0:.1f}s width={sess.width} "
      f"groups={ng}", flush=True)

t0 = time.time()
exp = sess.e_step(model, dropout=0.05, seed=0)
print(f"e_step drop=0.05 #1 (compiles+seg builds) {time.time()-t0:.1f}s "
      f"sum={float(exp.sum()):.0f}", flush=True)
print(f"  cache_used {sess.cache_used/1e9:.2f} GB; "
      f"slot groups {len(sess.slot_cache)}, seg groups "
      f"{sum(1 for v in sess.seg_cache.values() if v is not None)}/{ng}",
      flush=True)
for i in (2, 3):
    t0 = time.time()
    exp = sess.e_step(model, dropout=0.05, seed=i)
    dt = time.time() - t0
    print(f"e_step drop=0.05 #{i} {dt:.1f}s -> {got/dt/1e6:.1f} MB/s",
          flush=True)
t0 = time.time()
exp = sess.e_step(model, dropout=0.0, seed=9)
dt = time.time() - t0
print(f"e_step drop=0    #1c {dt:.1f}s -> {got/dt/1e6:.1f} MB/s "
      f"(compile variant)", flush=True)
t0 = time.time()
exp = sess.e_step(model, dropout=0.0, seed=10)
dt = time.time() - t0
print(f"e_step drop=0    #2  {dt:.1f}s -> {got/dt/1e6:.1f} MB/s", flush=True)

t0 = time.time()
freq = sess.count_frequencies(model)
print(f"freq pass #1 (compile) {time.time()-t0:.1f}s "
      f"sum={int(freq.sum())}", flush=True)
t0 = time.time()
freq = sess.count_frequencies(model)
dt = time.time() - t0
print(f"freq pass #2 {dt:.1f}s -> {got/dt/1e6:.1f} MB/s", flush=True)
sess.close()
print("DONE", flush=True)
