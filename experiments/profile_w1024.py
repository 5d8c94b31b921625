"""Stage profile of the cached E-step at the 1 GB-recipe shapes
(W=1024 pack, B=4096 groups, vocab 249k): e_step steady measured
0.29 MB/s vs 11.4 MB/s at the bench shapes (W=8192, B=1024). Times
score regather / forward / betas / segsum separately on the chip.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from tokengeex_tpu.core.tokenizer import Tokenizer  # noqa: E402
from tokengeex_tpu.models.unigram import Model  # noqa: E402
from tokengeex_tpu.ops import lattice_jax as lj  # noqa: E402
from tokengeex_tpu.train.device_session import DeviceTrainSession  # noqa: E402
from tokengeex_tpu.train.prune import MAX_SAMPLE_LENGTH  # noqa: E402

vocab_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale1g_tpu/v-gen.json"
corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus/train/python.bin"
budget = int(sys.argv[3]) if len(sys.argv) > 3 else (4 << 20)

tok = Tokenizer.from_file(vocab_path)
model = Model(tok.model.vocab)
print(f"vocab {len(tok.model.vocab)}", flush=True)

samples = []
got = 0
with open(corpus, "rb") as f:
    for s in f.read(budget * 2).split(b"\x00"):
        if s:
            samples.append(s)
            got += len(s)
            if got >= budget:
                break
print(f"corpus {got/1e6:.1f} MB in {len(samples)} samples", flush=True)

sess = DeviceTrainSession(model, samples, MAX_SAMPLE_LENGTH)
print(f"width={sess.width} groups...", flush=True)

groups = list(sess._groups())
gi, sub = groups[0]
batch = sess._batch_for(gi, sub)
print(f"group rows={sub.rows} L={sess.L}", flush=True)

t0 = time.time()
score, slots = sess._probe_group(gi, batch)
jax.block_until_ready(slots)
print(f"probe (compile+first) {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
seg = sess._seg_for(gi, slots)
print(f"seg build {time.time()-t0:.1f}s nbytes={seg.nbytes()/1e6:.0f}MB"
      if seg is not None else "seg build: None", flush=True)


def timed(name, fn, n=2):
    out = fn()  # compile + first
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    mb = (sub.rows * sess.width) / 1e6
    print(f"{name}: steady {dt:.3f}s ({mb/dt:.1f} MB/s of padded rows)",
          flush=True)
    return out


sr = sess.slot_rows

timed("score_from_slots", lambda: lj.score_from_slots(sr, slots, sess.dtype))

sc = lj.score_from_slots(sr, slots, sess.dtype)
jax.block_until_ready(sc)

timed("forward (cached scores)",
      lambda: lj.forward(sess.dt, batch, C=sess.chunk, dtype=sess.dtype,
                         backend=sess.kernel, cache=(sc, slots)))

A = lj.forward(sess.dt, batch, C=sess.chunk, dtype=sess.dtype,
               backend=sess.kernel, cache=(sc, slots))
jax.block_until_ready(A)

timed("backward_betas (cached)",
      lambda: lj.backward_betas(sess.dt, batch, C=sess.chunk,
                                dtype=sess.dtype, cache=(sc, slots)))

if seg is not None:
    Bt = lj.backward_betas(sess.dt, batch, C=sess.chunk, dtype=sess.dtype,
                           cache=(sc, slots))
    jax.block_until_ready(Bt)
    timed("segsum_expected",
          lambda: lj.segsum_expected(sess.dt, batch, A, Bt, seg, sr,
                                     dtype=sess.dtype))

timed("estep_cached (one dispatch, dropout=0)",
      lambda: lj.estep_cached(sess.dt, batch, slots, sr, seg=seg,
                              C=sess.chunk, dtype=sess.dtype,
                              backend=sess.kernel)[1])
sess.close()
