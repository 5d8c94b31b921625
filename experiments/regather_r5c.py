"""Round-5 part 3: where do the 12 dropout-seconds go?

sess.e_step steady at the recipe shapes: dropout=0 -> 2.4 s,
dropout=0.05 -> 14.7 s. Components at dropout=0 total 1.3 s. Times
each cached op with and without a dropout key at the same shapes.
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

tok = Tokenizer.from_file("/tmp/scale1g_tpu/v-gen.json")
model = Model(tok.model.vocab)
samples = []
got = 0
with open("/tmp/corpus/train/python.bin", "rb") as f:
    for s in f.read(16 << 20).split(b"\x00"):
        if s:
            samples.append(s)
            got += len(s)
            if got >= (4 << 20):
                break

sess = DeviceTrainSession(model, samples, MAX_SAMPLE_LENGTH)
groups = list(sess._groups())
gi, sub = groups[0]
batch = sess._batch_for(gi, sub)
score, slots = sess._probe_group(gi, batch)
jax.block_until_ready(slots)
seg = sess._seg_for(gi, slots)
sr = sess.slot_rows
print(f"slots {slots.shape}", flush=True)

key = jax.random.PRNGKey(7)
_, sub_key = jax.random.split(key)
# Materialized (B, sid_w) drop array for the component ops.
import jax.numpy as jnp  # noqa: E402
drop_arr = jax.random.randint(sub_key, (batch.p1.shape[0],
                                        batch.sid.shape[1]),
                              minval=-(2**31), maxval=2**31 - 1,
                              dtype=jnp.int32)
jax.block_until_ready(drop_arr)

sc = lj.score_from_slots(sr, slots, sess.dtype)
A0 = lj.forward(sess.dt, batch, C=sess.chunk, dtype=sess.dtype,
                backend=sess.kernel, cache=(sc, slots))
Bt0 = lj.backward_betas(sess.dt, batch, C=sess.chunk, dtype=sess.dtype,
                        cache=(sc, slots))
jax.block_until_ready((A0, Bt0))


def timed(name, fn, n=2):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
        jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n:.3f}s", flush=True)
    return out


D = dict(drop_u=drop_arr, dropout=0.05)
timed("forward drop",
      lambda: lj.forward(sess.dt, batch, C=sess.chunk, dtype=sess.dtype,
                         backend=sess.kernel, cache=(sc, slots), **D))
timed("betas drop",
      lambda: lj.backward_betas(sess.dt, batch, C=sess.chunk,
                                dtype=sess.dtype, cache=(sc, slots), **D))
timed("segsum drop",
      lambda: lj.segsum_expected(sess.dt, batch, A0, Bt0, seg, sr,
                                 dtype=sess.dtype, **D))
timed("estep_cached drop(key)",
      lambda: lj.estep_cached(sess.dt, batch, slots, sr, seg=seg,
                              drop_u=sub_key, dropout=0.05, C=sess.chunk,
                              dtype=sess.dtype, backend=sess.kernel)[1])
timed("estep_cached drop(arr)",
      lambda: lj.estep_cached(sess.dt, batch, slots, sr, seg=seg,
                              drop_u=drop_arr, dropout=0.05, C=sess.chunk,
                              dtype=sess.dtype, backend=sess.kernel)[1])
timed("estep_cached nodrop",
      lambda: lj.estep_cached(sess.dt, batch, slots, sr, seg=seg,
                              C=sess.chunk, dtype=sess.dtype,
                              backend=sess.kernel)[1])
sess.close()
