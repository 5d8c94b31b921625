"""Round-5 regather shootout, part 2: index-distribution sensitivity.

Part 1 showed every formulation stuck at ~0.065 G rows/s on REAL slot
data while the round-4 microbench (uniform indices) measured 0.154+.
Hypothesis: real cached slots are extremely skewed — ~75% of lookups
are misses hitting the SINGLE sentinel row, and hit ranks follow a
Zipf — so the gather engine serializes on hot rows.

Variants (x16 packed table, 16k rows, ys-scan N=2^21):
  R  real slots (baseline from part 1)
  U  uniform random indices, same count
  S  miss-spread: miss lookups redirected to iota & (n_pad-1), result
     masked to NEG — spreads 75% of traffic over the whole table
  Z  hits-only density check: real slots with misses removed up front
     (gather count = hit count), measures the hit-skew floor
  T8 table replicated 8x (128k rows), index += (iota & 7) * stride —
     spreads even hot-rank traffic 8 ways
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
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
_, slots = sess._probe_group(gi, batch)
jax.block_until_ready(slots)
sr = sess.slot_rows
n_pad = sess.rank.n_pad
total = int(np.prod(slots.shape))
print(f"slots {slots.shape} n_pad {n_pad} rows {sr.shape}", flush=True)

flat_real = slots.reshape(-1)
host = np.asarray(flat_real)
miss_frac = float((host >= n_pad).mean())
# top-row concentration among hits
hits = host[host < n_pad]
rows_of_hits = hits >> 4
uniq, cnt = np.unique(rows_of_hits, return_counts=True)
top = np.sort(cnt)[::-1]
print(f"miss_frac {miss_frac:.3f}; hit rows used {uniq.size}; "
      f"top-8 row share {top[:8].sum()/max(1,hits.size):.3f}", flush=True)

NEG = jnp.float32(lj.NEG_INF)


def norm(s):
    return jnp.where(s <= -1.0e38, NEG, s)


def lookup16(rows, sl):
    sl = sl.astype(jnp.int32)
    row = jax.lax.shift_right_logical(sl, jnp.int32(4))
    col = sl & jnp.int32(15)
    r = jnp.take(rows, row, axis=0)
    bits = r[..., 15]
    for k in range(15):
        bits = jnp.where(col == jnp.int32(k), r[..., k], bits)
    return norm(jax.lax.bitcast_convert_type(bits, jnp.float32))


@functools.partial(jax.jit, static_argnames=("N",))
def v_ys(rows, flat, N):
    def body(_, i):
        return None, lookup16(rows, jax.lax.dynamic_slice(flat, (i * N,), (N,)))
    _, ys = jax.lax.scan(body, None, jnp.arange(flat.shape[0] // N))
    return ys.reshape(-1)


@functools.partial(jax.jit, static_argnames=("N", "n_pad"))
def v_spread(rows, flat, N, n_pad):
    def body(_, i):
        sl = jax.lax.dynamic_slice(flat, (i * N,), (N,)).astype(jnp.int32)
        miss = sl >= jnp.int32(n_pad)
        spread = jax.lax.iota(jnp.int32, N) & jnp.int32(n_pad - 1)
        g = lookup16(rows, jnp.where(miss, spread, sl))
        return None, jnp.where(miss, NEG, g)
    _, ys = jax.lax.scan(body, None, jnp.arange(flat.shape[0] // N))
    return ys.reshape(-1)


@functools.partial(jax.jit, static_argnames=("N", "stride"))
def v_rep8(rows8, flat, N, stride):
    def body(_, i):
        sl = jax.lax.dynamic_slice(flat, (i * N,), (N,)).astype(jnp.int32)
        sl = sl + (jax.lax.iota(jnp.int32, N) & jnp.int32(7)) * jnp.int32(stride)
        return None, lookup16(rows8, sl)
    _, ys = jax.lax.scan(body, None, jnp.arange(flat.shape[0] // N))
    return ys.reshape(-1)


def timed(name, fn, n=3, check=None):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    cnt = out.shape[0]
    ok = ""
    if check is not None:
        ok = "OK" if np.array_equal(np.asarray(out), check) else "MISMATCH"
    print(f"{name}: {dt*1e3:7.1f} ms  {cnt/dt/1e9:.3f} G rows/s  {ok}",
          flush=True)
    return np.asarray(out)


ref = timed("R real       ", lambda: v_ys(sr, flat_real, N=1 << 21))

rng = np.random.default_rng(0)
flat_u = jnp.asarray(rng.integers(0, n_pad, total, dtype=np.int32))
timed("U uniform    ", lambda: v_ys(sr, flat_u, N=1 << 21))

timed("S miss-spread", lambda: v_spread(sr, flat_real, N=1 << 21,
                                        n_pad=n_pad), check=ref)

nz = hits.size
nz_pad = -(-nz // (1 << 21)) * (1 << 21)
flat_h = np.zeros(nz_pad, np.int32)
flat_h[:nz] = hits
flat_h = jnp.asarray(flat_h)
timed(f"Z hits-only ({nz/1e6:.0f}M)", lambda: v_ys(sr, flat_h, N=1 << 21))

# 8x replicated table: entries stride apart
sr_np = np.asarray(sr)
stride_entries = sr_np.shape[0] * 16  # includes sentinel row
rows8 = np.tile(sr_np, (8, 1))
rows8 = jnp.asarray(rows8)
timed("T8 rep8 real ", lambda: v_rep8(rows8, flat_real, N=1 << 21,
                                      stride=stride_entries), check=ref)
sess.close()
