"""Round-5 regather shootout at the 1 GB-recipe shapes.

score_from_slots measured 0.064 G rows/s (1.05 s / 67M lookups) after
the flat-budget OOM fix — the gather no longer fuses. Candidates:

  D  current: lax.scan, carry dynamic_update_slice, N=2^19
  A  scan-ys: lax.scan emitting per-chunk ys (no carry aliasing)
  C  carry, N=2^21
  B  x128 rows: table reshaped (n/128, 128); gather 128-wide rows
     (tile-aligned, no pad) + 7-level binary select tree
  E  x128 rows + take_along_axis word select

Also re-times sess.e_step steady (dropout 0.05 and 0.0) to explain the
28.8 s repro number vs 1.2 s of component time.
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
print(f"vocab {len(tok.model.vocab)} corpus {got/1e6:.1f} MB", flush=True)

sess = DeviceTrainSession(model, samples, MAX_SAMPLE_LENGTH)
groups = list(sess._groups())
gi, sub = groups[0]
batch = sess._batch_for(gi, sub)
_, slots = sess._probe_group(gi, batch)
jax.block_until_ready(slots)
sr = sess.slot_rows  # (16385, 16) packed
B, L, W = slots.shape
total = B * L * W
print(f"slots {slots.shape} = {total/1e6:.0f}M lookups, rows {sr.shape}",
      flush=True)

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
def v_carry(rows, flat, N):
    def body(out, i):
        s = lookup16(rows, jax.lax.dynamic_slice(flat, (i * N,), (N,)))
        return jax.lax.dynamic_update_slice(out, s, (i * N,)), None
    out, _ = jax.lax.scan(body, jnp.zeros(flat.shape, jnp.float32),
                          jnp.arange(flat.shape[0] // N))
    return out


@functools.partial(jax.jit, static_argnames=("N",))
def v_ys(rows, flat, N):
    def body(_, i):
        return None, lookup16(rows, jax.lax.dynamic_slice(flat, (i * N,), (N,)))
    _, ys = jax.lax.scan(body, None, jnp.arange(flat.shape[0] // N))
    return ys.reshape(-1)


def pack128(sr16):
    flat = np.asarray(sr16)[:-1].reshape(-1)  # n_pad int32 bits
    n = flat.shape[0]
    npad = -(-n // 128) * 128
    neg_bits = np.array([lj.NEG_INF], np.float32).view(np.int32)[0]
    col = np.full(npad + 128, neg_bits, dtype=np.int32)
    col[:n] = flat
    return jnp.asarray(col.reshape(-1, 128))


@functools.partial(jax.jit, static_argnames=("N",))
def v128_tree(rows128, flat, N):
    def sel(r, col):
        # 7-level binary tree over the 128-word row
        for k in range(7):
            w = r.shape[-1] // 2
            take_hi = ((col >> jnp.int32(6 - k)) & jnp.int32(1)).astype(bool)
            r = jnp.where(take_hi[..., None], r[..., w:], r[..., :w])
        return r[..., 0]

    def body(_, i):
        sl = jax.lax.dynamic_slice(flat, (i * N,), (N,)).astype(jnp.int32)
        row = jax.lax.shift_right_logical(sl, jnp.int32(7))
        col = sl & jnp.int32(127)
        r = jnp.take(rows128, row, axis=0)
        bits = sel(r, col)
        return None, norm(jax.lax.bitcast_convert_type(bits, jnp.float32))
    _, ys = jax.lax.scan(body, None, jnp.arange(flat.shape[0] // N))
    return ys.reshape(-1)


@functools.partial(jax.jit, static_argnames=("N",))
def v128_take(rows128, flat, N):
    def body(_, i):
        sl = jax.lax.dynamic_slice(flat, (i * N,), (N,)).astype(jnp.int32)
        row = jax.lax.shift_right_logical(sl, jnp.int32(7))
        col = sl & jnp.int32(127)
        r = jnp.take(rows128, row, axis=0)
        bits = jnp.take_along_axis(r, col[:, None], axis=1)[:, 0]
        return None, norm(jax.lax.bitcast_convert_type(bits, jnp.float32))
    _, ys = jax.lax.scan(body, None, jnp.arange(flat.shape[0] // N))
    return ys.reshape(-1)


flat = slots.reshape(-1)
rows128 = pack128(sr)
print(f"rows128 {rows128.shape}", flush=True)

ref = None
for name, fn in [
    ("D carry 2^19", lambda: v_carry(sr, flat, N=1 << 19)),
    ("C carry 2^21", lambda: v_carry(sr, flat, N=1 << 21)),
    ("A ys    2^19", lambda: v_ys(sr, flat, N=1 << 19)),
    ("A ys    2^21", lambda: v_ys(sr, flat, N=1 << 21)),
    ("B x128 tree 2^19", lambda: v128_tree(rows128, flat, N=1 << 19)),
    ("B x128 tree 2^21", lambda: v128_tree(rows128, flat, N=1 << 21)),
    ("E x128 take 2^21", lambda: v128_take(rows128, flat, N=1 << 21)),
]:
    try:
        out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = fn()
            jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        if ref is None:
            ref = np.asarray(out)
            ok = "ref"
        else:
            ok = "OK" if np.array_equal(np.asarray(out), ref) else "MISMATCH"
        print(f"{name}: {dt*1e3:7.1f} ms  {total/dt/1e9:.3f} G rows/s  [{ok}]",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

# e_step steady breakdown
for dr in (0.05, 0.0):
    sess.e_step(model, dropout=dr, seed=0)
    t0 = time.time()
    sess.e_step(model, dropout=dr, seed=1)
    print(f"sess.e_step(dropout={dr}) steady {time.time()-t0:.1f}s "
          f"({got/1e6/(time.time()-t0):.1f} MB/s)", flush=True)
sess.close()
