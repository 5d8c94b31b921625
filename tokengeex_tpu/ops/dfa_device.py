"""Device byte-DFA: the generate stage's allow-regex on TPU.

The reference tests every substring of every sample against the allow
regex with a host regex engine (reference: src/generate.rs:80-111). The
byte-DFA table (core/redfa.py) turns that into L table-gather steps per
position over the whole padded batch — the designated device kernel for
the generate feed (SURVEY.md section 7.6), reusable for merge allow
batch checks.

The device computes the full (sample, pos, len) candidate mask —
allow-match AND insert-probability coin AND char boundaries — so the
host only extracts and set-dedups the sparse passing substrings
(p = 0.01-0.1 in the reference recipes).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import numpy as np

from ..core.redfa import ByteDFA


@dataclasses.dataclass(frozen=True)
class DeviceDFA:
    next_flat: object  # (num_states * 256,) int32 device array
    accept: object  # (num_states,) bool device array
    start: int
    num_states: int

    @staticmethod
    def from_byte_dfa(dfa: ByteDFA) -> "DeviceDFA":
        import jax.numpy as jnp

        return DeviceDFA(
            next_flat=jnp.asarray(
                np.ascontiguousarray(dfa.next, dtype=np.int32).reshape(-1)),
            accept=jnp.asarray(dfa.accept),
            start=dfa.start,
            num_states=dfa.next.shape[0],
        )


def match_lengths_device(ddfa: DeviceDFA, bytes_arr, max_len: int):
    """allowed[b, l-1, p]: whether bytes_arr[b, p:p+l] full-matches.

    bytes_arr: (B, W) uint8 device array (0-padded). Walks all start
    positions in lockstep: L sequential steps of one table gather per
    position (the padding byte 0 walks into whatever state byte 0
    leads to; callers mask out-of-range (p, l) pairs themselves)."""
    import jax
    import jax.numpy as jnp

    B, W = bytes_arr.shape
    b32 = bytes_arr.astype(jnp.int32)
    states = jnp.full((B, W), ddfa.start, dtype=jnp.int32)
    outs = []
    for l in range(1, max_len + 1):
        if l <= W:
            stepped = jnp.pad(b32[:, l - 1 :], ((0, 0), (0, l - 1)))
            states = jnp.take(ddfa.next_flat,
                              states * 256 + stepped, axis=0)
            ok = jnp.take(ddfa.accept, states, axis=0)
            # positions where p + l > W never match
            valid = jnp.arange(W, dtype=jnp.int32)[None, :] + l <= W
            outs.append(ok & valid)
        else:
            outs.append(jnp.zeros((B, W), dtype=bool))
    return jnp.stack(outs, axis=1)  # (B, L, W)


def candidate_mask_device(
    ddfa: DeviceDFA,
    bytes_arr,
    valid_len,  # (B,) int32 actual sample lengths
    max_len: int,
    insert_probability: float,
    seed: int,
):
    """Full generate-feed candidate mask on device: allow-match, both
    ends on char boundaries, inside the sample, and an independent
    insert-probability coin per (sample, pos, len)
    (reference: src/generate.rs:69-115)."""
    import jax
    import jax.numpy as jnp

    B, W = bytes_arr.shape
    if ddfa is None:  # no allow regex: every substring qualifies
        allowed = jnp.ones((B, max_len, W), dtype=bool)
    else:
        allowed = match_lengths_device(ddfa, bytes_arr, max_len)

    b32 = bytes_arr.astype(jnp.int32)
    is_char_start = (b32 & 0xC0) != 0x80  # (B, W)
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    inside_start = (pos < valid_len[:, None]) & is_char_start
    ends = []
    for l in range(1, max_len + 1):
        end = pos + l
        if l <= W:
            nxt_start = jnp.pad(is_char_start[:, l:], ((0, 0), (0, l)))
        else:
            nxt_start = jnp.zeros((B, W), dtype=bool)
        ok = (end < valid_len[:, None]) & nxt_start
        ok = ok | (end == valid_len[:, None])
        ends.append(ok)
    end_ok = jnp.stack(ends, axis=1)  # (B, L, W)

    if insert_probability >= 1.0:
        coin = jnp.ones((B, max_len, W), dtype=bool)
    else:
        key = jax.random.PRNGKey(seed)
        u = jax.random.uniform(key, (B, max_len, W))
        coin = u < insert_probability

    return allowed & coin & inside_start[:, None, :] & end_ok


def _device_dfa_for(dfa: ByteDFA) -> "DeviceDFA":
    """Upload the DFA tables once per ByteDFA (cached on the object)."""
    cached = getattr(dfa, "_tgx_device_dfa", None)
    if cached is None:
        cached = DeviceDFA.from_byte_dfa(dfa)
        dfa._tgx_device_dfa = cached
    return cached


def _packed_mask_fn(max_len: int, insert_probability: float, W8: int,
                    with_dfa: bool):
    """Module-cached jitted mask kernel: the DFA tables are traced
    ARGUMENTS (not closure constants), so repeated feed calls — every
    per-batch `VocabularyGenerator.feed` on a pod shard — reuse one
    compiled executable instead of paying a fresh remote compile
    (observed ~10 s/call over the dev tunnel vs ~1 s of compute)."""
    key = (max_len, float(insert_probability), W8, with_dfa)
    fn = _MASK_FNS.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(4, 5))
    def packed_mask(next_flat, accept, arr, lens, start, num_states,
                    seed_s):
        ddfa = (
            DeviceDFA(next_flat=next_flat, accept=accept, start=start,
                      num_states=num_states)
            if with_dfa else None)
        mask = candidate_mask_device(ddfa, arr, lens, max_len,
                                     insert_probability, seed_s)
        B = arr.shape[0]
        m = mask.reshape(B, max_len, W8 // 8, 8)
        weights = (1 << jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint32)
        return (m.astype(jnp.uint32) * weights).sum(
            axis=-1).astype(jnp.uint8)

    _MASK_FNS[key] = packed_mask
    return packed_mask


# Module-level executable cache: one jit wrapper per (L, p, W8,
# num_states) combination. Training runs see a handful of entries; a
# long-lived SERVICE compiling many distinct allow-regexes should call
# clear_mask_fns() between tenants (ADVICE r3).
_MASK_FNS: dict = {}


def clear_mask_fns() -> None:
    """Drop the cached device mask executables (frees their HBM)."""
    _MASK_FNS.clear()


def _mask_groups(
    dfa: ByteDFA,
    samples: Sequence[bytes],
    max_len: int,
    insert_probability: float,
    seed: int,
    group_bytes: int,
):
    """Yield (g0, chunk, rows, lens, packed_mask_bytes) per row group.

    The device computes the dense candidate mask and bit-packs it (the
    host link sees L/8 bytes per corpus byte instead of L bools). Row
    width and group height are bucketed to powers of two so one
    compiled shape serves every group of this call AND later calls
    with similar batches (per-shard pod feeds)."""
    import jax.numpy as jnp

    ddfa = _device_dfa_for(dfa) if dfa is not None else None
    W = max((len(s) for s in samples), default=1)
    W8 = max(512, 1 << (max(W, 1) - 1).bit_length())
    # Round DOWN to a power of two: the cross-call executable reuse of
    # _packed_mask_fn keys on B, and a non-pow2 group_bytes would
    # otherwise leak a non-bucketed B per caller (ADVICE r3).
    rows_per_group = max(1, group_bytes // W8)
    rows_per_group = 1 << (rows_per_group.bit_length() - 1)
    B = min(rows_per_group,
            1 << max(0, (len(samples) - 1)).bit_length())
    fn = _packed_mask_fn(max_len, insert_probability, W8,
                         ddfa is not None)
    if ddfa is None:
        nf = jnp.zeros((256,), jnp.int32)
        ac = jnp.zeros((1,), bool)
        start, num_states = 0, 1
    else:
        nf, ac = ddfa.next_flat, ddfa.accept
        start, num_states = ddfa.start, ddfa.num_states

    for g0 in range(0, len(samples), B):
        chunk = samples[g0 : g0 + B]
        arr = np.zeros((B, W8), dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int32)
        for i, s in enumerate(chunk):
            arr[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            lens[i] = len(s)
        packed = fn(nf, ac, jnp.asarray(arr), jnp.asarray(lens),
                    start, num_states, jnp.uint32(seed + g0))
        yield g0, chunk, arr, lens, np.asarray(packed)


def feed_candidates_device(
    dfa: ByteDFA,
    samples: Sequence[bytes],
    max_len: int,
    insert_probability: float,
    seed: int,
    group_bytes: int = 1 << 23,
) -> List[set]:
    """Per-sample sets of passing candidate substrings (the generate
    feed's document-frequency units). Device computes the dense mask;
    host extracts the sparse survivors."""
    out: List[set] = [set() for _ in samples]
    for g0, chunk, arr, lens, packed in _mask_groups(
            dfa, samples, max_len, insert_probability, seed, group_bytes):
        B, W8 = arr.shape
        bits = np.unpackbits(packed, axis=-1,
                             bitorder="little").reshape(B, max_len, W8)
        bs, ls, ps = np.nonzero(bits)
        for b, l, p in zip(bs, ls, ps):
            if b < len(chunk):
                out[g0 + b].add(chunk[b][p : p + l + 1])
    return out


def feed_counts_device(
    dfa: ByteDFA,
    samples: Sequence[bytes],
    max_len: int,
    insert_probability: float,
    seed: int,
    group_bytes: int = 1 << 23,
):
    """Document-frequency Counter over passing candidates: the threaded
    native drain (native/tokengeex_native.cpp tg_mask_count) extracts
    and per-sample-dedups the mask survivors without materializing a
    Python object per substring — the host-side cost that otherwise
    caps the device feed. Falls back to the set drain without the
    native library. Token keys are str (candidates are char-aligned)."""
    from collections import Counter

    from ..utils import nativelib

    if nativelib.get_lib() is None:
        out: Counter = Counter()
        for cset in feed_candidates_device(dfa, samples, max_len,
                                           insert_probability, seed,
                                           group_bytes):
            out.update({c.decode("utf-8") for c in cset})
        return out

    counts: Counter = Counter()
    for g0, chunk, arr, lens, packed in _mask_groups(
            dfa, samples, max_len, insert_probability, seed, group_bytes):
        nb = len(chunk)
        idx = np.arange(nb, dtype=np.int64)
        counts.update(nativelib.mask_count(
            arr, packed,
            span_row=idx,
            span_start=np.zeros(nb, dtype=np.int64),
            span_body=lens[:nb].astype(np.int64),
            span_sid=g0 + idx,  # one span per sample: trivially grouped
        ))
    return counts
