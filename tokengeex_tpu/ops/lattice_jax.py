"""Device lattice ops: Viterbi + forward-backward EM as chunked scans.

TPU-native replacement for the reference's pointer-based lattice
(reference: src/lattice.rs, src/model.rs:59-129). The dynamic lattice
becomes dense tensors over a packed byte stream:

  - substrings are matched against the vocabulary with 2 cuckoo-table
    row gathers per (position, length) — see ops/match_table.py;
  - the Viterbi DP  dp[p] = max_l dp[p-l] + score(p-l, l)  and the EM
    forward/backward  A[p] = LSE_l A[p-l] + score  become scans over
    positions carrying only the last-L DP values (the recurrence depth
    is bounded by the max token length L);
  - sample boundaries inside the packed stream reset the DP, which
    reproduces the reference's independent-snippet semantics
    (reference: src/prune.rs:75-83) with fully static shapes.

Structure: an outer `lax.scan` over position-chunks materializes the
match tables for C positions at a time (memory-bounded), an inner
unrolled scan does the sequential relaxation. A Pallas kernel with the
same interface provides the speed-of-light path on TPU.

Tie-breaking matches the reference exactly: candidates for a dp cell
arrive in ascending start position = descending token length, relaxed
on strictly-greater, so ties keep the longest token
(reference: src/model.rs:83-110); we reproduce this with a
reversed-axis argmax (first max wins = largest l).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import NoPathError
from ..utils.packing import PackedBatch
from . import hashing as H
from .match_table import TokenTable

NEG_INF = float("-inf")

import os as _os


def vscan_max_bits() -> int:
    """Largest cuckoo table (log2 entries per side) that gets the
    in-VMEM fused-probe layout. At bits=b each side's (check, score)
    pre-broadcast arrays cost 2^b * 64 B of VMEM and the in-kernel scan
    visits 2^b / 128 rows per probe tile — measured break-even vs the
    XLA HBM row gather is around 2^17 total entries, with VMEM capacity
    binding first (4 arrays at bits=15 = 4 MB of the ~16 MB core)."""
    return int(_os.environ.get("TGX_VSCAN_BITS", "15"))


@dataclasses.dataclass(frozen=True)
class DeviceBatch:
    """Device-resident packed corpus (see utils/packing.py)."""

    p1: jax.Array  # (B, L + W+1 + L) int32 prefix hashes (R1), offset L
    p2: jax.Array  # same for R2
    sid: jax.Array  # (B, L + W + L) int32 sample ids, -2 out of range
    is_start: jax.Array  # (B, W+1) bool
    is_end: jax.Array  # (B, W+1) bool
    end_index: jax.Array  # (B, W) int32
    rinv1: jax.Array  # (L + W,) int32: R1^-p at offset L
    rinv2: jax.Array  # (L + W,) int32
    width: int
    pad: int  # = L used for padding offsets


@dataclasses.dataclass(frozen=True)
class DeviceTables:
    """Cuckoo tables in ROW-GATHER layout.

    Measured on v5e: a single-word gather runs at ~0.14 G elem/s, but a
    multi-column ROW gather from an (H, k) table runs at ~0.39 G rows/s
    for k up to at least 4 — rows are ~2.8x cheaper than words AND carry
    2-4 words for free. Every probe therefore fetches one row per
    table:

      fast:  (H, 2) rows [check = fp2, f32 score bits] — exact scores,
             one row gather per table per (pos, len);
      exact: (H, 4) rows [fp1, fp2, (len<<24|id), spare] — full 96-bit
             identity + token id; scores fetched by id (f64 conformance
             mode).

    Token ids are NOT fetched on the fast path: Viterbi backtracking
    resolves ids on host from the matched byte spans, and EM marginals
    scatter into SLOT-indexed accumulators that the host folds to ids
    via `slot_to_id`. The historical "em" probe (16-bit quantized
    scores) is now an alias of "fast": the row layout made the exact
    probe as cheap as the quantized one.
    """

    t1_fast: jax.Array  # (H, 2) int32 rows: [fp2 check, f32 score bits]
    t2_fast: jax.Array
    t1_exact: jax.Array  # (H, 4) int32 rows: [fp1, fp2, len<<24|id, 0]
    t2_exact: jax.Array
    scores: jax.Array  # (V,) float
    slot_to_id: np.ndarray  # host (2H,) int64; -1 empty
    slot_len: np.ndarray  # host (2H,) int64 token length per slot
    bits: int
    max_len: int
    vocab_size: int
    # Single-probe bucket path ("bucket" mode): ONE x16-row gather per
    # (pos, len) — 8 interleaved [check, score] entries per bucket.
    t_bucket: Optional[jax.Array] = None  # (Hb, 16) int32
    bk_slot_to_id: Optional[np.ndarray] = None  # host (8*Hb,) int64
    bk_slot_len: Optional[np.ndarray] = None
    bk_bits: int = 0
    bk_salt: int = 0
    # In-VMEM scan ("vscan") layout for the fused Pallas probe
    # (ops/lattice_pallas_fused.py): per cuckoo table, check (fp2) and
    # f32-score-bit columns with every 128-entry table row pre-broadcast
    # across 8 sublanes -> (H/128*8, 128) int32. Built only for tables
    # small enough to scan faster than the XLA HBM gather (bits <=
    # VSCAN_MAX_BITS); cost of the in-kernel scan is linear in H.
    c1_vs: Optional[jax.Array] = None
    s1_vs: Optional[jax.Array] = None
    c2_vs: Optional[jax.Array] = None
    s2_vs: Optional[jax.Array] = None

    @staticmethod
    def from_table(tbl: TokenTable, dtype=jnp.float32) -> "DeviceTables":
        scores64 = tbl.scores_f64

        def split(t: np.ndarray):
            fp1 = t[:, 0].astype(np.uint32)
            fp2 = t[:, 1].astype(np.uint32)
            length = t[:, 2].astype(np.uint32)
            tid = t[:, 3].astype(np.uint32)
            empty = tid == np.uint32(0xFFFFFFFF)
            idlen = (length << np.uint32(24)) | (tid & np.uint32(0xFFFFFF))
            idlen = np.where(empty, np.uint32(0xFFFFFFFF), idlen)
            score = np.where(
                empty,
                np.float32(-3.0e38),
                scores64[np.where(empty, 0, tid)].astype(np.float32),
            )
            ids = np.where(empty, -1, tid.astype(np.int64))
            lens = np.where(empty, 0, length.astype(np.int64))
            fast = np.stack(
                [fp2.view(np.int32), score.view(np.int32)], axis=1)
            exact = np.stack(
                [fp1.view(np.int32), fp2.view(np.int32),
                 idlen.view(np.int32),
                 np.zeros_like(fp1).view(np.int32)], axis=1)
            return jnp.asarray(fast), jnp.asarray(exact), ids, lens

        fa1, ex1, ids1, lens1 = split(tbl.t1)
        fa2, ex2, ids2, lens2 = split(tbl.t2)
        assert tbl.vocab_size < (1 << 24), "id packing needs vocab < 16M"
        scores = scores64 if dtype == jnp.float64 else tbl.scores

        def vscan(t: np.ndarray):
            """(check, score) vscan arrays: (H/128*8, 128) int32 each,
            table rows pre-broadcast x8 sublanes (fused Pallas probe)."""
            tid = t[:, 3].astype(np.uint32)
            empty = tid == np.uint32(0xFFFFFFFF)
            check = np.where(empty, np.uint32(0), t[:, 1].astype(np.uint32))
            sc = np.where(
                empty, np.float32(-3.0e38),
                scores64[np.where(empty, 0, tid)].astype(np.float32))
            H_ = t.shape[0]
            c = np.repeat(check.view(np.int32).reshape(H_ // 128, 128),
                          8, axis=0)
            s = np.repeat(sc.view(np.int32).reshape(H_ // 128, 128),
                          8, axis=0)
            return jnp.asarray(c), jnp.asarray(s)

        c1v = s1v = c2v = s2v = None
        if dtype != jnp.float64 and tbl.bits <= vscan_max_bits():
            c1v, s1v = vscan(tbl.t1)
            c2v, s2v = vscan(tbl.t2)
        return DeviceTables(
            t1_fast=fa1, t2_fast=fa2,
            t1_exact=ex1, t2_exact=ex2,
            scores=jnp.asarray(scores.astype(dtype)),
            slot_to_id=np.concatenate([ids1, ids2]),
            slot_len=np.concatenate([lens1, lens2]),
            bits=tbl.bits,
            max_len=tbl.max_token_len,
            vocab_size=tbl.vocab_size,
            t_bucket=(jnp.asarray(tbl.bk) if tbl.bk is not None else None),
            bk_slot_to_id=tbl.bk_ids,
            bk_slot_len=tbl.bk_lens,
            bk_bits=tbl.bk_bits,
            bk_salt=tbl.bk_salt,
            c1_vs=c1v, s1_vs=s1v, c2_vs=c2v, s2_vs=s2v,
        )

    @property
    def num_slots(self) -> int:
        return 2 * (1 << self.bits)

    @property
    def bk_num_slots(self) -> int:
        return 8 * (1 << self.bk_bits)


_PREP_CONSTS: dict = {}


def _prep_consts(W: int, L: int):
    """Device-resident per-width constants (transferred once)."""
    key = (W, L)
    if key not in _PREP_CONSTS:
        pow1 = H.powers_u32(H.R1, W).view(np.int32)
        pow2 = H.powers_u32(H.R2, W).view(np.int32)
        rinv1 = np.pad(H.powers_u32(H.R1_INV, W), (L, 0),
                       constant_values=1).view(np.int32)
        rinv2 = np.pad(H.powers_u32(H.R2_INV, W), (L, 0),
                       constant_values=1).view(np.int32)
        _PREP_CONSTS[key] = (
            jnp.asarray(pow1), jnp.asarray(pow2),
            jnp.asarray(rinv1), jnp.asarray(rinv2),
        )
    return _PREP_CONSTS[key]


@functools.partial(jax.jit, static_argnums=(3,))
def _device_prep(bytes_u8, flags_u8, consts, L: int):
    """Derive all DeviceBatch arrays on device from compact host inputs.

    Host -> device transfer is ~2 bytes per corpus byte: the raw bytes
    plus a flags array (bit0 = sample start at dp index, bit1 = sample
    end). Prefix hashes, sample ids and end indices are cumsum /
    reverse-cummin computations done on device — essential when the
    host link is slow.
    """
    pow1, pow2, rinv1, rinv2 = consts
    B, W = bytes_u8.shape
    b32 = bytes_u8.astype(jnp.int32)
    term1 = b32 * pow1[None, :]
    term2 = b32 * pow2[None, :]
    zero = jnp.zeros((B, 1), jnp.int32)
    p1 = jnp.concatenate([zero, jnp.cumsum(term1, axis=1)], axis=1)
    p2 = jnp.concatenate([zero, jnp.cumsum(term2, axis=1)], axis=1)

    is_start = (flags_u8 & 1).astype(bool)  # (B, W+1)
    is_end = (flags_u8 & 2).astype(bool)

    starts_cnt = jnp.cumsum(is_start[:, :W].astype(jnp.int32), axis=1)
    ends_cnt = jnp.cumsum(is_end[:, :W].astype(jnp.int32), axis=1)
    inside = starts_cnt > ends_cnt
    sid = jnp.where(inside, starts_cnt - 1, -2)

    # end_index[p] = smallest dp index q >= p+1 with is_end[q].
    idx = jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    marked = jnp.where(is_end, idx, jnp.int32(2**30))
    next_end = jax.lax.cummin(marked, axis=1, reverse=True)  # (B, W+1)
    end_index = jnp.where(inside, next_end[:, 1:], 0).astype(jnp.int32)

    pad_cfg = ((0, 0), (L, L))
    return (
        jnp.pad(p1, pad_cfg), jnp.pad(p2, pad_cfg),
        jnp.pad(sid, pad_cfg, constant_values=-2),
        is_start, is_end, end_index, rinv1, rinv2,
    )


def prepare_batch_inputs(packed: PackedBatch):
    """Compact host->device inputs (~3 bytes per corpus byte): raw
    bytes + boundary flags. Cacheable on device across passes."""
    bytes_arr, flags = host_batch_inputs(packed)
    return jnp.asarray(bytes_arr), jnp.asarray(flags)


def prepare_batch_from_inputs(gbytes, gflags, L: int) -> DeviceBatch:
    """Derive the full DeviceBatch from cached compact inputs."""
    B, W = gbytes.shape
    consts = _prep_consts(W, L)
    p1, p2, sid, is_start, is_end, end_index, rinv1, rinv2 = _device_prep(
        gbytes, gflags, consts, L
    )
    return DeviceBatch(
        p1=p1, p2=p2, sid=sid, is_start=is_start, is_end=is_end,
        end_index=end_index, rinv1=rinv1, rinv2=rinv2, width=W, pad=L,
    )


def prepare_batch(packed: PackedBatch, L: int) -> DeviceBatch:
    """Build the device-resident batch from a packed corpus view."""
    gbytes, gflags = prepare_batch_inputs(packed)
    return prepare_batch_from_inputs(gbytes, gflags, L)


_CHAIN_CONSTS: dict = {}


def _chain_consts(W: int, L: int):
    """Origin-shifted constants: the hash stream starts at the tail
    (virtual position -L), so exponents run over the full L+W span and
    the inverse powers cover the left pad with REAL values instead of
    the 1-filled pad of the ordinary layout."""
    key = (W, L)
    if key not in _CHAIN_CONSTS:
        pow1 = H.powers_u32(H.R1, L + W).view(np.int32)
        pow2 = H.powers_u32(H.R2, L + W).view(np.int32)
        rinv1 = H.powers_u32(H.R1_INV, L + W).view(np.int32)
        rinv2 = H.powers_u32(H.R2_INV, L + W).view(np.int32)
        _CHAIN_CONSTS[key] = (
            jnp.asarray(pow1), jnp.asarray(pow2),
            jnp.asarray(rinv1), jnp.asarray(rinv2),
        )
    return _CHAIN_CONSTS[key]


@functools.partial(jax.jit, static_argnums=(4, 5))
def _chained_prep(rows_u8, n_valid, has_tail, consts, L: int, W: int):
    pow1, pow2, rinv1, rinv2 = consts
    B = rows_u8.shape[0]
    b32 = rows_u8.astype(jnp.int32)
    zero = jnp.zeros((B, 1), jnp.int32)
    p1 = jnp.concatenate([zero, jnp.cumsum(b32 * pow1[None, :], axis=1)],
                         axis=1)
    p2 = jnp.concatenate([zero, jnp.cumsum(b32 * pow2[None, :], axis=1)],
                         axis=1)
    p1 = jnp.pad(p1, ((0, 0), (0, L)))
    p2 = jnp.pad(p2, ((0, 0), (0, L)))

    pos = jnp.arange(L + W, dtype=jnp.int32)[None, :]
    body_idx = pos - L
    rid = jnp.arange(B, dtype=jnp.int32)[:, None]
    in_tail = has_tail[:, None] & (pos < L) & (n_valid[:, None] > 0)
    in_body = (body_idx >= 0) & (body_idx < n_valid[:, None])
    sid = jnp.where(in_tail | in_body, rid, -2)
    sid = jnp.pad(sid, ((0, 0), (0, L)), constant_values=-2)

    dp_idx = jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    active = n_valid[:, None] > 0
    is_start = (dp_idx == 0) & active & ~has_tail[:, None]
    is_end = (dp_idx == n_valid[:, None]) & active
    end_index = jnp.where(
        (dp_idx[:, :W] < n_valid[:, None]) & active, n_valid[:, None], 0
    ).astype(jnp.int32)
    return p1, p2, sid, is_start, is_end, end_index, rinv1, rinv2


def prepare_chained_batch(rows: np.ndarray, n_valid: np.ndarray,
                          has_tail: np.ndarray, L: int, W: int) -> DeviceBatch:
    """Device batch for chained long-sample windows.

    rows: (B, L+W) uint8 = [previous window's last L bytes | body];
    n_valid: body byte count per row (0 = inactive row);
    has_tail: whether the left L bytes are real context (False for the
    first window of a sample — its pad bytes are zeros and invalid).
    """
    consts = _chain_consts(W, L)
    p1, p2, sid, is_start, is_end, end_index, rinv1, rinv2 = _chained_prep(
        jnp.asarray(rows), jnp.asarray(n_valid.astype(np.int32)),
        jnp.asarray(has_tail), consts, L, W,
    )
    return DeviceBatch(
        p1=p1, p2=p2, sid=sid, is_start=is_start, is_end=is_end,
        end_index=end_index, rinv1=rinv1, rinv2=rinv2, width=W, pad=L,
    )


def _is_end_from_spans(packed: PackedBatch) -> np.ndarray:
    out = np.zeros((packed.rows, packed.width + 1), dtype=bool)
    for r, s, e, _, _ in packed.spans:
        out[r, e] = True
    return out


def host_batch_inputs(packed: PackedBatch):
    """Host (numpy) compact inputs: raw bytes + boundary flags."""
    B, W = packed.bytes_arr.shape
    flags = np.zeros((B, W + 1), dtype=np.uint8)
    flags[packed.is_start] |= 1
    flags[_is_end_from_spans(packed)] |= 2
    return packed.bytes_arr, flags


def sharded_inputs(packed: PackedBatch, sharding):
    """(gbytes, gflags) as GLOBAL row-sharded arrays from the identical
    global packing held on every process (each materializes only its
    addressable shards). Cacheable on device across passes."""
    from ..parallel import mesh as pmesh

    bytes_arr, flags = host_batch_inputs(packed)
    return pmesh.shard_rows(bytes_arr, sharding), \
        pmesh.shard_rows(flags, sharding)


def sharded_inputs_local(packed_local: PackedBatch, sharding,
                         global_rows: int):
    """(gbytes, gflags) global arrays from a PROCESS-LOCAL row block —
    the per-host corpus-sharding path (SURVEY section 2.4): each process
    packs only its own samples and contributes rows
    [proc * rows_local, (proc+1) * rows_local) of the global batch."""
    from ..parallel import mesh as pmesh

    bytes_arr, flags = host_batch_inputs(packed_local)
    return (
        pmesh.shard_rows_local(bytes_arr, sharding,
                               (global_rows,) + bytes_arr.shape[1:]),
        pmesh.shard_rows_local(flags, sharding,
                               (global_rows,) + flags.shape[1:]),
    )


def _host_consts(W: int, L: int):
    """Hash-power constants as host numpy (uncommitted -> replicated in
    a multi-process global program)."""
    pow1 = H.powers_u32(H.R1, W).view(np.int32)
    pow2 = H.powers_u32(H.R2, W).view(np.int32)
    rinv1 = np.pad(H.powers_u32(H.R1_INV, W), (L, 0),
                   constant_values=1).view(np.int32)
    rinv2 = np.pad(H.powers_u32(H.R2_INV, W), (L, 0),
                   constant_values=1).view(np.int32)
    return (pow1, pow2, rinv1, rinv2)


def prepare_batch_from_global_inputs(gbytes, gflags, L: int) -> DeviceBatch:
    """Derive the DeviceBatch from (possibly cached) global row-sharded
    compact inputs as one global program."""
    B, W = gbytes.shape
    p1, p2, sid, is_start, is_end, end_index, rinv1, rinv2 = _device_prep(
        gbytes, gflags, _host_consts(W, L), L
    )
    return DeviceBatch(
        p1=p1, p2=p2, sid=sid, is_start=is_start, is_end=is_end,
        end_index=end_index, rinv1=rinv1, rinv2=rinv2, width=W, pad=L,
    )


def prepare_batch_sharded(packed: PackedBatch, L: int, sharding) -> DeviceBatch:
    """Multi-process prepare_batch: `packed` is the identical GLOBAL
    packing on every process; bytes/flags become global row-sharded
    arrays (each process materializes only its addressable shards) and
    the derivation jit runs as one global program. Constants stay host
    numpy (uncommitted -> replicated)."""
    gbytes, gflags = sharded_inputs(packed, sharding)
    return prepare_batch_from_global_inputs(gbytes, gflags, L)


# ---------------------------------------------------------------------------
# Match slab: start-indexed (score, id) for a range of positions.
# ---------------------------------------------------------------------------


def _match_slab(
    tbl: DeviceTables,
    batch: DeviceBatch,
    start,  # traced int32: first global position of the slab
    n_pos: int,  # static slab length
    L: int,
    drop_u: Optional[jax.Array] = None,  # (B, W-domain) int32 random, padded like sid
    dropout: float = 0.0,
    dtype=jnp.float32,
    mode: str = "fast",  # "fast": (score, slot); "exact": (score, ids)
    end_indexed: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Match arrays for global positions [start, start+n_pos).

    Returns (score, aux) of shape (B, L, n_pos), row j = token length
    l = j+1. Start-indexed: row j at column q describes the token
    BEGINNING at position start+q. End-indexed (end_indexed=True):
    row j at column q describes the token ENDING at dp index
    start+q+1 (i.e. beginning at start+q-j) — computed directly from
    the prefix hashes with shifted slices, no restacking.

    mode="fast": aux = slot index into the concatenated cuckoo tables
    (num_slots where no match); 2 gathers per probe per table
    (check word + f32 score). mode="exact": aux = token ids; scores
    gathered by id at the requested dtype (float64 conformance path).

    Layout: n_pos stays the minor dimension of every array so all ops
    run on full 128-lane tiles.
    """
    B = batch.p1.shape[0]
    off = batch.pad + start  # offset into padded arrays

    p1s = jax.lax.dynamic_slice(batch.p1, (0, off - (L if end_indexed else 0)),
                                (B, n_pos + L + 1))
    p2s = jax.lax.dynamic_slice(batch.p2, (0, off - (L if end_indexed else 0)),
                                (B, n_pos + L + 1))
    sids = jax.lax.dynamic_slice(batch.sid, (0, off - (L if end_indexed else 0)),
                                 (B, n_pos + L))

    if end_indexed:
        # Token of length l ending at dp index p = start+q+1 begins at
        # slab-local position L + q + 1 - l; slab byte range starts at
        # global (start - L).
        endv1 = p1s[:, None, L + 1 : L + 1 + n_pos]
        endv2 = p2s[:, None, L + 1 : L + 1 + n_pos]
        start1 = jnp.stack(
            [p1s[:, L + 1 - l : L + 1 - l + n_pos] for l in range(1, L + 1)],
            axis=1)
        start2 = jnp.stack(
            [p2s[:, L + 1 - l : L + 1 - l + n_pos] for l in range(1, L + 1)],
            axis=1)
        sid0 = jnp.stack(
            [sids[:, L + 1 - l : L + 1 - l + n_pos] for l in range(1, L + 1)],
            axis=1)
        sid_last = sids[:, None, L : L + n_pos]
        rinv1 = jnp.stack(
            [jax.lax.dynamic_slice(batch.rinv1, (off - l + 1,), (n_pos,))
             for l in range(1, L + 1)], axis=0)[None, :, :]
        rinv2 = jnp.stack(
            [jax.lax.dynamic_slice(batch.rinv2, (off - l + 1,), (n_pos,))
             for l in range(1, L + 1)], axis=0)[None, :, :]
        fp1 = (endv1 - start1) * rinv1
        fp2 = (endv2 - start2) * rinv2
        valid = (sid_last >= 0) & (sid_last == sid0)
        drop_base = None
        if dropout > 0.0 and drop_u is not None:
            # Dropout keys on the token's START position for consistency
            # between forward/backward passes.
            drop_base = jnp.stack(
                [jax.lax.dynamic_slice(drop_u, (0, off - l + 1), (B, n_pos))
                 for l in range(1, L + 1)], axis=1)
    else:
        base1 = p1s[:, None, :n_pos]
        base2 = p2s[:, None, :n_pos]
        sid0 = sids[:, None, :n_pos]
        end1 = jnp.stack([p1s[:, l : l + n_pos] for l in range(1, L + 1)],
                         axis=1)
        end2 = jnp.stack([p2s[:, l : l + n_pos] for l in range(1, L + 1)],
                         axis=1)
        sid_last = jnp.stack([sids[:, j : j + n_pos] for j in range(L)],
                             axis=1)
        rinv1 = jax.lax.dynamic_slice(batch.rinv1, (off,), (n_pos,))[None, None, :]
        rinv2 = jax.lax.dynamic_slice(batch.rinv2, (off,), (n_pos,))[None, None, :]
        fp1 = (end1 - base1) * rinv1
        fp2 = (end2 - base2) * rinv2
        valid = (sid0 >= 0) & (sid_last == sid0)
        drop_base = None
        if dropout > 0.0 and drop_u is not None:
            drop_base = jax.lax.dynamic_slice(
                drop_u, (0, off), (B, n_pos))[:, None, :]

    if drop_base is not None:
        odd = np.asarray(
            (np.arange(1, L + 1, dtype=np.int64) * 2654435761) % (1 << 32),
            dtype=np.uint32,
        ).view(np.int32)
        u = jax.lax.shift_right_logical(drop_base * odd[None, :, None],
                                        jnp.int32(1))
        threshold = np.int32(
            np.uint32(min(int(dropout * (1 << 32)), (1 << 32) - 1)).view(np.int32)
        )
        tt = jax.lax.shift_right_logical(jnp.full_like(u, threshold),
                                         jnp.int32(1))
        lens_col = jnp.arange(1, L + 1, dtype=jnp.int32)[None, :, None]
        valid = valid & ~((u < tt) & (lens_col > 1))

    # Slot index derivation; per-length mix constants broadcast on axis 1.
    a1 = np.asarray(
        (np.arange(1, L + 1, dtype=np.int64) * int(H.IDX_A1)) % (1 << 32),
        dtype=np.uint32,
    ).view(np.int32)
    a2 = np.asarray(
        (np.arange(1, L + 1, dtype=np.int64) * int(H.IDX_A2)) % (1 << 32),
        dtype=np.uint32,
    ).view(np.int32)
    m1 = np.int32(np.uint32(H.IDX_M1).view(np.int32))
    m2 = np.int32(np.uint32(H.IDX_M2).view(np.int32))
    shift = jnp.int32(32 - tbl.bits)
    idx1 = jax.lax.shift_right_logical((fp1 ^ a1[None, :, None]) * m1, shift)
    idx2 = jax.lax.shift_right_logical((fp2 ^ a2[None, :, None]) * m2, shift)

    neg = jnp.array(NEG_INF, dtype=dtype)
    if mode == "bucket":
        # ONE x16-row gather per probe point: 8 interleaved
        # [check, f32 score bits] entries; entry 0 wins ties (build
        # guarantees no two vocab tokens share (bucket, fp2)).
        salt = np.int32(np.uint32(tbl.bk_salt).view(np.int32))
        shift_b = jnp.int32(32 - tbl.bk_bits)
        idxb = jax.lax.shift_right_logical(
            ((fp1 ^ a1[None, :, None]) ^ salt) * m1, shift_b)
        r = jnp.take(tbl.t_bucket, idxb, axis=0)  # (..., 16)
        # Sequential broadcast selects keep every op in the
        # (B, L, C)-shaped lane layout — measured faster than masked
        # max/min reductions over the size-8 minor axis (relayouts).
        # Build rejects duplicate (bucket, fp2) pairs, so at most one
        # entry truly matches; descending k makes entry 0 win against
        # statistical corpus false-matches deterministically.
        score = jnp.full(fp1.shape, -3.0e38, dtype=jnp.float32)
        slot = jnp.full(fp1.shape, tbl.bk_num_slots, dtype=jnp.int32)
        for k in range(7, -1, -1):
            c = r[..., 2 * k]
            sk = jax.lax.bitcast_convert_type(r[..., 2 * k + 1],
                                              jnp.float32)
            m = (c == fp2) & (sk > -1.0e38)
            score = jnp.where(m, sk, score)
            slot = jnp.where(m, idxb * 8 + k, slot)
        ok = (score > -1.0e38) & valid
        score = jnp.where(ok, score, neg).astype(dtype)
        slot = jnp.where(ok, slot, tbl.bk_num_slots)
        return score, slot

    if mode in ("fast", "em"):
        # ONE row gather per table per probe point (rows are ~2.8x
        # cheaper than single words and carry check + score together).
        # "em" is an alias kept for callers of the historical quantized
        # probe — the row layout made the exact probe equally cheap.
        r1 = jnp.take(tbl.t1_fast, idx1, axis=0)  # (..., 2)
        r2 = jnp.take(tbl.t2_fast, idx2, axis=0)
        c1 = r1[..., 0]
        s1 = jax.lax.bitcast_convert_type(r1[..., 1], jnp.float32)
        c2 = r2[..., 0]
        s2 = jax.lax.bitcast_convert_type(r2[..., 1], jnp.float32)
        # Empty slots store check = 0 with a NEG score marker; a probe
        # with fp2 == 0 must fall through to t2, not mask its match.
        match1 = (c1 == fp2) & (s1 > -1.0e38) & valid
        match2 = (c2 == fp2) & (s2 > -1.0e38) & valid
        score = jnp.where(match1, s1, jnp.where(match2, s2, neg))
        score = jnp.where(score <= -1.0e38, neg, score).astype(dtype)
        slot = jnp.where(
            match1, idx1,
            jnp.where(match2, idx2 + (1 << tbl.bits), tbl.num_slots),
        )
        slot = jnp.where(score > -1.0e38, slot, tbl.num_slots)
        return score, slot

    lens = jnp.arange(1, L + 1, dtype=jnp.int32)[None, :, None]
    e1 = jnp.take(tbl.t1_exact, idx1, axis=0)  # (..., 4)
    match1 = (
        (e1[..., 0] == fp1) & (e1[..., 1] == fp2)
        & (jax.lax.shift_right_logical(e1[..., 2], jnp.int32(24)) == lens)
    )
    e2 = jnp.take(tbl.t2_exact, idx2, axis=0)
    match2 = (
        (e2[..., 0] == fp1) & (e2[..., 1] == fp2)
        & (jax.lax.shift_right_logical(e2[..., 2], jnp.int32(24)) == lens)
    )
    ids = jnp.where(
        match1, e1[..., 2] & 0xFFFFFF,
        jnp.where(match2, e2[..., 2] & 0xFFFFFF, -1),
    )
    ids = jnp.where(valid, ids, -1)
    found = ids >= 0
    score = jnp.where(
        found, jnp.take(tbl.scores, jnp.maximum(ids, 0), axis=0),
        jnp.array(NEG_INF, dtype=tbl.scores.dtype),
    ).astype(dtype)
    return score, ids


# ---------------------------------------------------------------------------
# Forward scans (Viterbi / log-sum-exp)
# ---------------------------------------------------------------------------


def _lse(cand, axis):
    m = jnp.max(cand, axis=axis)
    safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.exp(cand - jnp.expand_dims(safe, axis)), axis=axis)
    return jnp.where(jnp.isfinite(m), safe + jnp.log(s), m)


def _probe_mode(tbl, dtype) -> str:
    if dtype == jnp.float64:
        return "exact"
    return "bucket" if tbl.t_bucket is not None else "fast"


def _match_cache_impl(
    tbl: DeviceTables,
    batch: DeviceBatch,
    C: int = 512,
    dtype=jnp.float32,
    drop_u: Optional[jax.Array] = None,
    dropout: float = 0.0,
    probe: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Probe the whole batch ONCE: start-indexed (score, aux) of shape
    (B, L, W). The EM E-step runs the vocabulary probe here and feeds
    both the forward and backward scans from the cache, halving the
    gather volume (the dominant cost)."""
    B = batch.p1.shape[0]
    W = batch.width
    L = tbl.max_len
    assert W % C == 0
    mode = probe or _probe_mode(tbl, dtype)

    def body(carry, chunk_idx):
        scores, aux = carry
        s, a = _match_slab(
            tbl, batch, chunk_idx * C, C, L, drop_u, dropout, dtype, mode=mode
        )
        # In-place window updates: XLA aliases the scan carry, so the
        # peak is ONE (B, L, W) buffer per output (a scan-stacked
        # (nchunks, B, L, C) + transpose costs two extra full copies,
        # which at 100k-vocab group sizes OOMs streamed corpora).
        scores = jax.lax.dynamic_update_slice(scores, s, (0, 0, chunk_idx * C))
        aux = jax.lax.dynamic_update_slice(aux, a, (0, 0, chunk_idx * C))
        return (scores, aux), None

    init = (
        jnp.zeros((B, L, W), dtype=dtype),
        jnp.zeros((B, L, W), dtype=jnp.int32),
    )
    (scores, aux), _ = jax.lax.scan(body, init, jnp.arange(W // C))
    return scores, aux


def _dropout_keep_window(drop_u: jax.Array, dropout: float, L: int,
                         pad: int, start: int, span) -> jax.Array:
    """(B, L, span) keep-mask for start positions [start, start+span)
    of a start-indexed match cache — the same coin stream as
    _match_slab's start-indexed dropout (key = token start position,
    mixed per length). `start` may reach -L (the end-view slab's left
    context); pad == L guarantees the slice index stays in range."""
    B = drop_u.shape[0]
    drop_base = jax.lax.dynamic_slice(
        drop_u, (0, pad + start), (B, span))[:, None, :]
    odd = np.asarray(
        (np.arange(1, L + 1, dtype=np.int64) * 2654435761) % (1 << 32),
        dtype=np.uint32,
    ).view(np.int32)
    u = jax.lax.shift_right_logical(drop_base * odd[None, :, None],
                                    jnp.int32(1))
    threshold = np.int32(
        np.uint32(min(int(dropout * (1 << 32)), (1 << 32) - 1)).view(np.int32)
    )
    tt = jax.lax.shift_right_logical(jnp.full_like(u, threshold),
                                     jnp.int32(1))
    lens_col = jnp.arange(1, L + 1, dtype=jnp.int32)[None, :, None]
    return ~((u < tt) & (lens_col > 1))


def dropout_keep_mask(drop_u: jax.Array, dropout: float, L: int, pad: int,
                      W: int) -> jax.Array:
    """Full-width (B, L, W) keep-mask (see _dropout_keep_window);
    applied AFTER probing so a dropout-free slot cache can be reused
    across passes with fresh masks (reference: src/model.rs:48-51
    flips per candidate). Prefer passing drop_u to forward/backward
    with a cache — they mask per chunk without a full-size copy."""
    return _dropout_keep_window(drop_u, dropout, L, pad, 0, W)


@functools.partial(jax.jit, static_argnames=("dtype", "C"))
def score_from_slots(slot_score_rows: jax.Array, slots: jax.Array,
                     dtype=jnp.float32, C: int = 512) -> jax.Array:
    """Re-gather current scores for a cached (B, L, W) slot/rank array
    (one row gather per element; see DeviceTables docs for why rows).

    Packed x16 layouts (rank_score_rows) gather the 16-word row at
    slot >> 4 and resolve the word with a sequential select chain —
    the same trick as the bucket probe — keeping the gathered table
    under the v5e row-count cliff at any vocabulary size.

    Chunked over a FLAT view of the slot array with a hard per-chunk
    element budget: a gather of narrow rows (x2 or x16) picks up a
    (8, 128)-tiled output layout that pads the minor dim to 128 — 512 B
    per element — whenever XLA declines to fuse it into its consumers,
    and whether it fuses depends on the surrounding graph (observed
    unfused in the 1 GB-recipe _op_worker at B=4096, W=1024: a 16 GB
    HLO temp, compile-time HBM OOM). Budgeting for the UNFUSED worst
    case keeps the temp <=256 MB at any (B, L, W); the former (B, L, C)
    chunking scaled with B*L and only bounded W."""
    B, L, W = slots.shape
    neg = jnp.asarray(NEG_INF, dtype)
    packed = slot_score_rows.shape[1] == 16

    def norm(s):
        # Same normalization as _match_slab: empty/rebind-removed slots
        # store -3.0e38 sentinels which are FINITE — without mapping
        # them to NEG_INF, a NoPath z (~-3e38) passes isfinite checks
        # and Viterbi backtracks garbage (ADVICE r2 medium).
        return jnp.where(s <= -1.0e38, neg, s)

    def lookup(sl):
        if not packed:
            r = jnp.take(slot_score_rows, sl, axis=0)
            return norm(jax.lax.bitcast_convert_type(
                r[..., 0], jnp.float32).astype(dtype))
        sl = sl.astype(jnp.int32)
        row = jax.lax.shift_right_logical(sl, jnp.int32(4))
        col = sl & jnp.int32(15)
        r = jnp.take(slot_score_rows, row, axis=0)  # (..., 16)
        bits = r[..., 15]
        for k in range(15):
            bits = jnp.where(col == jnp.int32(k), r[..., k], bits)
        return norm(jax.lax.bitcast_convert_type(
            bits, jnp.float32).astype(dtype))

    # 2^19 elements x 512 B padded worst case = 256 MB chunk temp.
    N = 1 << 19
    total = B * L * W
    if total <= N:
        return lookup(slots)
    flat = slots.reshape(-1)
    rem = (-total) % N
    if rem:  # pad with slot 0 (always a valid row; result discarded)
        flat = jnp.concatenate([flat, jnp.zeros((rem,), flat.dtype)])

    def body(_, i):
        # (N/128, 128)-shaped index arrays: the gather engine issues
        # ~4x faster than on flat (N,) indices at the same table
        # (experiments/regather_r5d.py, 0.279 vs 0.067 G rows/s on a
        # 16k-row x16 table); scan ys stack beats a carried
        # dynamic_update_slice for the same reason the index shape
        # matters — the 1-D layouts serialize.
        sl = jax.lax.dynamic_slice(flat, (i * N,), (N,)).reshape(-1, 128)
        return None, lookup(sl)

    _, ys = jax.lax.scan(body, None, jnp.arange(flat.shape[0] // N))
    return ys.reshape(-1)[:total].reshape(B, L, W)


def slot_score_rows(tbl: DeviceTables) -> jax.Array:
    """(num_slots + 1, 2) int32 rows of f32 score bits per slot, NEG
    sentinel at the miss index. Matches the default probe's slot space
    (bucket when available, else the two-table cuckoo layout)."""
    neg = jnp.asarray(np.array([NEG_INF], np.float32).view(np.int32))
    if tbl.t_bucket is not None:
        col = jnp.concatenate([tbl.t_bucket[:, 1::2].reshape(-1), neg])
    else:
        col = jnp.concatenate([tbl.t1_fast[:, 1], tbl.t2_fast[:, 1], neg])
    return jnp.stack([col, jnp.zeros_like(col)], axis=1)


def _cache_end_view(score_cache: jax.Array, chunk_start, C: int, L: int,
                    dtype, drop_u=None, dropout: float = 0.0,
                    pad: int = 0) -> jax.Array:
    """End-indexed (B, L, C) chunk view of a start-indexed cache.

    Row j at dp step q needs the token of length l=j+1 beginning at
    chunk_start + q - j; pad L leading positions with NEG so early
    chunks read misses for out-of-range starts. When drop_u is given,
    the dropout keep-mask is applied to the slab here, per chunk — a
    full-width masked copy of the cache would cost another (B, L, W)
    buffer."""
    B, _, W = score_cache.shape
    padded = jnp.pad(score_cache, ((0, 0), (0, 0), (L, 0)),
                     constant_values=NEG_INF)
    slab = jax.lax.dynamic_slice(padded, (0, 0, chunk_start), (B, L, C + L))
    if drop_u is not None and dropout > 0.0:
        keep = _dropout_keep_window(drop_u, dropout, L, pad,
                                    chunk_start - L, C + L)
        slab = jnp.where(keep, slab, jnp.array(NEG_INF, slab.dtype))
    return jnp.stack(
        [slab[:, j, L - j : L - j + C] for j in range(L)], axis=1
    )


def _forward_chunk(tbl, batch, chunk_start, C, L, dtype, drop_u, dropout,
                   probe=None):
    """End-indexed match scores for one chunk of C dp steps.

    dp step q in [0, C) corresponds to dp index p = chunk_start + q + 1;
    row j holds the token of length l=j+1 ENDING at p. Computed directly
    from the prefix hashes (no start-indexed detour).
    """
    score_e, _aux = _match_slab(
        tbl, batch, chunk_start, C, L, drop_u, dropout, dtype,
        mode=probe or _probe_mode(tbl, dtype), end_indexed=True,
    )
    return score_e


def _to_groups(x):
    """(B, L, C) -> (G, C, L, 128) lane-group layout for Pallas."""
    B, L, C = x.shape
    G = B // 128
    return jnp.transpose(x.reshape(G, 128, L, C), (0, 3, 2, 1))


def _rows_to_groups(x):
    """(B, C) -> (G, C, 1, 128)."""
    B, C = x.shape
    G = B // 128
    return jnp.transpose(x.reshape(G, 128, C), (0, 2, 1))[:, :, None, :]


def _groups_to_rows(x):
    """(G, C, 1, 128) -> (B, C)."""
    G, C, _, _ = x.shape
    return jnp.transpose(x[:, :, 0, :], (0, 2, 1)).reshape(G * 128, C)


def _hist_to_groups(h):
    """(B, L) -> (G, L, 128)."""
    B, L = h.shape
    G = B // 128
    return jnp.transpose(h.reshape(G, 128, L), (0, 2, 1))


def _hist_from_groups(h):
    """(G, L, 128) -> (B, L)."""
    G, L, _ = h.shape
    return jnp.transpose(h, (0, 2, 1)).reshape(G * 128, L)


def _pallas_interpret() -> bool:
    import jax

    return jax.default_backend() != "tpu"


def _pallas_subchunk(C: int, L: int, streams: int) -> int:
    """Positions per Pallas kernel call, sized so the VMEM working set
    (streams x (P, L, 128) f32 blocks, double-buffered, plus row
    vectors) stays within ~10 MB of the 16 MB budget."""
    budget = 10 * (1 << 20)
    per_pos = streams * L * 128 * 4 * 2 + 4 * 128 * 4 * 2
    p = max(32, budget // per_pos)
    sub = C
    while sub > p and sub % 2 == 0:
        sub //= 2
    return sub


def _scan_forward(
    tbl: DeviceTables,
    batch: DeviceBatch,
    kind: str,  # "viterbi" | "logsumexp"
    C: int = 256,
    unroll: int = 16,
    dtype=jnp.float32,
    drop_u: Optional[jax.Array] = None,
    dropout: float = 0.0,
    backend: str = "xla",
    probe: Optional[str] = None,
    cache: Optional[Tuple[jax.Array, jax.Array]] = None,
    carry: Optional[Tuple[jax.Array, jax.Array]] = None,
):
    """carry = (mask (B,), hist0 (B, L)) chains the DP across
    fixed-width windows of one long sample: rows whose mask is set start
    with hist0[:, j] = dp[-j] — the previous window's last L dp values,
    passed through BIT-EXACTLY (no rebasing arithmetic) — and their
    batch left-pad carries the previous window's last L bytes so
    boundary-crossing tokens match (prepare_chained_batch). See
    train/estep_device.py; reference: src/model.rs:59-129 encodes
    unchunked."""
    B = batch.p1.shape[0]
    W = batch.width
    L = tbl.max_len
    assert W % C == 0, (W, C)
    if backend == "pallas":
        assert B % 128 == 0, f"pallas backend needs rows % 128 == 0, got {B}"
        assert dtype == jnp.float32
    nchunks = W // C
    neg = jnp.array(NEG_INF, dtype=dtype)

    is_start_steps = batch.is_start[:, 1:]  # consumed at dp index p = q+1

    def chunk_body(hist, chunk_idx):
        chunk_start = chunk_idx * C
        if cache is not None:
            score_e = _cache_end_view(cache[0], chunk_start, C, L, dtype,
                                      drop_u=drop_u, dropout=dropout,
                                      pad=batch.pad)
        else:
            score_e = _forward_chunk(
                tbl, batch, chunk_start, C, L, dtype, drop_u, dropout, probe
            )
        starts = jax.lax.dynamic_slice(is_start_steps, (0, chunk_start), (B, C))

        if backend == "pallas":
            from . import lattice_pallas as lp

            score_g = jnp.maximum(_to_groups(score_e), lp.NEG)
            starts_g = _rows_to_groups(starts.astype(jnp.float32))
            hist_g = _hist_to_groups(jnp.maximum(hist, lp.NEG))
            interp = _pallas_interpret()
            sub = _pallas_subchunk(C, L, streams=1)
            dp_parts, bl_parts, a_parts = [], [], []
            for q0 in range(0, C, sub):
                sc = score_g[:, q0 : q0 + sub]
                st = starts_g[:, q0 : q0 + sub]
                if kind == "viterbi":
                    dp4, bl4, hist_g = lp.viterbi_chunk(
                        sc, st, hist_g, interpret=interp
                    )
                    dp_parts.append(_groups_to_rows(dp4))
                    bl_parts.append(_groups_to_rows(bl4))
                else:
                    a4, hist_g = lp.forward_chunk(
                        sc, st, hist_g, interpret=interp
                    )
                    a_parts.append(_groups_to_rows(a4))
            if kind == "viterbi":
                outs = (
                    jnp.concatenate(dp_parts, axis=1),
                    jnp.concatenate(bl_parts, axis=1),
                )
            else:
                outs = (jnp.concatenate(a_parts, axis=1),)
            return _hist_from_groups(hist_g), outs

        def step(h, xs):
            s, st = xs  # (B, L), (B,)
            cand = h + s
            if kind == "viterbi":
                rev = cand[:, ::-1]
                jrev = jnp.argmax(rev, axis=1)
                best_j = (L - 1) - jrev
                dp_p = jnp.take_along_axis(cand, best_j[:, None], axis=1)[:, 0]
                out = (dp_p, best_j + 1)
            else:
                dp_p = _lse(cand, axis=1)
                out = (dp_p,)
            carry_val = jnp.where(st, jnp.zeros_like(dp_p), dp_p)
            h = jnp.concatenate([carry_val[:, None], h[:, : L - 1]], axis=1)
            return h, out

        xs = (
            jnp.moveaxis(score_e, 2, 0),
            jnp.moveaxis(starts, 1, 0),
        )
        hist, outs = jax.lax.scan(step, hist, xs, unroll=min(unroll, C))
        return hist, outs

    # hist[:, j] = dp[p - 1 - j]; at p=1: hist[0] = dp[0].
    hist0 = jnp.full((B, L), NEG_INF, dtype=dtype)
    dp0 = jnp.where(batch.is_start[:, 0], 0.0, neg).astype(dtype)
    hist0 = hist0.at[:, 0].set(dp0)
    if carry is not None:
        mask, carry_hist = carry
        hist0 = jnp.where(mask[:, None], carry_hist.astype(dtype), hist0)

    _, outs = jax.lax.scan(chunk_body, hist0, jnp.arange(nchunks))

    def assemble(stacked):
        if backend == "pallas":  # (nchunks, B, C)
            return jnp.moveaxis(stacked, 0, 1).reshape(B, W)
        return jnp.moveaxis(stacked.reshape(W, B), 0, 1)  # (nchunks, C, B)

    if kind == "viterbi":
        dp, best_l = (assemble(o) for o in outs)
        if backend == "pallas":
            from . import lattice_pallas as lp

            dp = jnp.where(dp <= lp.NEG * 0.5, NEG_INF, dp)
        return dp, best_l
    else:
        a = assemble(outs[0])
        if backend == "pallas":
            from . import lattice_pallas as lp

            a = jnp.where(a <= lp.NEG * 0.5, NEG_INF, a)
        a0 = jnp.where(batch.is_start[:, 0], 0.0, neg).astype(dtype)[:, None]
        return jnp.concatenate([a0, a], axis=1)  # (B, W+1)


# ---------------------------------------------------------------------------
# Fused-probe drivers (in-VMEM table scan; ops/lattice_pallas_fused.py)
# ---------------------------------------------------------------------------


def _ceil8(n: int) -> int:
    return -(-n // 8) * 8


def _fused_tabs(tbl: DeviceTables):
    return (tbl.c1_vs, tbl.s1_vs, tbl.c2_vs, tbl.s2_vs)


def _strm(x):
    """(B, C) -> (G, C, 1, 128) stream layout."""
    return _rows_to_groups(x)


def _hist_g(x, Lp: int, fill):
    """(B, L') -> (G, Lp, 128), right-padded along L'."""
    B, Lc = x.shape
    if Lc < Lp:
        x = jnp.pad(x, ((0, 0), (0, Lp - Lc)), constant_values=fill)
    return _hist_to_groups(x)


def _shared_strm(v):
    """(C,) group-independent stream -> (1, C, 1, 128)."""
    return jnp.broadcast_to(v[None, :, None, None], (1, v.shape[0], 1, 128))


def _shared_hist(v, Lp: int, fill):
    """(L',) -> (1, Lp, 128)."""
    if v.shape[0] < Lp:
        v = jnp.pad(v, (0, Lp - v.shape[0]), constant_values=fill)
    return jnp.broadcast_to(v[:, None], (Lp, 128))[None]


def _scan_forward_fused(
    tbl: DeviceTables,
    batch: DeviceBatch,
    kind: str,  # "viterbi" | "logsumexp"
    C: int = 512,
    dtype=jnp.float32,
    drop_u: Optional[jax.Array] = None,
    dropout: float = 0.0,
    carry: Optional[Tuple[jax.Array, jax.Array]] = None,
):
    """_scan_forward with the vocabulary probe fused into the Pallas DP
    kernel: fingerprints are computed in-kernel from streamed prefix
    hashes and probed against the VMEM-resident vscan tables — no
    (B, L, W) score materialization and no XLA HBM gathers at all.
    Semantics identical to _scan_forward(backend='pallas') with a fresh
    probe (cache=None)."""
    from . import lattice_pallas_fused as lpf

    B = batch.p1.shape[0]
    W = batch.width
    L = tbl.max_len
    Lp = _ceil8(L)
    pad = batch.pad
    assert B % 128 == 0 and W % C == 0 and dtype == jnp.float32
    assert tbl.c1_vs is not None
    G = B // 128
    nchunks = W // C
    neg = jnp.float32(NEG_INF)
    tabs = _fused_tabs(tbl)
    use_drop = drop_u is not None and dropout > 0.0
    if not use_drop:
        drop_u = jnp.zeros((B, batch.sid.shape[1]), jnp.int32)
        dropout = 0.0

    inb_all = (batch.sid[:, pad : pad + W] >= 0).astype(jnp.int32)
    stb_all = batch.is_start[:, :W].astype(jnp.int32)
    std_all = batch.is_start[:, 1:].astype(jnp.float32)

    def chunk_body(carry_t, chunk_idx):
        hist_g, rl_g = carry_t
        cs = chunk_idx * C
        pe1 = _strm(jax.lax.dynamic_slice(batch.p1, (0, pad + cs + 1),
                                          (B, C)))
        pe2 = _strm(jax.lax.dynamic_slice(batch.p2, (0, pad + cs + 1),
                                          (B, C)))
        rv1 = _shared_strm(jax.lax.dynamic_slice(batch.rinv1,
                                                 (pad + cs,), (C,)))
        rv2 = _shared_strm(jax.lax.dynamic_slice(batch.rinv2,
                                                 (pad + cs,), (C,)))
        ph01 = _hist_g(jax.lax.dynamic_slice(
            batch.p1, (0, pad + cs - L + 1), (B, L))[:, ::-1], Lp, 0)
        ph02 = _hist_g(jax.lax.dynamic_slice(
            batch.p2, (0, pad + cs - L + 1), (B, L))[:, ::-1], Lp, 0)
        rh01 = _shared_hist(jax.lax.dynamic_slice(
            batch.rinv1, (pad + cs - L,), (L,))[::-1], Lp, 0)
        rh02 = _shared_hist(jax.lax.dynamic_slice(
            batch.rinv2, (pad + cs - L,), (L,))[::-1], Lp, 0)
        inb = _strm(jax.lax.dynamic_slice(inb_all, (0, cs), (B, C)))
        stb = _strm(jax.lax.dynamic_slice(stb_all, (0, cs), (B, C)))
        std = _strm(jax.lax.dynamic_slice(std_all, (0, cs), (B, C)))
        du = _strm(jax.lax.dynamic_slice(drop_u, (0, pad + cs), (B, C)))
        dh0 = _hist_g(jax.lax.dynamic_slice(
            drop_u, (0, pad + cs - L), (B, L))[:, ::-1], Lp, 0)

        out0, out1, hist_g, rl_g = lpf.fused_forward_chunk(
            kind, tabs, pe1, pe2, rv1, rv2, ph01, ph02, rh01, rh02,
            inb, stb, std, du, dh0, hist_g, rl_g,
            L=L, bits=tbl.bits, dropout=dropout,
            interpret=_pallas_interpret())
        return (hist_g, rl_g), (out0, out1)

    from . import lattice_pallas as lp

    hist0 = jnp.full((B, L), NEG_INF, dtype=dtype)
    dp0 = jnp.where(batch.is_start[:, 0], 0.0, neg).astype(dtype)
    hist0 = hist0.at[:, 0].set(dp0)
    if carry is not None:
        mask, carry_hist = carry
        hist0 = jnp.where(mask[:, None], carry_hist.astype(dtype), hist0)
    hist_g0 = _hist_g(jnp.maximum(hist0, lp.NEG), Lp, lp.NEG)
    rl0 = jnp.where(batch.sid[:, pad - 1] >= 0, jnp.int32(L),
                    jnp.int32(0))
    rl_g0 = jnp.transpose(rl0.reshape(G, 128), (0, 1))[:, None, :]

    (_, _), outs = jax.lax.scan(chunk_body, (hist_g0, rl_g0),
                                jnp.arange(nchunks))

    def assemble(stacked):  # (nchunks, G, C, 1, 128) -> (B, W)
        parts = jnp.moveaxis(stacked, 0, 1)  # (G, nchunks, C, 1, 128)
        parts = parts.reshape(G, W, 1, 128)
        return _groups_to_rows(parts)

    if kind == "viterbi":
        dp = assemble(outs[0])
        best_l = assemble(outs[1])
        dp = jnp.where(dp <= lp.NEG * 0.5, NEG_INF, dp)
        return dp, best_l
    a = assemble(outs[0])
    a = jnp.where(a <= lp.NEG * 0.5, NEG_INF, a)
    a0 = jnp.where(batch.is_start[:, 0], 0.0, neg).astype(dtype)[:, None]
    return jnp.concatenate([a0, a], axis=1)


def _backward_betas_fused_impl(
    tbl: DeviceTables,
    batch: DeviceBatch,
    C: int = 512,
    dtype=jnp.float32,
    drop_u: Optional[jax.Array] = None,
    dropout: float = 0.0,
) -> jax.Array:
    """_backward_betas_impl with the probe fused into a Pallas kernel
    (start-indexed fingerprints computed in-kernel). Returns (B, W+1)
    post-reset log-betas, exactly like the XLA implementation."""
    from . import lattice_pallas as lp
    from . import lattice_pallas_fused as lpf

    B = batch.p1.shape[0]
    W = batch.width
    L = tbl.max_len
    Lp = _ceil8(L)
    pad = batch.pad
    assert B % 128 == 0 and W % C == 0 and dtype == jnp.float32
    assert tbl.c1_vs is not None
    G = B // 128
    nchunks = W // C
    tabs = _fused_tabs(tbl)
    use_drop = drop_u is not None and dropout > 0.0
    if not use_drop:
        drop_u = jnp.zeros((B, batch.sid.shape[1]), jnp.int32)
        dropout = 0.0

    inb_all = (batch.sid[:, pad : pad + W] >= 0).astype(jnp.int32)
    stb_all = batch.is_start[:, :W].astype(jnp.int32)
    ends_all = batch.is_end[:, :W].astype(jnp.float32)

    def chunk_body(carry_t, chunk_idx_rev):
        hist_g, fr_g, sn_g = carry_t
        chunk_idx = (nchunks - 1) - chunk_idx_rev
        cs = chunk_idx * C
        ce = cs + C
        ps1 = _strm(jax.lax.dynamic_slice(batch.p1, (0, pad + cs), (B, C)))
        ps2 = _strm(jax.lax.dynamic_slice(batch.p2, (0, pad + cs), (B, C)))
        rv1 = _shared_strm(jax.lax.dynamic_slice(batch.rinv1,
                                                 (pad + cs,), (C,)))
        rv2 = _shared_strm(jax.lax.dynamic_slice(batch.rinv2,
                                                 (pad + cs,), (C,)))
        # Invariant at step q: phf[j] = P[q+1+j]; the first processed
        # step of the chunk is q = ce-1, so init phf[j] = P[ce+j].
        phf01 = _hist_g(jax.lax.dynamic_slice(
            batch.p1, (0, pad + ce), (B, L)), Lp, 0)
        phf02 = _hist_g(jax.lax.dynamic_slice(
            batch.p2, (0, pad + ce), (B, L)), Lp, 0)
        inb = _strm(jax.lax.dynamic_slice(inb_all, (0, cs), (B, C)))
        stb = _strm(jax.lax.dynamic_slice(stb_all, (0, cs), (B, C)))
        ends = _strm(jax.lax.dynamic_slice(ends_all, (0, cs), (B, C)))
        du = _strm(jax.lax.dynamic_slice(drop_u, (0, pad + cs), (B, C)))

        bt, hist_g, fr_g, sn_g = lpf.fused_backward_chunk(
            tabs, ps1, ps2, rv1, rv2, phf01, phf02, inb, stb, ends, du,
            hist_g, fr_g, sn_g, L=L, bits=tbl.bits, dropout=dropout,
            interpret=_pallas_interpret())
        return (hist_g, fr_g, sn_g), bt

    hist0 = jnp.full((B, L), NEG_INF, dtype=dtype)
    bW = jnp.where(batch.is_end[:, W], 0.0, NEG_INF).astype(dtype)
    hist0 = hist0.at[:, 0].set(bW)
    hist_g0 = _hist_g(jnp.maximum(hist0, lp.NEG), Lp, lp.NEG)
    fr_g0 = jnp.zeros((G, 1, 128), jnp.int32)
    sn0 = batch.is_start[:, W].astype(jnp.int32)
    sn_g0 = sn0.reshape(G, 128)[:, None, :]

    _, stacked = jax.lax.scan(chunk_body, (hist_g0, fr_g0, sn_g0),
                              jnp.arange(nchunks))
    # (nchunks desc, G, C, 1, 128): chunks were processed last-to-first;
    # within each chunk positions are already ascending.
    parts = jnp.moveaxis(stacked[::-1], 0, 1).reshape(G, W, 1, 128)
    bt = _groups_to_rows(parts)
    bt = jnp.where(bt <= lp.NEG * 0.5, NEG_INF, bt)
    return jnp.concatenate([bt, bW[:, None]], axis=1)


# ---------------------------------------------------------------------------
# Jitted entry points
#
# The trainers call these once per row group from ordinary Python; run
# eagerly, each jax primitive would dispatch to the device separately
# (measured ~40x slower than the identical graph under jit through the
# remote-dispatch relay). Every public entry therefore routes through
# ONE module-level jitted worker with the table and batch flattened to
# plain arrays: compiles key on shapes + static config only, so
# vocabulary rebinds (same shapes, fresh scores) never recompile — one
# compile per (group shape, config) serves an entire training run.
# ---------------------------------------------------------------------------


def _dt_args(tbl: DeviceTables):
    return (tbl.t1_fast, tbl.t2_fast, tbl.t1_exact, tbl.t2_exact,
            tbl.scores, tbl.t_bucket, tbl.c1_vs, tbl.s1_vs, tbl.c2_vs,
            tbl.s2_vs)


def _dt_meta(tbl: DeviceTables):
    return (tbl.bits, tbl.max_len, tbl.vocab_size, tbl.bk_bits,
            tbl.bk_salt)


def _rebuild_dt(arrs, meta) -> DeviceTables:
    bits, max_len, vocab_size, bk_bits, bk_salt = meta

    def opt(a):
        return a if a is not None and a.size else None

    return DeviceTables(
        t1_fast=arrs[0], t2_fast=arrs[1], t1_exact=arrs[2],
        t2_exact=arrs[3], scores=arrs[4], slot_to_id=None, slot_len=None,
        bits=bits, max_len=max_len, vocab_size=vocab_size,
        t_bucket=opt(arrs[5]), bk_slot_to_id=None, bk_slot_len=None,
        bk_bits=bk_bits, bk_salt=bk_salt,
        c1_vs=opt(arrs[6]), s1_vs=opt(arrs[7]), c2_vs=opt(arrs[8]),
        s2_vs=opt(arrs[9]),
    )


def _batch_args(batch: DeviceBatch):
    return (batch.p1, batch.p2, batch.sid, batch.is_start, batch.is_end,
            batch.end_index, batch.rinv1, batch.rinv2)


def _rebuild_batch(arrs, width: int, pad: int) -> DeviceBatch:
    return DeviceBatch(
        p1=arrs[0], p2=arrs[1], sid=arrs[2], is_start=arrs[3],
        is_end=arrs[4], end_index=arrs[5], rinv1=arrs[6], rinv2=arrs[7],
        width=width, pad=pad,
    )


@functools.partial(jax.jit, static_argnames=(
    "meta", "width", "pad", "op", "C", "unroll", "dtype", "backend",
    "probe", "dropout", "vpad", "nbins"))
def _op_worker(dt_arrs, batch_arrs, cache, drop_u, carry, A, Bt, seg,
               slot_rows, *, meta, width, pad, op, C, unroll, dtype,
               backend, probe, dropout, vpad=0, nbins=None):
    tbl = _rebuild_dt(dt_arrs, meta)
    batch = _rebuild_batch(batch_arrs, width, pad)
    if drop_u is not None and drop_u.ndim == 1 and dropout > 0.0:
        # A (2,) PRNG key instead of a materialized (B, sid_w) random
        # array: expand it INSIDE the fused graph (same key + shape =>
        # the same bits as a host-side jax.random.randint, with no
        # separate dispatch or HBM round-trip).
        drop_u = jax.random.randint(
            drop_u, (batch.p1.shape[0], batch.sid.shape[1]),
            minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32)
    if op == "match_cache":
        return _match_cache_impl(tbl, batch, C, dtype, drop_u, dropout,
                                 probe)
    if op in ("viterbi", "forward"):
        kind = "viterbi" if op == "viterbi" else "logsumexp"
        if backend == "fused":
            return _scan_forward_fused(tbl, batch, kind, C, dtype,
                                       drop_u, dropout, carry)
        return _scan_forward(tbl, batch, kind, C, unroll, dtype, drop_u,
                             dropout, backend, probe, cache, carry)
    if op == "backward_expected":
        return _backward_expected_impl(tbl, batch, A, C, unroll, dtype,
                                       drop_u, dropout, backend, probe,
                                       cache, nbins)
    if op == "backward_betas":
        if backend == "fused":
            return _backward_betas_fused_impl(tbl, batch, C, dtype,
                                              drop_u, dropout)
        return _backward_betas_impl(tbl, batch, C, unroll, dtype, drop_u,
                                    dropout, probe, cache)
    if op == "estep_fused":
        # Session EM pass with the probe fused in-kernel: forward +
        # backward betas re-probe the VMEM tables (nearly free for
        # vscan-sized vocabularies) and segsum turns betas into counts
        # via the session's static sorted-hit structure. One dispatch.
        A = _scan_forward_fused(tbl, batch, "logsumexp", C, dtype,
                                drop_u, dropout, None)
        Bt = _backward_betas_fused_impl(tbl, batch, C, dtype, drop_u,
                                        dropout)
        exp = _segsum_expected_impl(tbl, batch, A, Bt, seg, slot_rows,
                                    drop_u, dropout, dtype)
        return A, exp
    if op == "segsum_expected":
        return _segsum_expected_impl(tbl, batch, A, Bt, seg, slot_rows,
                                     drop_u, dropout, dtype)
    if op == "estep_cached":
        # Fused cached-slot EM pass: ONE dispatch per group instead of
        # four (score regather + forward + betas + counts) — separate
        # dispatches serialize on the device link and cost a sync each.
        slots = cache
        score = score_from_slots(slot_rows, slots, dtype, C)
        cch = (score, slots)
        A = _scan_forward(tbl, batch, "logsumexp", C, unroll, dtype,
                          drop_u, dropout, backend, probe, cch, None)
        if seg is not None:
            Bt = _backward_betas_impl(tbl, batch, C, unroll, dtype,
                                      drop_u, dropout, probe, cch)
            exp = _segsum_expected_impl(tbl, batch, A, Bt, seg,
                                        slot_rows, drop_u, dropout, dtype)
        else:
            # Bin space follows slot_rows (rank rows when the session
            # remapped its cached slots).
            exp = _backward_expected_impl(tbl, batch, A, C, unroll, dtype,
                                          drop_u, dropout, backend, probe,
                                          cch, rows_nbins(slot_rows))
        return A, exp
    if op == "viterbi_freq":
        return _viterbi_freq_impl(tbl, batch, A, Bt, cache, C, unroll,
                                  vpad)
    if op == "viterbi_cached":
        slots = cache
        score = score_from_slots(slot_rows, slots, dtype, C)
        return _scan_forward(tbl, batch, "viterbi", C, unroll, dtype,
                             drop_u, dropout, backend, probe,
                             (score, slots), None)
    raise ValueError(op)


# Host-side zero-length stand-ins (numpy, so they are safe to pass
# from inside another trace).
_SCORES_PLACEHOLDER = np.zeros((0,), np.float32)
_TBUCKET_PLACEHOLDER = np.zeros((0, 16), np.int32)
_VSCAN_PLACEHOLDER = np.zeros((0, 128), np.int32)


def dt_call_args(tbl: DeviceTables, dtype=jnp.float32, probe=None):
    """Per-call table arrays for a prebuilt jitted/sharded fn built by
    the mesh factories: f32 modes swap the scores array for a stable
    placeholder (see _dispatch — otherwise every vocabulary rebind
    re-keys the jit cache and recompiles); missing bucket/vscan tables
    become zero-size stand-ins so the call tree structure is stable."""
    arrs = _dt_args(tbl)
    mode = probe or _probe_mode(tbl, dtype)
    if mode != "exact":
        arrs = arrs[:4] + (_SCORES_PLACEHOLDER,) + arrs[5:]
    if arrs[5] is None:
        arrs = arrs[:5] + (_TBUCKET_PLACEHOLDER,) + arrs[6:]
    arrs = arrs[:6] + tuple(
        a if a is not None else _VSCAN_PLACEHOLDER for a in arrs[6:])
    return arrs


def dt_static_meta(tbl: DeviceTables, dtype=jnp.float32, probe=None):
    """Static table metadata paired with dt_call_args (f32 modes blank
    the per-binding vocab_size so it stays off the jit key)."""
    meta = _dt_meta(tbl)
    mode = probe or _probe_mode(tbl, dtype)
    if mode != "exact":
        meta = meta[:2] + (-1,) + meta[3:]
    return meta


def _dispatch(op, tbl, batch, *, C, unroll=16, dtype=jnp.float32,
              drop_u=None, dropout=0.0, backend="xla", probe=None,
              cache=None, carry=None, A=None, Bt=None, seg=None,
              slot_rows=None, vpad=0, nbins=None):
    # Resolve the probe mode HERE and pass it explicitly: dt_call_args
    # swaps the scores array (and a missing bucket table) for stable
    # placeholders in non-exact modes, and dt_static_meta blanks
    # vocab_size — otherwise every vocabulary rebind would re-key the
    # jit cache and recompile (see those helpers).
    mode = probe or _probe_mode(tbl, dtype)
    return _op_worker(
        dt_call_args(tbl, dtype, mode), _batch_args(batch), cache,
        drop_u, carry, A, Bt, seg, slot_rows,
        meta=dt_static_meta(tbl, dtype, mode), width=batch.width,
        pad=batch.pad, op=op, C=C, unroll=unroll, dtype=dtype,
        backend=backend, probe=mode, dropout=float(dropout), vpad=vpad,
        nbins=nbins)


def viterbi(tbl, batch, C=256, unroll=16, dtype=jnp.float32,
            drop_u=None, dropout=0.0, backend="xla", probe=None, cache=None,
            carry=None):
    """dp scores + backpointers for the packed batch.

    Returns (dp, best_l), each (B, W), indexed by dp index p-1. Token
    ids are not materialized on device — backtrack() resolves them on
    host from the matched byte spans. `carry` chains windows of long
    samples (see _scan_forward).
    """
    return _dispatch("viterbi", tbl, batch, C=C, unroll=unroll,
                     dtype=dtype, drop_u=drop_u, dropout=dropout,
                     backend=backend, probe=probe, cache=cache,
                     carry=carry)


def match_cache(tbl, batch, C=512, dtype=jnp.float32, drop_u=None,
                dropout=0.0, probe=None):
    """See _match_cache_impl (jitted entry)."""
    return _dispatch("match_cache", tbl, batch, C=C, dtype=dtype,
                     drop_u=drop_u, dropout=dropout, probe=probe)


def backward_expected(tbl, batch, A, C=256, unroll=16, dtype=jnp.float32,
                      drop_u=None, dropout=0.0, backend="xla", probe=None,
                      cache=None, nbins=None):
    """See _backward_expected_impl (jitted entry)."""
    return _dispatch("backward_expected", tbl, batch, C=C, unroll=unroll,
                     dtype=dtype, drop_u=drop_u, dropout=dropout,
                     backend=backend, probe=probe, cache=cache, A=A,
                     nbins=nbins)


def backward_betas(tbl, batch, C=256, unroll=16, dtype=jnp.float32,
                   drop_u=None, dropout=0.0, probe=None, cache=None,
                   backend="xla"):
    """See _backward_betas_impl (jitted entry)."""
    return _dispatch("backward_betas", tbl, batch, C=C, unroll=unroll,
                     dtype=dtype, drop_u=drop_u, dropout=dropout,
                     probe=probe, cache=cache, backend=backend)


def segsum_expected(tbl, batch, A, Bt, seg, slot_rows, drop_u=None,
                    dropout=0.0, dtype=jnp.float32):
    """See _segsum_expected_impl (jitted entry)."""
    return _dispatch("segsum_expected", tbl, batch, C=128, dtype=dtype,
                     drop_u=drop_u, dropout=dropout, A=A, Bt=Bt, seg=seg,
                     slot_rows=slot_rows)


def estep_cached(tbl, batch, slots, slot_rows, seg=None, drop_u=None,
                 dropout=0.0, C=512, unroll=16, dtype=jnp.float32,
                 backend="xla", probe=None):
    """(A, expected-count accumulator) for a slot-cached group in ONE
    jitted dispatch (see _op_worker op='estep_cached')."""
    return _dispatch("estep_cached", tbl, batch, C=C, unroll=unroll,
                     dtype=dtype, drop_u=drop_u, dropout=dropout,
                     backend=backend, probe=probe, cache=slots, seg=seg,
                     slot_rows=slot_rows)


def viterbi_cached(tbl, batch, slots, slot_rows, drop_u=None, dropout=0.0,
                   C=512, unroll=16, dtype=jnp.float32, backend="xla",
                   probe=None):
    """(dp, best_l) for a slot-cached group in ONE jitted dispatch."""
    return _dispatch("viterbi_cached", tbl, batch, C=C, unroll=unroll,
                     dtype=dtype, drop_u=drop_u, dropout=dropout,
                     backend=backend, probe=probe, cache=slots,
                     slot_rows=slot_rows)


def has_vscan(tbl: DeviceTables) -> bool:
    """True when the table carries the in-VMEM fused-probe layout."""
    return tbl.c1_vs is not None


def estep_fused(tbl, batch, seg, slot_rows, drop_u=None, dropout=0.0,
                C=512, dtype=jnp.float32):
    """(A, expected-count accumulator) with the probe fused into the
    Pallas scans (ONE jitted dispatch; requires has_vscan(tbl) and a
    SegStruct for the count side)."""
    return _dispatch("estep_fused", tbl, batch, C=C, dtype=dtype,
                     drop_u=drop_u, dropout=dropout, backend="fused",
                     seg=seg, slot_rows=slot_rows)


@jax.jit
def _picked(A, rows_idx, ends_idx):
    return A[rows_idx, ends_idx]


def pick_span_values_device(A, rows_idx, ends_idx):
    """A[rows_idx[k], ends_idx[k]] per span as a PADDED device array
    (slice the first len(rows_idx) on the host): power-of-two padded
    index arrays, because an unpadded fancy-index gather compiles one
    XLA executable per distinct span count (every row group differs),
    which costs seconds apiece through a remote-compile relay."""
    n = len(rows_idx)
    m = 1024
    while m < n:
        m *= 2
    r = np.zeros(m, np.int32)
    e = np.zeros(m, np.int32)
    r[:n] = rows_idx
    e[:n] = ends_idx
    return _picked(A, jnp.asarray(r), jnp.asarray(e))


def pick_span_values(A, rows_idx, ends_idx) -> np.ndarray:
    """Host-materialized pick_span_values_device."""
    n = len(rows_idx)
    return np.asarray(
        pick_span_values_device(A, rows_idx, ends_idx))[:n]


def forward(tbl, batch, C=256, unroll=16, dtype=jnp.float32,
            drop_u=None, dropout=0.0, backend="xla", probe=None, cache=None,
            carry=None):
    """EM forward pass: A (B, W+1) log-prob of segmenting each prefix
    (jitted entry)."""
    return _dispatch("forward", tbl, batch, C=C, unroll=unroll,
                     dtype=dtype, drop_u=drop_u, dropout=dropout,
                     backend=backend, probe=probe, cache=cache,
                     carry=carry)


# ---------------------------------------------------------------------------
# Backward + expected counts
# ---------------------------------------------------------------------------


def _backward_expected_impl(
    tbl: DeviceTables,
    batch: DeviceBatch,
    A: jax.Array,  # (B, W+1) from forward()
    C: int = 256,
    unroll: int = 16,
    dtype=jnp.float32,
    drop_u: Optional[jax.Array] = None,
    dropout: float = 0.0,
    backend: str = "xla",
    probe: Optional[str] = None,
    cache: Optional[Tuple[jax.Array, jax.Array]] = None,
    nbins: Optional[int] = None,
) -> jax.Array:
    """Expected-count accumulator: scatter-added marginals
    exp(A[p] + score + B[p+l] - z) per matched token occurrence
    (reference: src/lattice.rs:245-312).

    Fast (f32) path returns a bin-indexed accumulator — probe slots by
    default, or the caller's bin space via `nbins` (a session passes
    its dense-rank size when the cached aux array was rank-remapped) —
    fold to per-token counts with fold_expected() / fold_expected_rank()
    after any cross-device psum. The exact (f64) path returns (V,)
    per-token counts directly; fold_expected() is a no-op slice there.
    """
    B = batch.p1.shape[0]
    W = batch.width
    L = tbl.max_len
    V = tbl.vocab_size
    assert W % C == 0
    if backend == "pallas":
        assert B % 128 == 0 and dtype == jnp.float32
    nchunks = W // C
    mode = probe or _probe_mode(tbl, dtype)
    if mode == "exact":
        nbins = V
    elif nbins is None:
        nbins = tbl.bk_num_slots if mode == "bucket" else tbl.num_slots

    # Per-position normalizer Z[p] = A[end of sample containing p].
    Z = jnp.take_along_axis(A, batch.end_index, axis=1)  # (B, W)
    Z = jnp.where(jnp.isfinite(Z) & (Z > -1e37), Z, 0.0).astype(dtype)

    is_end_steps = batch.is_end[:, :W]  # consumed at dp index p = position

    def chunk_body(carry, chunk_idx_rev):
        hist, expected = carry
        chunk_idx = (nchunks - 1) - chunk_idx_rev
        chunk_start = chunk_idx * C
        if cache is not None:
            score_s = jax.lax.dynamic_slice(
                cache[0], (0, 0, chunk_start), (B, L, C))
            aux_s = jax.lax.dynamic_slice(
                cache[1], (0, 0, chunk_start), (B, L, C))
            if drop_u is not None and dropout > 0.0:
                keep = _dropout_keep_window(drop_u, dropout, L, batch.pad,
                                            chunk_start, C)
                score_s = jnp.where(keep, score_s,
                                    jnp.array(NEG_INF, score_s.dtype))
        else:
            score_s, aux_s = _match_slab(
                tbl, batch, chunk_start, C, L, drop_u, dropout, dtype,
                mode=mode
            )
        ends = jax.lax.dynamic_slice(is_end_steps, (0, chunk_start), (B, C))
        a_c = jax.lax.dynamic_slice(A, (0, chunk_start), (B, C)).astype(dtype)
        # A[p] at a boundary stores the PREVIOUS sample's total (pre-reset);
        # tokens starting at p belong to the next sample, whose forward
        # value is the post-reset 0.
        starts_c = jax.lax.dynamic_slice(
            batch.is_start[:, :W], (0, chunk_start), (B, C)
        )
        a_c = jnp.where(starts_c, jnp.zeros_like(a_c), a_c)
        z_c = jax.lax.dynamic_slice(Z, (0, chunk_start), (B, C))
        matched = (aux_s >= 0) if mode == "exact" else (score_s > -1.0e37)

        if backend == "pallas":
            from . import lattice_pallas as lp

            score_g = jnp.maximum(_to_groups(score_s), lp.NEG)
            a_g = _rows_to_groups(jnp.maximum(a_c, lp.NEG))
            z_g = _rows_to_groups(z_c)
            ends_g = _rows_to_groups(ends.astype(jnp.float32))
            hist_g = _hist_to_groups(jnp.maximum(hist, lp.NEG))
            sub = _pallas_subchunk(C, L, streams=2)
            marg_parts = []
            # Backward: process sub-chunks in DESCENDING position order.
            for q0 in range(C - sub, -1, -sub):
                marg_g, hist_g = lp.backward_chunk(
                    score_g[:, q0 : q0 + sub], a_g[:, q0 : q0 + sub],
                    z_g[:, q0 : q0 + sub], ends_g[:, q0 : q0 + sub],
                    hist_g, interpret=_pallas_interpret(),
                )
                marg_parts.insert(0, marg_g)
            marg_g = jnp.concatenate(marg_parts, axis=1)
            # (G, C, L, 128) -> (B, L, C)
            margs = jnp.transpose(marg_g, (0, 3, 2, 1)).reshape(B, L, C)
            margs = jnp.where(matched, margs, 0.0)
            hist = _hist_from_groups(hist_g)
            bins = aux_s
        else:
            def step(h, xs):
                s, m, is_e, a_p, z_p = xs
                # h[:, j] = Bwd[p + 1 + j]; token length l=j+1 ends at p+l.
                marg = jnp.exp(a_p[:, None] + s + h - z_p[:, None])
                marg = jnp.where(m, marg, 0.0)
                cand = s + h
                b_p = _lse(cand, axis=1)
                b_p = jnp.where(is_e, jnp.zeros_like(b_p), b_p)
                h = jnp.concatenate([b_p[:, None], h[:, : L - 1]], axis=1)
                return h, marg

            xs = (
                jnp.moveaxis(score_s, 2, 0)[::-1],
                jnp.moveaxis(matched, 2, 0)[::-1],
                jnp.moveaxis(ends, 1, 0)[::-1],
                jnp.moveaxis(a_c, 1, 0)[::-1],
                jnp.moveaxis(z_c, 1, 0)[::-1],
            )
            hist, margs_rev = jax.lax.scan(step, hist, xs,
                                           unroll=min(unroll, C))
            margs = margs_rev  # (C, B, L); order irrelevant for scatter
            bins = jnp.moveaxis(aux_s, 2, 0)[::-1]

        if mode == "exact":
            safe_bins = jnp.where(bins >= 0, bins, nbins)
        else:
            safe_bins = bins  # already the miss sentinel for misses
        flat_bins = safe_bins.reshape(-1)
        # ~80-90% of probe points are misses; routing them all at ONE
        # sentinel address would serialize the scatter's read-modify-
        # write on that address. Spread misses (their margs are zero)
        # over a scratch region instead; the final slice drops it.
        spread = jnp.arange(flat_bins.shape[0], dtype=jnp.int32) & 4095
        flat_bins = jnp.where(flat_bins >= nbins, nbins + spread,
                              flat_bins)
        expected = expected.at[flat_bins].add(
            margs.reshape(-1), mode="drop"
        )
        return (hist, expected), None

    hist0 = jnp.full((B, L), NEG_INF, dtype=dtype)
    # Tokens ending exactly at W see B[W] = 0 when a sample ends there.
    hist0 = hist0.at[:, 0].set(
        jnp.where(batch.is_end[:, W], 0.0, NEG_INF).astype(dtype)
    )
    expected0 = jnp.zeros((nbins + 4096,), dtype=dtype)
    (hist, expected), _ = jax.lax.scan(
        chunk_body, (hist0, expected0), jnp.arange(nchunks)
    )
    return expected[:nbins]


def _backward_betas_impl(
    tbl: DeviceTables,
    batch: DeviceBatch,
    C: int = 256,
    unroll: int = 16,
    dtype=jnp.float32,
    drop_u: Optional[jax.Array] = None,
    dropout: float = 0.0,
    probe: Optional[str] = None,
    cache: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """(B, W+1) log-beta per dp index — the backward recurrence of
    backward_expected() materialized, WITHOUT marginals or scatters
    (reference: src/lattice.rs:245-312 computes the same
    backward_scores array). Values are post sample-end reset: a token
    ending at p reads exactly the beta the fused path would have used.
    Feeds segsum_expected()."""
    B = batch.p1.shape[0]
    W = batch.width
    L = tbl.max_len
    assert W % C == 0
    nchunks = W // C
    mode = probe or _probe_mode(tbl, dtype)
    is_end_steps = batch.is_end[:, :W]

    def chunk_body(hist, chunk_idx_rev):
        chunk_idx = (nchunks - 1) - chunk_idx_rev
        chunk_start = chunk_idx * C
        if cache is not None:
            score_s = jax.lax.dynamic_slice(
                cache[0], (0, 0, chunk_start), (B, L, C))
            if drop_u is not None and dropout > 0.0:
                keep = _dropout_keep_window(drop_u, dropout, L, batch.pad,
                                            chunk_start, C)
                score_s = jnp.where(keep, score_s,
                                    jnp.array(NEG_INF, score_s.dtype))
        else:
            score_s, _aux = _match_slab(
                tbl, batch, chunk_start, C, L, drop_u, dropout, dtype,
                mode=mode
            )
        ends = jax.lax.dynamic_slice(is_end_steps, (0, chunk_start), (B, C))

        def step(h, xs):
            s, is_e = xs  # (B, L), (B,)
            # h[:, j] = Bwd[p + 1 + j]; token length l=j+1 ends at p+l.
            b_p = _lse(s + h, axis=1)
            b_p = jnp.where(is_e, jnp.zeros_like(b_p), b_p)
            h = jnp.concatenate([b_p[:, None], h[:, : L - 1]], axis=1)
            return h, b_p

        xs = (
            jnp.moveaxis(score_s, 2, 0)[::-1],
            jnp.moveaxis(ends, 1, 0)[::-1],
        )
        hist, b_rev = jax.lax.scan(step, hist, xs, unroll=min(unroll, C))
        return hist, b_rev  # (C, B): positions descending within chunk

    hist0 = jnp.full((B, L), NEG_INF, dtype=dtype)
    bW = jnp.where(batch.is_end[:, W], 0.0, NEG_INF).astype(dtype)
    hist0 = hist0.at[:, 0].set(bW)
    _, stacked = jax.lax.scan(chunk_body, hist0, jnp.arange(nchunks))
    # (nchunks, C, B): chunks last-to-first, positions descending.
    bt = jnp.moveaxis(stacked[::-1, ::-1], 2, 0).reshape(B, W)
    return jnp.concatenate([bt, bW[:, None]], axis=1)


def seg_nbins(tbl: DeviceTables, dtype) -> int:
    """Slot-space size of the default f32 probe (segsum bin count)."""
    mode = _probe_mode(tbl, dtype)
    return tbl.bk_num_slots if mode == "bucket" else tbl.num_slots


# ---------------------------------------------------------------------------
# Dense rank space: vocabulary-sized remap of the sparse probe slots
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RankSpace:
    """Dense remap of the bucket probe's sparse slot space.

    The single-probe bucket table keeps mean load <= 0.5 per 8-way
    bucket, so its slot space is ~16x the vocabulary (8 * 2^bk_bits
    slots for V tokens). Every per-pass structure that indexes SLOTS
    inherits that sparsity: the score-regather table
    (slot_score_rows) is 4 MB at a 32k vocab and 64 MB at 500k —
    multi-MB tables gather at ~0.156 G rows/s on v5e vs ~0.39 G for
    VMEM-stageable ones (BASELINE.md round 2) — and the SegStruct
    sort/searchsorted domains scale with slots, not tokens.

    Slots never move while a vocabulary shrinks (TokenTable.rebind), so
    a session can remap its cached (B, L, W) slot arrays ONCE through a
    static lut into the dense rank space [0, n): rank r = the r-th
    occupied slot of the SESSION-INITIAL table, miss -> n_pad. Every
    later pass gathers scores from a (n_pad + 1, 2) rank-indexed table
    (256 KB at 32k — small-table gather rates at any vocabulary) and
    accumulates counts into (n_pad,) bins. The reference has no
    analogous structure (its trie lookups return ids directly,
    src/trie.rs:22-64); this is the TPU-side equivalent of "ids", made
    stable across rebinds.
    """

    lut: np.ndarray  # (bk_num_slots + 1,) int32: slot -> rank; miss/pad -> n_pad
    occ: np.ndarray  # (n,) int64 occupied slots, ascending
    n_pad: int       # pow2 >= n; the rank-space miss sentinel


def build_rank_space(tbl: TokenTable) -> RankSpace:
    """Rank space of a host TokenTable's bucket layout (the f32 default
    probe). Build from the SESSION-INITIAL table: rebinds only empty
    slots out, so the initial occupancy covers every later binding."""
    assert tbl.bk is not None, "rank space requires the bucket layout"
    nbins = 8 * (1 << tbl.bk_bits)
    occ = np.nonzero(tbl.bk_ids >= 0)[0]
    n = int(occ.size)
    n_pad = max(16, 1 << (max(n, 1) - 1).bit_length())
    lut = np.full(nbins + 1, n_pad, dtype=np.int32)
    lut[occ] = np.arange(n, dtype=np.int32)
    return RankSpace(lut=lut, occ=occ, n_pad=n_pad)


_NEG_BITS_NP = np.array([NEG_INF], np.float32).view(np.int32)[0]


def rank_score_rows(rank: RankSpace, tbl: TokenTable) -> np.ndarray:
    """Rank-indexed score rows for the CURRENT binding, in the layout
    the v5e gather engine likes for this size. The gather issue rate is
    a function of table ROW COUNT, not bytes (measured, round 5):
    ~0.154 G rows/s up to ~128k rows at any width, ~0.13 beyond, with a
    2x pathological dip near ~250k rows — exactly where a flat
    (262k, 2) table for the recipe's 262k vocab lands. So:

      n_pad <= 2^17: flat (n_pad + 1, 2) rows [score bits, 0] — already
          under the row-count cliff, no select chain needed;
      n_pad  > 2^17: PACKED (n_pad/16 + 1, 16): rank r's f32 score bits
          at row r >> 4, word r & 15, resolved by a bucket-probe-style
          select chain — even a 1M-rank table stays under 64k rows.

    The trailing row is the all-miss sentinel (rank == n_pad reads
    it). Removed tokens' slots carry the empty sentinel (<= -1e38),
    which score_from_slots normalizes to -inf like the slot path."""
    flat = tbl.bk[:, 1::2].reshape(-1)  # int32 f32-score bits per slot
    if rank.n_pad <= (1 << 17):
        col = np.full(rank.n_pad + 1, _NEG_BITS_NP, dtype=np.int32)
        col[: rank.occ.size] = flat[rank.occ]
        return np.stack([col, np.zeros_like(col)], axis=1)
    col = np.full(rank.n_pad + 16, _NEG_BITS_NP, dtype=np.int32)
    col[: rank.occ.size] = flat[rank.occ]
    return col.reshape(-1, 16)


def rows_nbins(slot_rows) -> int:
    """Bin count encoded by a score-row array: packed x16 rank rows
    carry 16 bins per row (one sentinel row), legacy (nbins + 1, 2)
    slot rows carry one."""
    if slot_rows.shape[1] == 16:
        return (int(slot_rows.shape[0]) - 1) * 16
    return int(slot_rows.shape[0]) - 1


def _score_flat(slot_rows, nbins):
    """(nbins,) int32 f32-score bits per bin from either layout."""
    if slot_rows.shape[1] == 16:
        return slot_rows[:-1].reshape(-1)[:nbins]
    return slot_rows[:nbins, 0]


def rank_to_ids(rank: RankSpace, tbl: TokenTable) -> np.ndarray:
    """(n,) CURRENT token id per rank (-1 for rebind-removed tokens)."""
    return np.asarray(tbl.bk_ids[rank.occ], dtype=np.int64)


@jax.jit
def _take_lut(lut, slots):
    return jnp.take(lut, slots, axis=0)


def remap_slots(lut, slots) -> jax.Array:
    """slots -> ranks through the (bk_num_slots + 1,) lut; paid once per
    (session, group) when the probe result is cached."""
    return _take_lut(lut, slots)


def fold_expected_rank(acc, rank_ids: np.ndarray,
                       vocab_size: int) -> np.ndarray:
    """Fold a rank-indexed count accumulator to per-token counts (V,)."""
    acc = np.asarray(acc, dtype=np.float64)
    n = rank_ids.shape[0]
    expected = np.zeros(vocab_size, dtype=np.float64)
    valid = rank_ids >= 0
    np.add.at(expected, rank_ids[valid], acc[:n][valid])
    return expected


@dataclasses.dataclass(frozen=True)
class SegStruct:
    """Per-length sorted-hit structure for scatter-free EM counts.

    Built ONCE per row group from the session's cached (dropout-free)
    slot arrays — the (position, length) -> slot matching is static
    while the vocabulary only shrinks (TokenTable.rebind). Per length
    row l0 (token length l0+1):

      perm:    L-tuple of (cap_l,) int32 — flat positions sorted by
               slot, truncated to a PER-LENGTH pow2 capacity >= that
               length's hit count (a shared capacity made every sparse
               length pay the densest length's gathers — 92M vs 28M
               real hits on the 8 MB bench; round 4). Misses (slot ==
               nbins) sort to the tail and are never read.
      pre_pos: (L, OC) int32 over the COMPACT occurring-slot domain —
               sorted index JUST BEFORE the slot's segment (its prefix
               subtracts out), or cap_l (a zero pad cell) when the
               segment starts at 0; cap_l for pad occ entries
      end_pos: (L, OC) int32 — index of the segment's LAST element,
               cap_l for pad occ entries
      n_hit:   (L,) int32 — number of real hits; sorted entries past it
               are misses whose gathered [alpha-Z, beta] rows are
               finite garbage and must weigh 0
      occ_slot: (L, OC) int32 — the slots that actually OCCUR at this
               length, ascending, padded with nbins. A slot occurs at
               exactly one length (slots are per-token and a token has
               one byte length), so sum_l n_occ_l <= V + 1 and OC (the
               pow2-quantized max over lengths) is vocabulary-sized —
               the round-3 layout kept THREE (L, nbins) maps over the
               full slot space (nbins = bucket slots, ~16x the vocab),
               which at a 32k vocab / L=16 was ~100 MB of the
               structure's 236 MB (VERDICT r3 item 5). Per-pass sums
               are evaluated at occ positions only and scatter-added
               (V-sized, trivial) into the (nbins,) accumulator.
      blk_slot: L-tuple of (cap_l/SEG_BLK,) int32 — slot of the sorted
               hit at each SEG_BLK block start (nbins where the block
               is past the hits); the per-pass score expansion's
               per-block anchors (telescoping diffs between consecutive
               occurring slots, derived from occ_slot each pass)
    """

    perm: tuple
    pre_pos: jax.Array
    end_pos: jax.Array
    n_hit: jax.Array
    occ_slot: jax.Array
    blk_slot: tuple

    def nbytes(self) -> int:
        return 4 * (sum(int(p.size) for p in self.perm)
                    + int(self.pre_pos.size)
                    + int(self.end_pos.size) + int(self.occ_slot.size)
                    + sum(int(b.size) for b in self.blk_slot))

    @staticmethod
    def est_bytes(B: int, L: int, W: int) -> int:
        # perm dominates (4 B per (pos, len) hit, pre-compaction bound);
        # the occ-domain maps are vocabulary-sized, not nbins-sized and
        # small next to the perm bound, so they are left out of this
        # optimistic pre-check (seg.nbytes() gates caching post-build).
        return L * B * W * 4


jax.tree_util.register_pytree_node(
    SegStruct,
    lambda s: ((s.perm, s.pre_pos, s.end_pos, s.n_hit, s.occ_slot,
                s.blk_slot), None),
    lambda _, c: SegStruct(*c),
)

def seg_cap(n_hit: int) -> int:
    """Pow2-quantized per-length hit capacity (compile-shape control:
    at most log2 variants per length across groups/sessions)."""
    cap = SEG_BLK
    while cap < n_hit:
        cap *= 2
    return cap


# Block length of the segsum interval decomposition. 128 divides every
# B*W (width is a multiple of 128) and bounds the f32 in-block prefix
# error to ulp(128 * max element) — segment sums never accumulate
# through other segments beyond one block's worth of neighbors.
SEG_BLK = 128


@functools.partial(jax.jit, static_argnums=(1,))
def _seg_sort_one(slots_flat, nbins):
    perm = jnp.argsort(slots_flat)
    sorted_slots = jnp.take(slots_flat, perm)
    # ss[s] = first sorted index with slot >= s; integer slots make
    # ss[s+1] the one-past-the-end of segment s.
    ss = jnp.searchsorted(
        sorted_slots, jnp.arange(nbins + 1, dtype=sorted_slots.dtype))
    present = ss[1:] > ss[:-1]
    pad = slots_flat.shape[0]
    pre_pos = jnp.where(present & (ss[:-1] > 0), ss[:-1] - 1,
                        pad).astype(jnp.int32)
    end_pos = jnp.where(present, ss[1:] - 1, pad).astype(jnp.int32)
    blk_slot = jnp.minimum(sorted_slots[::SEG_BLK],
                           jnp.int32(nbins)).astype(jnp.int32)
    return (perm.astype(jnp.int32), pre_pos, end_pos,
            ss[nbins].astype(jnp.int32), present, blk_slot)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _seg_compact_one(pre, end, present, OC, cap, nbins):
    """Compact full-slot-domain (nbins,) pre/end maps to the occurring
    slots (static per session): occ_slot ascending padded with nbins;
    pad entries read the cap sentinel (the zero pad cell)."""
    occ = jnp.nonzero(present, size=OC,
                      fill_value=nbins)[0].astype(jnp.int32)
    sent = jnp.full((1,), cap, jnp.int32)
    # Real sorted indices are < n_hit <= cap; anything >= cap is the
    # sorter's BW pad and remaps to this capacity's zero pad cell.
    pre_p = jnp.concatenate([jnp.minimum(pre, cap).astype(jnp.int32),
                             sent])
    end_p = jnp.concatenate([jnp.minimum(end, cap).astype(jnp.int32),
                             sent])
    # occ is already bounded to [0, nbins] by nonzero's fill_value, in
    # range for the (nbins + 1,) padded maps — no clamp needed.
    return occ, jnp.take(pre_p, occ), jnp.take(end_p, occ)


@functools.partial(jax.jit, static_argnums=(1,))
def _seg_sort_counts(slots, nbins):
    """Phase 1 of the batched seg build: sort EVERY length plane in one
    dispatch. Returns (perm, srt, ss, present, n_hit, n_occ) with a
    leading length axis; the caller syncs only the (2L,) counts."""
    B, L, W = slots.shape
    flat = jnp.transpose(slots, (1, 0, 2)).reshape(L, B * W)
    perm = jnp.argsort(flat, axis=1).astype(jnp.int32)
    srt = jnp.take_along_axis(flat, perm, axis=1)
    grid = jnp.arange(nbins + 1, dtype=srt.dtype)
    ss = jax.vmap(lambda s: jnp.searchsorted(s, grid))(srt)
    present = ss[:, 1:] > ss[:, :-1]
    n_hit = ss[:, nbins].astype(jnp.int32)
    n_occ = jnp.sum(present, axis=1, dtype=jnp.int32)
    return perm, srt, ss, present, n_hit, n_occ


@functools.partial(jax.jit, static_argnames=("caps", "OC", "nbins"))
def _seg_compact_all(perm, srt, ss, present, n_hit, *, caps, OC, nbins):
    """Phase 2: per-length truncation to the (static) pow2 capacities +
    occ-domain compaction, all lengths in one dispatch. Semantics match
    the historical per-length _seg_sort_one/_seg_compact_one pair: pad
    entries read the per-length cap sentinel (the zero pad cell)."""
    L = perm.shape[0]
    perm_t, blk_t, occ2, pres2, ends2 = [], [], [], [], []
    for l0 in range(L):
        cap = caps[l0]
        # Real sorted indices are < n_hit <= cap, so the cap sentinel
        # only ever marks absent slots / the sorter's miss tail.
        pre = jnp.where(present[l0] & (ss[l0, :-1] > 0),
                        jnp.minimum(ss[l0, :-1] - 1, cap),
                        cap).astype(jnp.int32)
        end = jnp.where(present[l0], jnp.minimum(ss[l0, 1:] - 1, cap),
                        cap).astype(jnp.int32)
        occ = jnp.nonzero(present[l0], size=OC,
                          fill_value=nbins)[0].astype(jnp.int32)
        sent = jnp.full((1,), cap, jnp.int32)
        pre_p = jnp.concatenate([pre, sent])
        end_p = jnp.concatenate([end, sent])
        occ2.append(occ)
        pres2.append(jnp.take(pre_p, occ))
        ends2.append(jnp.take(end_p, occ))
        perm_t.append(perm[l0, :cap])
        blk_t.append(jnp.minimum(srt[l0, :cap:SEG_BLK],
                                 jnp.int32(nbins)).astype(jnp.int32))
    return (tuple(perm_t), jnp.stack(pres2), jnp.stack(ends2),
            n_hit, jnp.stack(occ2), tuple(blk_t))


def build_seg_struct(slots: jax.Array, nbins: int) -> SegStruct:
    """Sort each length-plane of a cached (B, L, W) slot array by slot
    (device-side, amortized over every later E-step pass of the
    session). All L sorts run in ONE dispatch and the compaction in a
    second (the round-4 build issued 3 dispatches per length plus a
    sync, which through a remote relay dominated the build).

    The sorted hit lists are COMPACTED: misses sort to the tail
    (sentinel slot == nbins), so rows are truncated to a power-of-two
    capacity >= the largest per-length hit count. Typically 10-30% of
    (pos, len) pairs match, so this cuts both the per-pass gather
    volume and the structure's HBM footprint by ~4-8x; the capacity is
    quantized so at most a couple of shapes ever compile."""
    B, L, W = slots.shape
    BW = B * W
    perm, srt, ss, present, n_hit, n_occ = _seg_sort_counts(slots, nbins)
    # host sync, once per build: per-length hit + occupancy counts
    counts = [int(x) for x in
              jax.device_get(jnp.concatenate([n_hit, n_occ]))]
    n_hit_host, n_occ_host = counts[:L], counts[L:]
    caps = tuple(min(seg_cap(h), BW) for h in n_hit_host)
    OC = max(8, 1 << (max(max(n_occ_host), 1) - 1).bit_length())
    out = _seg_compact_all(perm, srt, ss, present, n_hit,
                           caps=caps, OC=OC, nbins=nbins)
    return SegStruct(*out)


def _interval_sums(w: jax.Array, pre_pos: jax.Array,
                   end_pos: jax.Array, dtype) -> jax.Array:
    """Per-interval sums w[pre+1 ... end] over STATIC disjoint intervals
    of a (BW,) array, scatter-free and scan-free at full length:

      blocks of SEG_BLK -> in-block inclusive cumsums (one vector op)
      + an exclusive prefix over the tiny block-totals array. An
      interval sum is then three differences: in-block edge pieces plus
      a difference of block prefixes — no full-length scan graph (the
      8M-element associative_scan this replaced took the remote XLA
      compiler tens of minutes) and no global-magnitude cancellation.

    Conditioning contract: callers must feed w values of UNIFORM scale
    (the segsum path feeds true marginals in [0, 1]): a SEG_BLK block
    mixes NEIGHBORING slots' weights, so the in-block edge differences
    are only accurate to ulp(block total) — with the token score
    factored OUT of w (the round-1..3 formulation) a low-probability
    slot sharing a block with an e^40-scale neighbor lost its entire
    sum to rounding (round-4 bug: rescored vocabularies silently zeroed
    rare tokens' expected counts)."""
    BW = w.shape[0]
    nblk = BW // SEG_BLK
    c = jnp.cumsum(w.reshape(nblk, SEG_BLK), axis=1)
    return _interval_from_blocks(c.reshape(-1), c[:, -1], pre_pos,
                                 end_pos, dtype)


def _interval_from_blocks(cf_flat, t, pre_pos, end_pos, dtype):
    """Per-interval sums from in-block inclusive cumsums `cf_flat`
    (BW,) and block totals `t` (nblk,) — the shared tail of
    _interval_sums and the Pallas seg_weights path."""

    def comb(x, y):
        hx, lx = x
        hy, ly = y
        s = hx + hy
        z = s - hx
        err = (hx - (s - z)) + (hy - z)
        return s, err + lx + ly

    hi_inc, lo_inc = jax.lax.associative_scan(comb, (t, jnp.zeros_like(t)))
    zero = jnp.zeros((1,), dtype)
    # Exclusive prefixes, padded so index nblk (the BW pad cell's block)
    # reads 0.
    hip = jnp.concatenate([zero, hi_inc[:-1], zero])
    lop = jnp.concatenate([zero, lo_inc[:-1], zero])
    cf = jnp.concatenate([cf_flat, zero])

    be = end_pos // SEG_BLK
    bb = pre_pos // SEG_BLK
    # The block-prefix difference must be COMPENSATED (TwoSum of
    # hip[be] + (-hip[bb])): a plain f32 difference rounds at ulp of
    # the global prefix (~0.5 at 10 MB-group count totals), which
    # summed over lengths x groups put +-5 of noise on small tokens'
    # expected counts — enough to go NEGATIVE and abort the M-step
    # (observed at the 1.1 GB recipe, round 4).
    a = jnp.take(hip, be)
    b = -jnp.take(hip, bb)
    s = a + b
    a1 = s - b
    b1 = s - a1
    err = (a - a1) + (b - b1)
    small = (err
             + (jnp.take(lop, be) - jnp.take(lop, bb))
             + (jnp.take(cf, end_pos) - jnp.take(cf, pre_pos)))
    return s + small


def _segsum_expected_impl(
    tbl: DeviceTables,
    batch: DeviceBatch,
    A: jax.Array,   # (B, W+1) from forward()
    Bt: jax.Array,  # (B, W+1) from backward_betas()
    seg: SegStruct,
    slot_rows: jax.Array,  # slot_score_rows(tbl)
    drop_u: Optional[jax.Array] = None,
    dropout: float = 0.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Scatter-free expected counts over a seg-sorted static hit set.

    Replaces backward_expected()'s scatter-add (the 0.145 G elem/s
    HBM wall, experiments/perf_probe5.py) for cached-slot sessions:
    per-slot sums reduce with ONE row gather per probe point (hit rows
    of a dense [A-Z, Bt'] table, 2.8x cheaper than word scatters) +
    blocked interval sums over the session's static sorted-hit order.
    The summed weight is the TRUE marginal
    exp(A[p] + score + Bt[p+l] - Z[p]) in [0, 1]: the score term is
    expanded over sorted hits from the tiny (nbins,) score vector via
    static telescoping diffs + per-block anchors (all O(nbins + H/128)
    gathers). Factoring exp(score) OUT of the sum (the round-1..3
    formulation) let a block's huge-|score| neighbors absorb a rare
    token's entire sum in f32 — silently zeroed expected counts on
    rescored vocabularies (round-4 fix). Same (nbins,) contract as
    backward_expected (reference: src/lattice.rs:245-312)."""
    B = A.shape[0]
    W = batch.width
    L = tbl.max_len
    # Bin space = whatever slot_rows indexes: the raw probe slot space
    # (slot_score_rows) or the session's packed dense rank space
    # (rank_score_rows) — both carry one trailing miss row.
    nbins = rows_nbins(slot_rows)
    BW = B * W

    Z = jnp.take_along_axis(A, batch.end_index, axis=1)  # (B, W)
    Z = jnp.where(jnp.isfinite(Z) & (Z > -1e37), Z, 0.0).astype(dtype)
    a = A[:, :W].astype(dtype)
    # A[p] at a boundary stores the PREVIOUS sample's total (pre-reset);
    # tokens starting at p belong to the next sample (forward value 0).
    a = jnp.where(batch.is_start[:, :W], jnp.zeros_like(a), a)
    col1 = a - Z
    btp = jnp.pad(Bt.astype(dtype), ((0, 0), (0, L)),
                  constant_values=NEG_INF)  # (B, W+1+L)

    use_drop = drop_u is not None and dropout > 0.0
    if use_drop:
        drop_base = jax.lax.dynamic_slice(
            drop_u, (0, batch.pad), (drop_u.shape[0], W))
        threshold = np.int32(np.uint32(
            min(int(dropout * (1 << 32)), (1 << 32) - 1)).view(np.int32))
        tt = jax.lax.shift_right_logical(
            jnp.full_like(drop_base, threshold), jnp.int32(1))
    odds = jnp.asarray(
        ((np.arange(1, L + 1, dtype=np.int64) * 2654435761) % (1 << 32))
        .astype(np.uint32).view(np.int32))

    # Scores clamped to a sane floor: removed/empty slots carry the
    # -3e38 sentinel, which would wreck the telescoping cumsum below
    # (their own weights become exp(x - 200) = 0 regardless).
    sc = jnp.maximum(jax.lax.bitcast_convert_type(
        _score_flat(slot_rows, nbins), jnp.float32).astype(dtype),
        -200.0)
    sc_pad = jnp.concatenate([sc, jnp.zeros((1,), dtype)])

    # The exp + miss-mask + in-block cumsums (score expansion included)
    # run as ONE Pallas kernel on TPU (lattice_pallas_fused.seg_weights)
    # — as XLA ops they cost ~6 full passes over the hit arrays per
    # length. Lengths unroll as a Python loop: capacities are
    # PER-LENGTH (pow2-quantized), so sparse lengths gather only their
    # own pow2(n_hit) rows instead of the densest length's capacity.
    use_kernel = _os.environ.get("TGX_SEG_KERNEL", "1") != "0" \
        and dtype == jnp.float32

    acc = jnp.zeros((nbins + 1,), dtype)
    for l0 in range(L):
        perm_l = seg.perm[l0]
        blk_l = seg.blk_slot[l0]
        occ_l = seg.occ_slot[l0]   # (OC,) occurring slots, pad nbins
        pre_l = seg.pre_pos[l0]    # (OC,)
        end_l = seg.end_pos[l0]    # (OC,)
        n_hit_l = seg.n_hit[l0]
        H = perm_l.shape[0]  # this length's compact capacity
        nblk_l = H // SEG_BLK
        beta_l = btp[:, l0 + 1 : l0 + 1 + W]
        if use_drop:
            u = jax.lax.shift_right_logical(drop_base * odds[l0],
                                            jnp.int32(1))
            keep = ~((u < tt) & (l0 > 0))
            beta_l = jnp.where(keep, beta_l, jnp.array(NEG_INF, dtype))
        T = jnp.stack([col1, beta_l], axis=-1).reshape(BW, 2)
        rows = jnp.take(T, perm_l, axis=0)

        present = end_l != H
        start_pos = jnp.where(
            present, jnp.where(pre_l == H, 0, pre_l + 1), H)
        # Telescoping score diffs between CONSECUTIVE occurring slots
        # (pad occ entries read sc_pad's zero cell and are dropped by
        # their start_pos == H).
        sc_occ = jnp.take(sc_pad, occ_l)
        dvals = sc_occ - jnp.concatenate([sc_occ[:1], sc_occ[:-1]])
        d = jnp.zeros((H,), dtype).at[start_pos].add(dvals, mode="drop")
        anchors = jnp.take(sc_pad, blk_l)  # (nblk_l,)
        d2 = jnp.concatenate(
            [anchors[:, None], d.reshape(nblk_l, SEG_BLK)[:, 1:]],
            axis=1).reshape(-1)

        if use_kernel:
            from . import lattice_pallas_fused as lpf

            R_tile = min(64, nblk_l)
            ntiles = -(-nblk_l // R_tile)
            H_pad = ntiles * R_tile * SEG_BLK
            padn = H_pad - H
            r0 = jnp.pad(rows[:, 0], (0, padn))
            r1 = jnp.pad(rows[:, 1], (0, padn))
            d2p = jnp.pad(d2, (0, padn))
            cf3, t3 = lpf.seg_weights(
                r0.reshape(ntiles, R_tile, 128),
                r1.reshape(ntiles, R_tile, 128),
                d2p.reshape(ntiles, R_tile, 128), n_hit_l,
                interpret=_pallas_interpret())
            # Remap the pad sentinel H -> H_pad: the prefix/cf arrays'
            # dedicated zero entries sit past the PADDED grid.
            pre2 = jnp.where(pre_l == H, H_pad, pre_l)
            end2 = jnp.where(end_l == H, H_pad, end_l)
            sums_l = _interval_from_blocks(
                cf3.reshape(-1), t3.reshape(-1), pre2, end2, dtype)
            acc = acc.at[occ_l].add(sums_l)
            continue
        s_sorted = (anchors[:, None] + jnp.cumsum(
            d2.reshape(nblk_l, SEG_BLK).at[:, 0].set(0.0),
            axis=1)).reshape(-1)
        w = jnp.exp(rows[:, 0] + rows[:, 1] + s_sorted)
        # Zero the miss tail: its gathered rows are finite garbage and
        # the last real segment can share a SEG_BLK block with it.
        w = jnp.where(jnp.arange(H, dtype=jnp.int32) < n_hit_l, w, 0.0)
        acc = acc.at[occ_l].add(_interval_sums(w, pre_l, end_l, dtype))
    return acc[:nbins]


def fold_expected(tbl: DeviceTables, acc) -> np.ndarray:
    """Fold a backward_expected() accumulator to per-token counts (V,).

    Fast/bucket-path accumulators are slot-indexed (dispatched on
    length); the host maps slots to ids with its copy of the table.
    Exact-path accumulators pass through.
    """
    acc = np.asarray(acc, dtype=np.float64)
    if acc.shape[0] == tbl.vocab_size:
        return acc
    if tbl.bk_slot_to_id is not None and \
            acc.shape[0] == tbl.bk_slot_to_id.shape[0]:
        mapping = tbl.bk_slot_to_id
    else:
        mapping = tbl.slot_to_id
    expected = np.zeros(tbl.vocab_size, dtype=np.float64)
    valid = mapping >= 0
    np.add.at(expected, mapping[valid], acc[valid])
    return expected


# ---------------------------------------------------------------------------
# Device-side Viterbi frequency counts
# ---------------------------------------------------------------------------


def _viterbi_freq_impl(
    tbl: DeviceTables,
    batch: DeviceBatch,
    dp: jax.Array,       # (B, W) from viterbi()
    best_l: jax.Array,   # (B, W)
    ends_countable: jax.Array,  # (B, W+1) bool: ends of spans to count
                                # (whole non-empty spans ONLY — the
                                # caller builds it from its span list)
    C: int = 512,
    unroll: int = 16,
    vpad: int = 0,       # static padded id space (>= vocab size, pinned
                         # per session so prune rounds never recompile)
) -> jax.Array:
    """Per-token Viterbi occurrence counts computed ON DEVICE
    (reference: src/prune.rs:205-246 counts with rayon + host memory).

    The round-1..3 path fetched the full (B, W) backpointer matrix to
    the host per group and backtracked in C++ — ~1 byte per corpus
    byte over the host link, the dominant cost of the frequency pass at
    >= 1 GB through a slow relay. Here the backtrack happens in-graph:

      1. a descending chunked scan walks the backpointer chains of
         every countable sample end simultaneously (carry: the next
         on-path boundary per row), marking token-end positions;
      2. on-path positions resolve their token ID with the exact
         96-bit-check probe against the (t1_exact, t2_exact) tables —
         TWO row gathers per corpus position (not per (pos, len));
      3. an int32 scatter-add bins the ids; only the (V,) count vector
         ever leaves the device (psum-able on a mesh).

    Unreachable ends (NoPath) contribute garbage chains; callers MUST
    check span-end dp finiteness (pick_span_values_device) and discard
    the whole pass on failure, exactly like the host path.
    """
    B = dp.shape[0]
    W = batch.width
    V = vpad or tbl.vocab_size
    assert W % C == 0
    nchunks = W // C
    ends = ends_countable[:, 1 : W + 1]  # end at dp index p = q+1
    starts = batch.is_start[:, 1 : W + 1]

    def chunk_body(carry, chunk_idx_rev):
        nxt, counts = carry
        chunk_idx = (nchunks - 1) - chunk_idx_rev
        cs = chunk_idx * C
        bl = jax.lax.dynamic_slice(best_l, (0, cs), (B, C))
        en = jax.lax.dynamic_slice(ends, (0, cs), (B, C))
        st = jax.lax.dynamic_slice(starts, (0, cs), (B, C))

        def step(nxt_c, xs):
            bl_q, en_q, st_q, q_abs = xs  # (B,) each, scalar dp index
            # A chain arriving at its sample's START is complete: a
            # contiguous previous sample's last token must not be
            # consumed by this walk (the packing places samples
            # back-to-back within a row).
            nxt_c = jnp.where((nxt_c == q_abs) & st_q,
                              jnp.int32(-1), nxt_c)
            nxt_c = jnp.where(en_q, q_abs, nxt_c)
            on = nxt_c == q_abs
            l = jnp.where(on, bl_q.astype(jnp.int32), jnp.int32(0))
            nxt_c = (jnp.where(on, q_abs - l, nxt_c)).astype(jnp.int32)
            return nxt_c, (on, l)

        qs = (cs + 1 + jnp.arange(C)).astype(jnp.int32)
        nxt, outs = jax.lax.scan(
            step, nxt,
            (jnp.moveaxis(bl, 1, 0)[::-1], jnp.moveaxis(en, 1, 0)[::-1],
             jnp.moveaxis(st, 1, 0)[::-1], qs[::-1]),
            unroll=min(unroll, C))
        on_rev, l_rev = outs  # (C, B) positions descending
        on = jnp.moveaxis(on_rev[::-1], 0, 1)  # (B, C)
        l = jnp.moveaxis(l_rev[::-1], 0, 1)

        # Token ends at dp index p = cs+q+1, spans [p-l, p): resolve its
        # id with the exact probe (fp over the span, 96-bit check).
        pos_end = (batch.pad + cs + 1
                   + jnp.arange(C)).astype(jnp.int32)[None, :]
        pe1 = jax.lax.dynamic_slice(batch.p1, (0, batch.pad + cs + 1),
                                    (B, C))
        pe2 = jax.lax.dynamic_slice(batch.p2, (0, batch.pad + cs + 1),
                                    (B, C))
        start = pos_end - l  # (B, C) padded index of token start
        ps1 = jnp.take_along_axis(batch.p1, start, axis=1)
        ps2 = jnp.take_along_axis(batch.p2, start, axis=1)
        rv1 = jnp.take(batch.rinv1, start.reshape(-1)).reshape(B, C)
        rv2 = jnp.take(batch.rinv2, start.reshape(-1)).reshape(B, C)
        fp1 = (pe1 - ps1) * rv1
        fp2 = (pe2 - ps2) * rv2
        a1 = (l * np.int32(np.uint32(H.IDX_A1).view(np.int32)))
        a2 = (l * np.int32(np.uint32(H.IDX_A2).view(np.int32)))
        m1 = jnp.int32(np.uint32(H.IDX_M1).view(np.int32))
        m2 = jnp.int32(np.uint32(H.IDX_M2).view(np.int32))
        shift = jnp.int32(32 - tbl.bits)
        idx1 = jax.lax.shift_right_logical((fp1 ^ a1) * m1, shift)
        idx2 = jax.lax.shift_right_logical((fp2 ^ a2) * m2, shift)
        e1 = jnp.take(tbl.t1_exact, idx1, axis=0)
        e2 = jnp.take(tbl.t2_exact, idx2, axis=0)
        lm = l.astype(jnp.int32)
        m1ok = (e1[..., 0] == fp1) & (e1[..., 1] == fp2) & (
            jax.lax.shift_right_logical(e1[..., 2], jnp.int32(24)) == lm)
        m2ok = (e2[..., 0] == fp1) & (e2[..., 1] == fp2) & (
            jax.lax.shift_right_logical(e2[..., 2], jnp.int32(24)) == lm)
        ids = jnp.where(m1ok, e1[..., 2] & 0xFFFFFF,
                        jnp.where(m2ok, e2[..., 2] & 0xFFFFFF, V))
        ids = jnp.where(on & (l > 0), ids, V)
        # Spread the off-path majority over a scratch region: one hot
        # trash address would serialize the scatter's read-modify-write
        # (same trick as backward_expected).
        flat = ids.reshape(-1)
        spread = jnp.arange(flat.shape[0], dtype=jnp.int32) & 4095
        flat = jnp.where(flat >= V, V + spread, flat)
        counts = counts.at[flat].add(1, mode="drop")
        return (nxt, counts), None

    nxt0 = jnp.full((B,), jnp.int32(-1))
    counts0 = jnp.zeros((V + 4096,), jnp.int32)
    (nxt, counts), _ = jax.lax.scan(chunk_body, (nxt0, counts0),
                                    jnp.arange(nchunks))
    return counts[:V]


def viterbi_freq(tbl, batch, dp, best_l, ends_countable, vpad, C=512,
                 unroll=16, dtype=jnp.float32):
    """Jitted entry for _viterbi_freq_impl (see _op_worker). `vpad` is
    the session-pinned padded id space (static; pass the INITIAL vocab
    size so shrinking rounds reuse one executable)."""
    return _dispatch("viterbi_freq", tbl, batch, C=C, unroll=unroll,
                     dtype=dtype, A=dp, Bt=best_l, seg=None,
                     cache=ends_countable, vpad=vpad)


# ---------------------------------------------------------------------------
# Host-side backtracking
# ---------------------------------------------------------------------------


def _native_flat_backtrack(packed: PackedBatch, dp: np.ndarray,
                           best_l: np.ndarray, native_model):
    """Shared marshalling for tg_backtrack_ids: span arrays + finite-dp
    flags in, (flat_ids, lens, offs, span_lengths) out. lens -1 marks
    NoPath spans (caller policy); an inconsistent-backpointer -2
    raises here."""
    n = len(packed.spans)
    sr = np.fromiter((sp[0] for sp in packed.spans), np.int64, n)
    ss = np.fromiter((sp[1] for sp in packed.spans), np.int64, n)
    se = np.fromiter((sp[2] for sp in packed.spans), np.int64, n)
    per_span_dp = dp.ndim == 1
    dpe = dp[:n] if per_span_dp else dp[sr, np.maximum(se - 1, 0)]
    ok = np.isfinite(dpe)
    flat, lens, offs = native_model.backtrack_ids(
        packed.bytes_arr, best_l, sr, ss, se, ok.astype(np.uint8))
    if (lens == -2).any():
        k = int(np.nonzero(lens == -2)[0][0])
        raise RuntimeError(
            "native backtrack: inconsistent backpointers "
            f"(span {k}); model/table mismatch")
    return flat, lens, offs, se - ss


def backtrack(
    packed: PackedBatch,
    dp: np.ndarray,
    best_l: np.ndarray,
    token_to_id,  # Mapping[bytes, int]
    raise_no_path: bool = True,
    native_model=None,  # utils.nativelib.NativeModel for the threaded path
) -> List[Optional[List[int]]]:
    """Recover token id sequences per snippet span from device outputs.

    Mirrors the reference backtrack (src/model.rs:112-127); an
    unreachable sample end raises NoPath(len, len) like the reference's
    dp[n].start == None case. Token ids are resolved from the matched
    byte spans via `token_to_id` (the bytes uniquely identify the token;
    duplicate-value vocab entries resolve to the later id, matching the
    trie/HashMap overwrite semantics, reference src/model.rs:20-23).
    """
    rows = packed.bytes_arr
    # dp may be the full (B, W) array or a 1-D per-span array of the
    # dp values at each span end (cheaper to fetch from device).
    per_span_dp = dp.ndim == 1
    if native_model is not None and packed.spans:
        # Threaded native resolution (tg_backtrack_ids): the trie's
        # later-id-overwrite lookup matches token_to_id exactly; the
        # Python loop below costs ~1-2us/token and bounds the
        # frequency/merge/encode passes at corpus scale.
        flat, lens, offs, span_len = _native_flat_backtrack(
            packed, dp, best_l, native_model)
        out_n: List[Optional[List[int]]] = []
        for k in range(len(packed.spans)):
            c = int(lens[k])
            if c == -1:
                if raise_no_path:
                    raise NoPathError(int(span_len[k]), int(span_len[k]))
                out_n.append(None)
            else:
                out_n.append(flat[offs[k] : offs[k] + c].tolist())
        return out_n
    out: List[Optional[List[int]]] = []
    for k, (r, s, e, _si, _ci) in enumerate(packed.spans):
        if e == s:
            out.append([])
            continue
        dp_end = dp[k] if per_span_dp else dp[r, e - 1]
        if not np.isfinite(dp_end):
            if raise_no_path:
                raise NoPathError(e - s, e - s)
            out.append(None)
            continue
        ids: List[int] = []
        row = rows[r]
        pos = e
        while pos > s:
            l = int(best_l[r, pos - 1])
            ids.append(token_to_id[row[pos - l : pos].tobytes()])
            pos -= l
        ids.reverse()
        out.append(ids)
    return out


def backtrack_freq_counts(
    packed: PackedBatch,
    dp: np.ndarray,
    best_l: np.ndarray,
    vocab_size: int,
    token_to_id,
    native_model=None,
) -> np.ndarray:
    """Per-token occurrence counts over all spans — the frequency
    pass's reduction. With the native backtrack this is ONE flat id
    buffer + a bincount (no per-span Python lists); falls back to the
    list-based backtrack otherwise. Raises NoPath like backtrack()."""
    freqs = np.zeros(vocab_size, dtype=np.int64)
    if not packed.spans:
        return freqs
    if native_model is not None:
        flat, lens, offs, span_len = _native_flat_backtrack(
            packed, dp, best_l, native_model)
        if (lens == -1).any():
            k = int(np.nonzero(lens == -1)[0][0])
            raise NoPathError(int(span_len[k]), int(span_len[k]))
        sizes = np.diff(offs)  # byte capacity per span region
        pos = np.arange(int(offs[-1]), dtype=np.int64) \
            - np.repeat(offs[:-1], sizes)
        valid = pos < np.repeat(lens, sizes)
        return np.bincount(flat[: int(offs[-1])][valid],
                           minlength=vocab_size).astype(np.int64)
    for ids in backtrack(packed, dp, best_l, token_to_id):
        if ids:
            np.add.at(freqs, np.asarray(ids, dtype=np.int64), 1)
    return freqs


def reassemble(packed: PackedBatch, per_span: List, num_samples: int) -> List:
    """Concatenate per-snippet results back into per-sample results."""
    buckets: dict = {}
    for (r, s, e, si, ci), ids in zip(packed.spans, per_span):
        buckets.setdefault(si, []).append((ci, ids))
    out = []
    for si in range(num_samples):
        parts = sorted(buckets.get(si, []), key=lambda x: x[0])
        ids: List[int] = []
        for _, part in parts:
            if part is None:
                out.append(None)
                break
            ids.extend(part)
        else:
            out.append(ids)
    return out
