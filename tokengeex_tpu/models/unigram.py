"""Public unigram Model.

Facade over three interchangeable execution backends:

- `oracle`  — pure-Python float64 exact implementation (models/oracle.py),
              the executable spec mirroring reference src/model.rs.
- `native`  — C++ implementation with identical semantics (native/), used
              for fast host-side corpus passes.
- `device`  — JAX/Pallas TPU path (ops/), used for batched encode and EM.

All backends must agree byte-for-byte on dropout=0 encodes (the native
and oracle paths exactly; the device f32 path statistically, with an
f64 device mode for conformance).
"""

from __future__ import annotations

import random
from typing import Iterator, List, Optional, Sequence, Tuple

from ..core.types import ScoredToken
from .oracle import Lattice, OracleModel


class Model:
    """Unigram tokenization model (reference: src/model.rs:7-200)."""

    def __init__(self, vocab: List[ScoredToken]):
        self._oracle = OracleModel(vocab)
        self._native = None  # lazily-built native handle
        self._device = None  # lazily-built device tables

    # -- Construction ------------------------------------------------------

    @staticmethod
    def from_vocab(vocab: List[ScoredToken]) -> "Model":
        return Model(vocab)

    @property
    def vocab(self) -> List[ScoredToken]:
        return self._oracle.vocab

    def vocab_size(self) -> int:
        return self._oracle.vocab_size()

    def add_tokens(self, tokens: List[ScoredToken]) -> None:
        self._oracle.add_tokens(tokens)
        self._invalidate()

    def _invalidate(self) -> None:
        self._native = None
        self._device = None

    # -- Backends ----------------------------------------------------------

    def native(self):
        """Native (C++) model handle; None if the library is unavailable."""
        if self._native is None:
            try:
                from ..utils import nativelib

                self._native = nativelib.NativeModel(self.vocab)
            except Exception:
                self._native = False
        return self._native or None

    def device(self):
        """Device (TPU/JAX) token tables; built on first use."""
        if self._device is None:
            from ..ops.match_table import TokenTable

            self._device = TokenTable.build(self.vocab)
        return self._device

    # -- Core API ----------------------------------------------------------

    def encode(
        self,
        text: str,
        dropout: float = 0.0,
        rng: Optional[random.Random] = None,
    ) -> List[int]:
        """Viterbi-encode a single string (reference: src/model.rs:59-129)."""
        if dropout == 0.0 and rng is None:
            native = self.native()
            if native is not None:
                return native.encode(text.encode("utf-8"))
        return self._oracle.encode(text, dropout, rng)

    def encode_batch(
        self,
        texts: Sequence[str],
        dropout: float = 0.0,
    ) -> List[List[int]]:
        if dropout == 0.0:
            native = self.native()
            if native is not None:
                return native.encode_batch([t.encode("utf-8") for t in texts])
        return [self.encode(t, dropout) for t in texts]

    def decode(self, ids: Sequence[int]) -> str:
        return self._oracle.decode(ids)

    def decode_bytes(self, ids: Sequence[int]) -> bytes:
        return self._oracle.decode_bytes(ids)

    def token_to_id(self, token: bytes) -> Optional[int]:
        return self._oracle.token_to_id(token)

    def id_to_token(self, tid: int) -> Optional[ScoredToken]:
        return self._oracle.id_to_token(tid)

    def common_prefix_search(self, s: bytes) -> Iterator[Tuple[int, int]]:
        return self._oracle.common_prefix_search(s)

    # -- Lattice helpers (used by training) --------------------------------

    def make_lattice(self, sentence: bytes) -> Lattice:
        lattice = Lattice(sentence)
        self._oracle.populate_nodes(lattice, 0.0)
        return lattice

    @property
    def oracle(self) -> OracleModel:
        return self._oracle
