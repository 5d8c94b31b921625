"""Tokenizer pipeline: special tokens -> processors -> model.

Reference: src/tokenizer.rs. Special token ids live AFTER the base
vocabulary: id = base_vocab_size + index (reference:
src/tokenizer.rs:70-77,203-207,219-226). The JSON checkpoint schema is
version "2.0": {version, special_tokens, processors, vocab}
(reference: src/tokenizer.rs:349-366) with a strict version check
(reference: src/tokenizer.rs:423-429).
"""

from __future__ import annotations

import json
import random
from typing import Dict, List, Optional, Sequence

from ..models.unigram import Model
from .processors import Processor, processor_from_json_obj
from .splitter import split_special_tokens
from .types import ScoredToken, TokenGeeXError, TokenIdOutOfBoundsError

SERIALIZATION_VERSION = "2.0"


class Tokenizer:
    def __init__(
        self,
        model: Model,
        processors: Sequence[Processor] = (),
        special_tokens: Sequence[str] = (),
    ):
        self.model = model
        self.processors: List[Processor] = list(processors)
        self._special_tokens: List[str] = []
        self.special_tokens_map: Dict[str, int] = {}
        self.add_special_tokens(special_tokens)

    # -- Special tokens ----------------------------------------------------

    def add_special_tokens(self, tokens: Sequence[str]) -> None:
        """Duplicates are ignored (reference: src/tokenizer.rs:39-53)."""
        for token in tokens:
            if token in self.special_tokens_map:
                continue
            self.special_tokens_map[token] = len(self._special_tokens)
            self._special_tokens.append(token)

    def add_base_tokens(self, tokens: List[ScoredToken]) -> None:
        self.model.add_tokens(tokens)

    # -- Encode ------------------------------------------------------------

    def encode(self, text: str, dropout: float = 0.0,
               rng: Optional[random.Random] = None) -> List[int]:
        """Reference: src/tokenizer.rs:65-89."""
        ids: List[int] = []
        base = self.model.vocab_size()
        for substr, is_special in split_special_tokens(text, self._special_tokens):
            if is_special:
                ids.append(base + self.special_tokens_map[substr])
            else:
                processed = substr
                for p in self.processors:
                    processed = p.preprocess(processed)
                ids.extend(self.model.encode(processed, dropout, rng))
        return ids

    def encode_ordinary(self, text: str, dropout: float = 0.0,
                        rng: Optional[random.Random] = None) -> List[int]:
        """Skip special-token handling (reference: src/tokenizer.rs:92-99)."""
        processed = text
        for p in self.processors:
            processed = p.preprocess(processed)
        return self.model.encode(processed, dropout, rng)

    def encode_batch(self, texts: Sequence[str], dropout: float = 0.0,
                     backend: str = "auto") -> List[List[int]]:
        """Batch encode (reference: src/tokenizer.rs:102-111 — rayon
        par_iter over texts).

        backend="device" runs the Viterbi segmentation of all ordinary
        spans as one packed TPU batch; "native" gathers every ordinary
        span across the batch and feeds the threaded C++ runtime's
        batch encode (pthread pool) in one call, so host batches
        parallelize like the reference's rayon path instead of a serial
        Python loop. "auto" picks per measured crossover — device for
        large batches at fused-probe (vscan) vocabulary sizes, host
        otherwise (see _auto_backend).
        """
        return self._encode_batch_host(texts, ordinary=False,
                                       dropout=dropout, backend=backend)

    def encode_ordinary_batch(self, texts: Sequence[str], dropout: float = 0.0,
                              backend: str = "auto") -> List[List[int]]:
        return self._encode_batch_host(texts, ordinary=True,
                                       dropout=dropout, backend=backend)

    def _layout_spans(self, texts: Sequence[str], ordinary: bool):
        """Per text, a list of ("special", id) | ("span", span_index)
        parts plus the flat list of preprocessed ordinary spans."""
        base = self.model.vocab_size()
        layout: List[List] = []
        spans: List[str] = []
        for text in texts:
            parts = []
            pieces = (
                [(text, False)] if ordinary
                else split_special_tokens(text, self._special_tokens)
            )
            for substr, is_special in pieces:
                if is_special:
                    parts.append(("special", base + self.special_tokens_map[substr]))
                else:
                    processed = substr
                    for p in self.processors:
                        processed = p.preprocess(processed)
                    parts.append(("span", len(spans)))
                    spans.append(processed)
            layout.append(parts)
        return layout, spans

    @staticmethod
    def _stitch(layout: List[List], encoded: List[List[int]]) -> List[List[int]]:
        out: List[List[int]] = []
        for parts in layout:
            ids: List[int] = []
            for kind, val in parts:
                if kind == "special":
                    ids.append(val)
                else:
                    ids.extend(encoded[val])
            out.append(ids)
        return out

    def _auto_backend(self, spans: Sequence[str]) -> str:
        """Measured host/device crossover (BENCH_r05 / BASELINE.md r5,
        one v5e chip vs a 4-thread host):

          - vocab <= ~16k (tables fit VMEM -> fused-probe kernels):
            device sustains ~80 MB/s vs ~27-45 MB/s native host — the
            device wins once the batch amortizes its ~0.3-1 s dispatch
            + packing overhead (>= TGX_ENCODE_DEVICE_MIN, default 4 MB,
            i.e. overhead <= ~20% at the measured rates);
          - past the vscan boundary the device bucket probe (~22 MB/s
            at 32k vocab, ~11 at 262k) LOSES to the native host path:
            stay host;
          - without the native runtime the host fallback is the Python
            oracle (~0.2 MB/s): any TPU batch over ~64 KB wins.
        """
        import os

        try:
            import jax

            on_tpu = jax.default_backend() == "tpu"
        except Exception:  # noqa: BLE001 — no usable device backend
            return "native"
        if not on_tpu:
            return "native"
        from ..ops.lattice_jax import vscan_max_bits

        if self.model.vocab_size() > (1 << (vscan_max_bits() - 1)):
            return "native"
        total = sum(len(s) for s in spans)
        floor = int(os.environ.get("TGX_ENCODE_DEVICE_MIN", 4 << 20))
        if self.model.native() is None:
            floor = min(floor, 64 << 10)
        return "device" if total >= floor else "native"

    def _encode_batch_host(self, texts: Sequence[str], ordinary: bool,
                           dropout: float, backend: str) -> List[List[int]]:
        layout, spans = self._layout_spans(texts, ordinary)
        if backend == "auto":
            backend = self._auto_backend(spans)
        if backend == "device":
            return self._encode_batch_device(texts, ordinary=ordinary,
                                             dropout=dropout)
        encoded = self.model.encode_batch(spans, dropout)
        return self._stitch(layout, encoded)

    def _encode_batch_device(self, texts: Sequence[str],
                             ordinary: bool,
                             dropout: float = 0.0) -> List[List[int]]:
        """Gather every ordinary span across the batch, Viterbi-encode
        them as one packed device batch, and stitch special ids back."""
        from ..train.estep_device import encode_corpus_device

        layout, spans = self._layout_spans(texts, ordinary)
        encoded = encode_corpus_device(
            self.model, [s.encode("utf-8") for s in spans], dropout=dropout)
        return self._stitch(layout, encoded)

    # -- Decode ------------------------------------------------------------

    def decode(self, ids: Sequence[int], include_special_tokens: bool = False) -> str:
        """Split at special ids; postprocess in REVERSE processor order
        (reference: src/tokenizer.rs:126-176)."""
        base = self.model.vocab_size()
        out: List[str] = []
        span: List[int] = []

        def flush(span_ids: Sequence[int]) -> None:
            decoded = self.model.decode(span_ids)
            for p in reversed(self.processors):
                decoded = p.postprocess(decoded)
            out.append(decoded)

        for tid in ids:
            if tid >= base:
                flush(span)
                span = []
                special_idx = tid - base
                if special_idx >= len(self._special_tokens):
                    raise TokenIdOutOfBoundsError(tid)
                if include_special_tokens:
                    out.append(self._special_tokens[special_idx])
            else:
                span.append(tid)
        flush(span)
        return "".join(out)

    def decode_batch(self, idss: Sequence[Sequence[int]],
                     include_special_tokens: bool = False) -> List[str]:
        """Threaded batch decode (reference: src/tokenizer.rs:178-187
        runs rayon into_par_iter): sequences without special ids decode
        through the C++ pool in one call; sequences containing special
        ids (rare) take the per-sequence split path."""
        nm = self.model.native()
        if nm is None or not idss:
            return [self.decode(ids, include_special_tokens)
                    for ids in idss]
        base = self.model.vocab_size()
        out: List[Optional[str]] = [None] * len(idss)
        plain_idx = [i for i, ids in enumerate(idss)
                     if not any(t >= base or t < 0 for t in ids)]
        if plain_idx:
            raws = nm.decode_batch([idss[i] for i in plain_idx])
            for i, raw in zip(plain_idx, raws):
                decoded = raw.decode("utf-8", errors="replace")
                for p in reversed(self.processors):
                    decoded = p.postprocess(decoded)
                out[i] = decoded
        for i, ids in enumerate(idss):
            if out[i] is None:
                out[i] = self.decode(ids, include_special_tokens)
        return out  # type: ignore[return-value]

    # -- Vocabulary lookups (reference: src/tokenizer.rs:189-259) ----------

    def token_to_id(self, token: bytes) -> Optional[int]:
        tid = self.base_token_to_id(token)
        if tid is not None:
            return tid
        try:
            return self.special_token_to_id(token.decode("utf-8"))
        except UnicodeDecodeError:
            return None

    def base_token_to_id(self, token: bytes) -> Optional[int]:
        return self.model.token_to_id(token)

    def special_token_to_id(self, token: str) -> Optional[int]:
        idx = self.special_tokens_map.get(token)
        if idx is None:
            return None
        return idx + self.model.vocab_size()

    def id_to_token(self, tid: int) -> Optional[bytes]:
        special = self.id_to_special_token(tid)
        if special is not None:
            return special.encode("utf-8")
        token = self.id_to_base_token(tid)
        if token is not None:
            return token.value
        return None

    def id_to_special_token(self, tid: int) -> Optional[str]:
        base = self.model.vocab_size()
        if tid < base:
            return None
        idx = tid - base
        if idx < len(self._special_tokens):
            return self._special_tokens[idx]
        return None

    def id_to_base_token(self, tid: int) -> Optional[ScoredToken]:
        return self.model.id_to_token(tid)

    def is_special(self, tid: int) -> bool:
        base = self.model.vocab_size()
        return tid >= base and (tid - base) < len(self._special_tokens)

    def is_base(self, tid: int) -> bool:
        return tid < self.model.vocab_size()

    def special_tokens(self) -> List[str]:
        """Reference: src/tokenizer.rs:245-247 (returns a copy)."""
        return list(self._special_tokens)

    def vocab_size(self) -> int:
        return self.model.vocab_size() + len(self._special_tokens)

    def base_vocab_size(self) -> int:
        return self.model.vocab_size()

    def special_vocab_size(self) -> int:
        return len(self._special_tokens)

    def common_prefix_search(self, text: str):
        return self.model.common_prefix_search(text.encode("utf-8"))

    # -- Serialization (JSON v2.0) ----------------------------------------

    def to_json_obj(self) -> dict:
        return {
            "version": SERIALIZATION_VERSION,
            "special_tokens": list(self._special_tokens),
            "processors": [p.to_json_obj() for p in self.processors],
            "vocab": [t.to_json_obj() for t in self.model.vocab],
        }

    def to_string(self, pretty: bool = False) -> str:
        if pretty:
            return json.dumps(self.to_json_obj(), ensure_ascii=False, indent=2)
        return json.dumps(self.to_json_obj(), ensure_ascii=False,
                          separators=(",", ":"))

    def save(self, filepath: str) -> None:
        """Pretty JSON, like serde_json::to_string_pretty
        (reference: src/tokenizer.rs:261-265)."""
        with open(filepath, "w", encoding="utf-8") as f:
            f.write(self.to_string(pretty=True))

    @staticmethod
    def from_json_obj(obj: dict) -> "Tokenizer":
        for key in obj:
            if key not in ("version", "special_tokens", "processors", "vocab"):
                raise TokenGeeXError(f"unknown field {key!r} in Tokenizer")
        version = obj.get("version")
        if version is None:
            raise TokenGeeXError("missing field 'version'")
        if version != SERIALIZATION_VERSION:
            raise TokenGeeXError(f"unsupported version: {version}")
        vocab = [ScoredToken.from_json_obj(t) for t in obj.get("vocab", [])]
        processors = [processor_from_json_obj(p) for p in obj.get("processors", [])]
        special_tokens = obj.get("special_tokens", [])
        return Tokenizer(Model(vocab), processors, special_tokens)

    @staticmethod
    def from_str(s: str) -> "Tokenizer":
        return Tokenizer.from_json_obj(json.loads(s))

    @staticmethod
    def from_file(filepath: str) -> "Tokenizer":
        with open(filepath, "r", encoding="utf-8") as f:
            return Tokenizer.from_str(f.read())

    # -- Pickle via JSON (reference: bindings/python/src/lib.rs:196-223) ---

    def __getstate__(self):
        return self.to_string()

    def __setstate__(self, state):
        other = Tokenizer.from_str(state)
        self.model = other.model
        self.processors = other.processors
        self._special_tokens = other._special_tokens
        self.special_tokens_map = other.special_tokens_map

    def __reduce__(self):
        return (Tokenizer.from_str, (self.to_string(),))
