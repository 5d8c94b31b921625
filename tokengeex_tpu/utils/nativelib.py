"""ctypes bindings for the native C++ host runtime (native/).

The native library implements the host-side hot paths (exact f64
Viterbi, lattice marginals, nbest alternatives, frequency/pair counts)
with semantics identical to models/oracle.py. It is built on demand
with g++; everything degrades to the Python oracle when unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.types import NoPathError, ScoredToken

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.environ.get("TOKENGEEX_NATIVE_DIR") or os.path.join(_REPO_ROOT, "native")
_SRC = os.path.join(_NATIVE_DIR, "tokengeex_native.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libtokengeex_native.so")


def _lib_target() -> str:
    """Build destination: next to the source if writable, else a per-user
    cache dir (read-only checkouts, installed packages)."""
    if os.access(_NATIVE_DIR, os.W_OK):
        return _LIB
    cache = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    d = os.path.join(cache, "tokengeex_tpu")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "libtokengeex_native.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def default_threads() -> int:
    env = os.environ.get("TOKENGEEX_NUM_THREADS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 1


def build(force: bool = False) -> str:
    """Compile the native library with g++ -O3."""
    target = _lib_target()
    if force or not os.path.exists(target) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(target)
    ):
        if not os.path.exists(_SRC):
            raise FileNotFoundError(f"native source not found: {_SRC}")
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-pthread", _SRC, "-o", target,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return target


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _lib_failed:
            return None
        try:
            path = build()
            lib = ctypes.CDLL(path)
        except Exception as e:
            logging.getLogger("tokengeex").warning(
                "native runtime unavailable (%s: %s); falling back to the "
                "Python oracle — set TOKENGEEX_NATIVE_DIR to the directory "
                "containing tokengeex_native.cpp to enable it",
                type(e).__name__, e)
            _lib_failed = True
            return None
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        c_f64p = ctypes.POINTER(ctypes.c_double)

        lib.tg_model_new.restype = ctypes.c_void_p
        lib.tg_model_new.argtypes = [c_u8p, c_i64p, c_f64p, ctypes.c_int64]
        lib.tg_model_free.argtypes = [ctypes.c_void_p]
        lib.tg_encode_batch.restype = ctypes.c_int64
        lib.tg_encode_batch.argtypes = [
            ctypes.c_void_p, c_u8p, c_i64p, ctypes.c_int64,
            c_i32p, ctypes.c_int64, c_i64p, ctypes.c_int,
        ]
        lib.tg_estep_batch.restype = ctypes.c_int64
        lib.tg_estep_batch.argtypes = [
            ctypes.c_void_p, c_u8p, c_i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_uint64,
            c_f64p, c_f64p, ctypes.c_int,
        ]
        lib.tg_prune_alternatives.restype = ctypes.c_int64
        lib.tg_prune_alternatives.argtypes = [
            ctypes.c_void_p, c_u8p, c_i32p, ctypes.c_int64, c_i64p, ctypes.c_int,
        ]
        lib.tg_count_frequencies.restype = ctypes.c_int64
        lib.tg_count_frequencies.argtypes = [
            ctypes.c_void_p, c_u8p, c_i64p, ctypes.c_int64, c_i64p, ctypes.c_int,
        ]
        lib.tg_count_pairs.restype = ctypes.c_int64
        lib.tg_count_pairs.argtypes = [
            ctypes.c_void_p, c_u8p, c_i64p, ctypes.c_int64,
            c_i32p, c_i32p, c_i64p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.tg_substring_count.restype = ctypes.c_int64
        lib.tg_substring_count.argtypes = [
            c_u8p, c_i64p, ctypes.c_int64,
            c_i32p, c_u8p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_double, ctypes.c_uint64,
            c_u8p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.tg_decode_batch.restype = ctypes.c_int64
        lib.tg_decode_batch.argtypes = [
            ctypes.c_void_p, c_i32p, c_i64p, ctypes.c_int64,
            c_u8p, ctypes.c_int64, c_i64p, ctypes.c_int,
        ]
        lib.tg_mine.restype = ctypes.c_int64
        lib.tg_mine.argtypes = [
            c_u8p, c_i64p, ctypes.c_int64,
            c_i32p, c_u8p, ctypes.c_int32, ctypes.c_int32,
            c_u8p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.tg_mask_count.restype = ctypes.c_int64
        lib.tg_mask_count.argtypes = [
            c_u8p, ctypes.c_int64, ctypes.c_int64,
            c_u8p, ctypes.c_int64,
            c_i64p, c_i64p, c_i64p, c_i64p, ctypes.c_int64,
            c_u8p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.tg_backtrack_ids.restype = ctypes.c_int64
        lib.tg_backtrack_ids.argtypes = [
            ctypes.c_void_p, c_u8p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8),
            c_i64p, c_i64p, c_i64p, c_u8p, ctypes.c_int64,
            c_i32p, c_i64p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def _concat(samples: Sequence[bytes]) -> Tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(samples) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in samples], out=offsets[1:])
    data = np.frombuffer(b"".join(samples), dtype=np.uint8) if samples else np.zeros(0, np.uint8)
    return np.ascontiguousarray(data), offsets


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeModel:
    """Native-backed unigram model handle."""

    def __init__(self, vocab: Sequence[ScoredToken]):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        data, offsets = _concat([t.value for t in vocab])
        scores = np.asarray([t.score for t in vocab], dtype=np.float64)
        self._keepalive = (data, offsets, scores)
        self.vocab_size = len(vocab)
        self._handle = lib.tg_model_new(
            _u8p(data), _i64p(offsets), _f64p(scores), len(vocab)
        )

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.tg_model_free(self._handle)
                self._handle = None
        except Exception:
            pass

    def encode(self, sample: bytes) -> List[int]:
        return self.encode_batch([sample])[0]

    def backtrack_ids(self, rows: np.ndarray, best_l: np.ndarray,
                      span_row: np.ndarray, span_start: np.ndarray,
                      span_end: np.ndarray, span_ok: np.ndarray,
                      num_threads: Optional[int] = None):
        """Resolve device Viterbi backpointers to token ids (threaded;
        see native tg_backtrack_ids). Returns (flat_ids, lens, offs):
        span k's ids are flat_ids[offs[k] : offs[k] + lens[k]];
        lens -1 = NoPath, -2 = inconsistent backpointers."""
        B, W = rows.shape
        rows = np.ascontiguousarray(rows, dtype=np.uint8)
        best_l = np.ascontiguousarray(best_l, dtype=np.int8)
        span_row = np.ascontiguousarray(span_row, dtype=np.int64)
        span_start = np.ascontiguousarray(span_start, dtype=np.int64)
        span_end = np.ascontiguousarray(span_end, dtype=np.int64)
        span_ok = np.ascontiguousarray(span_ok, dtype=np.uint8)
        lengths = span_end - span_start
        offs = np.zeros(len(span_row) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offs[1:])
        out_ids = np.empty(max(int(offs[-1]), 1), dtype=np.int32)
        out_lens = np.empty(max(len(span_row), 1), dtype=np.int64)
        self._lib.tg_backtrack_ids(
            self._handle, _u8p(rows), B, W,
            best_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            _i64p(span_row), _i64p(span_start), _i64p(span_end),
            _u8p(span_ok), len(span_row),
            _i32p(out_ids), _i64p(out_lens),
            num_threads or default_threads(),
        )
        return out_ids, out_lens[: len(span_row)], offs

    def encode_batch(self, samples: Sequence[bytes],
                     num_threads: Optional[int] = None) -> List[List[int]]:
        if not samples:
            return []
        data, offsets = _concat(samples)
        cap = max(int(offsets[-1]), 1)
        out_ids = np.empty(cap, dtype=np.int32)
        out_off = np.empty(len(samples) + 1, dtype=np.int64)
        r = self._lib.tg_encode_batch(
            self._handle, _u8p(data), _i64p(offsets), len(samples),
            _i32p(out_ids), cap, _i64p(out_off),
            num_threads or default_threads(),
        )
        if r <= -1000000000:
            raise RuntimeError("encode capacity error")  # cap == total bytes, unreachable
        if r < 0:
            i = int(-r - 1)
            n = len(samples[i])
            raise NoPathError(n, n)
        return [
            out_ids[out_off[i] : out_off[i + 1]].tolist()
            for i in range(len(samples))
        ]

    def estep(self, samples: Sequence[bytes], max_snippet: int = 81920,
              dropout: float = 0.0, seed: int = 0,
              num_threads: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Exact f64 E-step. Returns (expected[V], z_per_sample).

        dropout skips len>1 lattice candidates with the given probability
        (reference: src/model.rs:48-51), deterministically per
        (seed, sample index) regardless of thread count."""
        data, offsets = _concat(samples)
        expected = np.zeros(self.vocab_size, dtype=np.float64)
        z = np.zeros(len(samples), dtype=np.float64)
        r = self._lib.tg_estep_batch(
            self._handle, _u8p(data), _i64p(offsets), len(samples),
            max_snippet, float(dropout), seed & 0xFFFFFFFFFFFFFFFF,
            _f64p(expected), _f64p(z),
            num_threads or default_threads(),
        )
        if r < 0:
            i = int(-r - 1)
            raise ValueError(
                f"normalization constant is not finite (sample={i}, "
                f"len={len(samples[i])})"
            )
        return expected, z

    def prune_alternatives(self, num_threads: Optional[int] = None):
        """(always_keep[V] bool, alternatives: list[list[int]])
        (reference: src/prune.rs:179-203)."""
        keep = np.zeros(self.vocab_size, dtype=np.uint8)
        cap = max(self.vocab_size * 32, 1024)
        alt_ids = np.empty(cap, dtype=np.int32)
        alt_off = np.empty(self.vocab_size + 1, dtype=np.int64)
        r = self._lib.tg_prune_alternatives(
            self._handle, _u8p(keep), _i32p(alt_ids), cap, _i64p(alt_off),
            num_threads or default_threads(),
        )
        if r <= -1000000000:
            cap = int(-1000000000 - r)
            alt_ids = np.empty(cap, dtype=np.int32)
            r = self._lib.tg_prune_alternatives(
                self._handle, _u8p(keep), _i32p(alt_ids), cap, _i64p(alt_off),
                num_threads or default_threads(),
            )
        alts = [
            alt_ids[alt_off[i] : alt_off[i + 1]].tolist()
            for i in range(self.vocab_size)
        ]
        return keep.astype(bool), alts

    def count_frequencies(self, samples: Sequence[bytes],
                          num_threads: Optional[int] = None) -> np.ndarray:
        data, offsets = _concat(samples)
        freqs = np.zeros(self.vocab_size, dtype=np.int64)
        r = self._lib.tg_count_frequencies(
            self._handle, _u8p(data), _i64p(offsets), len(samples),
            _i64p(freqs), num_threads or default_threads(),
        )
        if r < 0:
            i = int(-r - 1)
            n = len(samples[i])
            raise NoPathError(n, n)
        return freqs

    def decode_batch(self, idss: Sequence[Sequence[int]],
                     num_threads: Optional[int] = None):
        """Per-sequence concatenated token bytes (threaded; reference:
        src/tokenizer.rs:178-187). Raises IndexError(seq index) on an
        out-of-range id."""
        n = len(idss)
        offsets = np.zeros(n + 1, dtype=np.int64)
        for i, ids in enumerate(idss):
            offsets[i + 1] = offsets[i] + len(ids)
        flat = np.empty(int(offsets[-1]), dtype=np.int32)
        for i, ids in enumerate(idss):
            flat[offsets[i] : offsets[i + 1]] = ids
        out_off = np.zeros(n + 1, dtype=np.int64)
        cap = max(1, int(offsets[-1]) * 8)
        while True:
            buf = np.empty(cap, dtype=np.uint8)
            r = self._lib.tg_decode_batch(
                self._handle, _i32p(flat), _i64p(offsets), n,
                _u8p(buf), cap, _i64p(out_off),
                num_threads or default_threads(),
            )
            if r <= -1000000000:
                cap = int(-1000000000 - r)
                continue
            if r < 0:
                raise IndexError(int(-r - 1))
            break
        raw = buf[: int(r)].tobytes()
        return [raw[out_off[i] : out_off[i + 1]] for i in range(n)]

    def count_pairs(self, samples: Sequence[bytes], cap: int = 1 << 20,
                    num_threads: Optional[int] = None):
        """[(a, b, freq)] sorted by freq desc (reference: src/merge.rs:53-84)."""
        data, offsets = _concat(samples)
        pa = np.empty(cap, dtype=np.int32)
        pb = np.empty(cap, dtype=np.int32)
        pn = np.empty(cap, dtype=np.int64)
        r = self._lib.tg_count_pairs(
            self._handle, _u8p(data), _i64p(offsets), len(samples),
            _i32p(pa), _i32p(pb), _i64p(pn), cap,
            num_threads or default_threads(),
        )
        if r < 0:
            i = int(-r - 1)
            n = len(samples[i])
            raise NoPathError(n, n)
        n = int(r)
        return list(zip(pa[:n].tolist(), pb[:n].tolist(), pn[:n].tolist()))


def substring_count(
    samples: Sequence[bytes],
    dfa=None,  # core.redfa.ByteDFA or None (allow everything)
    max_token_length: int = 24,
    insert_probability: float = 0.1,
    seed: int = 0,
    num_threads: Optional[int] = None,
):
    """Threaded DFA-filtered substring document-frequency counts
    (reference: src/generate.rs:54-139). Returns {str: count}."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    data, offsets = _concat(samples)
    if dfa is not None:
        dfa_next = np.ascontiguousarray(dfa.next, dtype=np.int32)
        dfa_accept = np.ascontiguousarray(dfa.accept, dtype=np.uint8)
        num_states = dfa_next.shape[0]
        start_state = dfa.start
    else:
        dfa_next = np.zeros((1, 256), dtype=np.int32)
        dfa_accept = np.zeros(1, dtype=np.uint8)
        num_states = 0
        start_state = 0

    return _drain_counts(lambda buf, cap: lib.tg_substring_count(
        _u8p(data), _i64p(offsets), len(samples),
        _i32p(dfa_next), _u8p(dfa_accept), num_states, start_state,
        max_token_length, insert_probability, seed,
        _u8p(buf), cap, num_threads or default_threads(),
    ))


def mine_counts(samples: Sequence[bytes], dfa,
                num_threads: Optional[int] = None) -> dict:
    """Threaded idiom mining: counts of non-overlapping leftmost-longest
    DFA matches (reference: src/mine.rs:21-48 runs rayon find_iter).
    Returns {bytes-as-str: count} like substring_count."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    data, offsets = _concat(samples)
    dfa_next = np.ascontiguousarray(dfa.next, dtype=np.int32)
    dfa_accept = np.ascontiguousarray(dfa.accept, dtype=np.uint8)
    return _drain_counts(lambda buf, cap: lib.tg_mine(
        _u8p(data), _i64p(offsets), len(samples),
        _i32p(dfa_next), _u8p(dfa_accept), dfa_next.shape[0], dfa.start,
        _u8p(buf), cap, num_threads or default_threads(),
    ))


def _drain_counts(call) -> dict:
    """Run a serialize_counts-style native call with an auto-growing
    output buffer and parse {token: count}."""
    cap = 1 << 24
    while True:
        buf = np.empty(cap, dtype=np.uint8)
        r = call(buf, cap)
        if r <= -1000000000:
            cap = int(-1000000000 - r)
            continue
        break

    out = {}
    raw = buf[: int(r)].tobytes()
    off = 0
    while off < len(raw):
        count = int.from_bytes(raw[off : off + 8], "little", signed=True)
        ln = int.from_bytes(raw[off + 8 : off + 12], "little", signed=True)
        token = raw[off + 12 : off + 12 + ln].decode("utf-8")
        out[token] = count
        off += 12 + ln
    return out


def mask_count(
    rows: np.ndarray,  # (B, W) uint8, W % 8 == 0
    maskbits: np.ndarray,  # (B, L, W//8) uint8, little-endian bits
    span_row: np.ndarray,
    span_start: np.ndarray,
    span_body: np.ndarray,
    span_sid: np.ndarray,  # spans grouped by sid
    num_threads: Optional[int] = None,
):
    """Drain a device-computed candidate mask (ops/dfa_device.py) into
    per-sample-deduplicated document-frequency counts without
    materializing Python substring objects. Returns {str: count}."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    B, W = rows.shape
    assert W % 8 == 0 and maskbits.shape[0] == B \
        and maskbits.shape[2] == W // 8
    L = maskbits.shape[1]
    rows = np.ascontiguousarray(rows)
    maskbits = np.ascontiguousarray(maskbits)
    span_row = np.ascontiguousarray(span_row, dtype=np.int64)
    span_start = np.ascontiguousarray(span_start, dtype=np.int64)
    span_body = np.ascontiguousarray(span_body, dtype=np.int64)
    span_sid = np.ascontiguousarray(span_sid, dtype=np.int64)
    return _drain_counts(lambda buf, cap: lib.tg_mask_count(
        _u8p(rows), B, W, _u8p(maskbits), L,
        _i64p(span_row), _i64p(span_start), _i64p(span_body),
        _i64p(span_sid), len(span_row),
        _u8p(buf), cap, num_threads or default_threads(),
    ))


if __name__ == "__main__":
    import sys

    if "--build" in sys.argv:
        print(build(force=True))
