"""Byte-DFA compiler tests: agreement with Python `re` on the pattern
library (ported conformance table, reference: src/regex.rs:441-481) and
fuzzing over random strings."""

import random
import re

import numpy as np
import pytest

from tokengeex_tpu.core.redfa import compile_dfa
from tokengeex_tpu.train.patterns import (
    PATTERNS,
    build_allow_regex,
    build_mine_regex,
    load_patterns,
    rust_to_python,
)


def test_patterns_conformance_table():
    # Every named pattern must full-match its examples and reject its
    # counter-examples (reference: src/regex.rs:449-471).
    for name, pattern, examples, counter_examples in PATTERNS:
        r = re.compile(rust_to_python(f"^(?:{pattern})$"))
        for s in examples:
            assert r.match(s), (name, s)
        for s in counter_examples:
            assert not r.match(s), (name, s)


def test_pattern_names_unique():
    names = [name for name, _, _, _ in PATTERNS]
    assert len(names) == len(set(names))


def test_dfa_matches_re_on_conformance_table():
    for name, pattern, examples, counter_examples in PATTERNS:
        dfa = compile_dfa(pattern)
        for s in examples:
            assert dfa.fullmatch_bytes(s.encode("utf-8")), (name, s)
        for s in counter_examples:
            assert not dfa.fullmatch_bytes(s.encode("utf-8")), (name, s)


def test_dfa_fuzz_against_re():
    rng = random.Random(0)
    alphabet = "ab1 .#\t\n你好Éé"
    for name, pattern, _, _ in PATTERNS:
        dfa = compile_dfa(pattern)
        r = re.compile(rust_to_python(f"^(?:{pattern})\\Z"))
        for _ in range(200):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6)))
            want = r.match(s) is not None
            got = dfa.fullmatch_bytes(s.encode("utf-8"))
            assert got == want, (name, s)


def test_dfa_allow_regex_combined():
    # The "exact" recipe allow-regex shape (reference: data/exact.regex)
    patterns = load_patterns(
        ["any-char", "lowercase-word", "uppercase-word", "capitalized-word",
         "english-contraction", "chinese-word", "indent",
         "space-operator-space", "space-punct-space"]
    )
    combined = build_allow_regex(patterns)
    dfa = compile_dfa("|".join(f"(?:{p})" for p in patterns))
    r = re.compile(rust_to_python(combined))
    rng = random.Random(1)
    alphabet = "abA1 .#+=你 \t"
    for _ in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
        want = r.match(s) is not None
        assert dfa.fullmatch_bytes(s.encode()) == want, s


def test_match_lengths_vectorized():
    dfa = compile_dfa(r"[a-z]+")
    data = np.frombuffer(b"ab1cd", dtype=np.uint8)
    allowed = dfa.match_lengths(data, 4)
    # p=0: "a" ok, "ab" ok, "ab1" no, "ab1c" no
    assert allowed[0].tolist() == [True, True, False, False]
    # p=2: "1" no ...
    assert allowed[2].tolist() == [False, False, False, False]
    # p=3: "c" ok, "cd" ok, rest out of range
    assert allowed[3].tolist() == [True, True, False, False]


def test_chinese_word_dfa():
    dfa = compile_dfa("[㐀-䶿一-鿿]+")
    assert dfa.fullmatch_bytes("你好".encode())
    assert dfa.fullmatch_bytes("㐀䶿一鿿".encode())
    assert not dfa.fullmatch_bytes("hello".encode())
    assert not dfa.fullmatch_bytes("مرحبا".encode())
    assert not dfa.fullmatch_bytes(b"\xff\xff")


def test_unicode_digit_word_classes():
    # \d / \w are Unicode-aware like the Rust regex crate (\d = \p{Nd};
    # \w approximates Alphabetic+M+Nd+Pc+Join_Control — see PARITY.md).
    d = compile_dfa(r"\d+")
    assert d.fullmatch_bytes(b"123")
    assert d.fullmatch_bytes("٣٤".encode())      # Arabic-Indic digits (Nd)
    assert d.fullmatch_bytes("𝟘".encode())       # U+1D7D8 math digit (Nd)
    assert not d.fullmatch_bytes(b"a1")
    assert not d.fullmatch_bytes("Ⅻ".encode())   # Roman numeral: Nl, not Nd
    w = compile_dfa(r"\w+")
    for ok in ["hello_1", "héllo", "中文字", "café", "ＡＢ", "Ⅻ", "a‍b"]:
        assert w.fullmatch_bytes(ok.encode()), ok
    for bad in ["a b", "x-y", "!?", "a\n"]:
        assert not w.fullmatch_bytes(bad.encode()), bad
    nw = compile_dfa(r"\W+")
    assert nw.fullmatch_bytes(b" !?")
    assert not nw.fullmatch_bytes("中".encode())
    nd = compile_dfa(r"\D+")
    assert nd.fullmatch_bytes(b"abc!")
    assert not nd.fullmatch_bytes(b"a1")


def test_search_dfa_is_match_semantics():
    # compile_is_match_dfa reproduces Rust Regex::is_match.
    from tokengeex_tpu.core.redfa import (RegexSyntaxError,
                                          compile_is_match_dfa)

    # Unanchored: substring search anywhere, including across newlines.
    d = compile_is_match_dfa(r"[a-z]+")
    assert d.fullmatch_bytes(b"123 abc 456")
    assert d.fullmatch_bytes(b"\n\nx\n\n")
    assert not d.fullmatch_bytes(b"123 456")
    # Fully anchored alternation (what build_allow_regex emits).
    d2 = compile_is_match_dfa(r"^(?:[a-z]+)$|^(?: [0-9]+)$")
    assert d2.fullmatch_bytes(b"abc")
    assert d2.fullmatch_bytes(b" 42")
    assert not d2.fullmatch_bytes(b"x abc")  # anchored: no substring hit
    # Mixed anchoring is refused (host regex fallback handles it).
    with pytest.raises(RegexSyntaxError):
        compile_is_match_dfa(r"^[a-z]+|[0-9]$x")
    # [^...] class negation is not an anchor.
    d3 = compile_is_match_dfa(r"[^a-z]+")
    assert d3.fullmatch_bytes(b"abc123")
    assert not d3.fullmatch_bytes(b"abc")


def test_device_dfa_matches_host(monkeypatch):
    # The device DFA kernel (generate-stage allow checks) must agree
    # with the host table walk on every (pos, len) pair.
    import jax.numpy as jnp

    from tokengeex_tpu.ops import dfa_device as dd

    dfa = compile_dfa(r"^ ?[a-z]+$|^[0-9]{2,3}$")
    samples = [b"abc 12 foo9", b" x 123", b"", "héllo wörld".encode()]
    L = 5
    W = max(len(s) for s in samples)
    arr = np.zeros((len(samples), W), dtype=np.uint8)
    lens = np.zeros(len(samples), dtype=np.int32)
    for i, s in enumerate(samples):
        arr[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    ddfa = dd.DeviceDFA.from_byte_dfa(dfa)
    got = np.asarray(dd.match_lengths_device(ddfa, jnp.asarray(arr), L))
    for i, s in enumerate(samples):
        if len(s) == 0:
            continue
        want = dfa.match_lengths(np.frombuffer(s, dtype=np.uint8), L)
        # host layout (pos, len); device (len, pos) over padded width
        for l in range(1, L + 1):
            for p in range(len(s)):
                w = bool(want[p, l - 1]) if l - 1 < want.shape[1] and \
                    p + l <= len(s) else False
                assert bool(got[i, l - 1, p]) == w, (i, p, l)


def test_device_feed_candidates_match_python():
    # p=1.0 makes the device generate-feed candidate sets deterministic;
    # they must equal the pure-Python path's per-sample sets.
    from tokengeex_tpu.ops.dfa_device import feed_candidates_device
    from tokengeex_tpu.train.generate import VocabularyGenerator

    texts = ["abc de 12", " xyz", "héllo wörld", "mixed 中文 ascii"]
    for allow in (r"^ ?[a-z]+$", None):
        g = VocabularyGenerator(max_token_length=6, insert_probability=1.0,
                                allow=allow, seed=0)
        sets = feed_candidates_device(
            g._dfa, [t.encode() for t in texts], 6, 1.0, seed=0)
        for text, got in zip(texts, sets):
            want: set = set()
            g._feed_part(text, want)
            got_str = {c.decode("utf-8") for c in got}
            assert got_str == want, (allow, text)


def test_device_feed_native_mask_drain_matches_sets():
    # The native tg_mask_count drain must produce exactly the
    # per-sample-deduplicated document frequencies of the set drain
    # (p=1.0 -> deterministic mask). Repeated substrings inside one
    # sample ("ababab") count once per sample.
    from collections import Counter

    from tokengeex_tpu.ops.dfa_device import (feed_candidates_device,
                                              feed_counts_device)
    from tokengeex_tpu.utils import nativelib

    if nativelib.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")

    texts = ["ababab", "abc de 12", " xyz", "héllo wörld",
             "mixed 中文 ascii", "abc de 12"]
    samples = [t.encode() for t in texts]
    from tokengeex_tpu.core.redfa import compile_dfa

    for allow in (r"^ ?[a-z]+$", None):
        dfa = compile_dfa(allow) if allow else None
        counts = feed_counts_device(dfa, samples, 6, 1.0, seed=0)
        want: Counter = Counter()
        for cset in feed_candidates_device(dfa, samples, 6, 1.0, seed=0):
            want.update({c.decode("utf-8") for c in cset})
        assert counts == want, allow


def test_device_feed_kernel_cached_across_calls():
    # Round-3 perf fix: repeated feed calls (per-batch pod-shard feeds)
    # must reuse ONE compiled mask kernel instead of re-jitting per
    # call (~10 s remote compile each over the dev tunnel). Same-shape
    # calls hit _MASK_FNS; the DeviceDFA upload is cached on the
    # ByteDFA object.
    from tokengeex_tpu.core.redfa import compile_dfa
    from tokengeex_tpu.ops import dfa_device as dd

    dfa = compile_dfa(r"^ ?[a-z]+$")
    samples = [b"abc de", b" xyz", b"hello world"]
    dd._MASK_FNS.clear()
    c1 = dd.feed_counts_device(dfa, samples, 6, 1.0, seed=0)
    n_after_first = len(dd._MASK_FNS)
    c2 = dd.feed_counts_device(dfa, samples, 6, 1.0, seed=1)
    assert len(dd._MASK_FNS) == n_after_first == 1
    assert dd._device_dfa_for(dfa) is dd._device_dfa_for(dfa)
    # p=1.0: counts are coin-free, so different seeds agree.
    assert c1 == c2
    # Different max_len is a new kernel (static arg), same cache dict.
    dd.feed_counts_device(dfa, samples, 4, 1.0, seed=0)
    assert len(dd._MASK_FNS) == 2


def test_w_matches_other_alphabetic_symbols():
    """Rust-regex \\w includes \\p{Alphabetic} symbols like circled
    letters (Other_Alphabetic); closed in round 4 with a static table
    (reference: regex crate \\w = Alphabetic+M+Nd+Pc+Join_Control)."""
    dfa = compile_dfa(r"\w+")
    for ch in ("Ⓐ", "ⓐ", "\U0001F150"):  # Ⓐ ⓐ 🅐
        assert dfa.fullmatch_bytes(ch.encode("utf-8")), hex(ord(ch))
    # ⓪ CIRCLED DIGIT ZERO is not Alphabetic.
    assert not dfa.fullmatch_bytes("⓪".encode("utf-8"))
