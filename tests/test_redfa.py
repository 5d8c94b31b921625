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
