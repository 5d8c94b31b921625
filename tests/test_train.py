"""Training layer tests: generate / prune / filter / merge / mine."""

import math
import random

import numpy as np
import pytest

from tokengeex_tpu import Model, ScoredToken, make_vocab, new_default_vocab
from tokengeex_tpu.train.filter import VocabularyFilter
from tokengeex_tpu.train.generate import VocabularyGenerator
from tokengeex_tpu.train.merge import VocabularyMerger
from tokengeex_tpu.train.mine import IdiomMiner
from tokengeex_tpu.train.prune import VocabularyPruner, digamma


def test_generate():
    # reference: src/generate.rs:245-285
    generator = VocabularyGenerator(
        max_token_length=6,
        insert_probability=1.0,
        split=None,
        allow=r"^ ?[a-z]+$",
        added_tokens=["goodbye", "vec"],
        suggested_tokens=["string", "map"],
        seed=0,
    )
    # Reference fixture verbatim (src/generate.rs:261-266): "goodbye"
    # never occurs in the samples but the constructor seeds +1 per
    # added/suggested token (src/generate.rs:31-39), so it still gets a
    # score of 1 * len("goodbye").
    samples = [
        "hello my name is diego and i like std::string",
        "i also like std::vector",
        "and std::vector<std::string>",
        "and std::map<int, std::string>",
    ]
    generator.feed(samples)
    vocab = generator.generate(256 + 10)
    multi = [t for t in vocab if len(t.value) > 1]
    assert any(t.value == b"string" for t in multi), multi
    # added tokens keep=True
    byval = {t.value: t for t in vocab}
    assert byval[b"vec"].keep is True
    assert byval[b"string"].keep is False
    # absent added token survives via the constructor seed
    assert byval[b"goodbye"].keep is True
    # log-probs sum to ~1 in prob space
    total = sum(math.exp(t.score) for t in vocab)
    assert total == pytest.approx(1.0, abs=1e-9)
    # byte seed excludes 0xFF (reference quirk, src/generate.rs:164)
    assert b"\xff" not in byval
    assert b"\x00" in byval


def test_generate_special_token_counting_per_sample():
    # Added/suggested tokens join the SAME per-sample set as substring
    # candidates with one coin per occurrence and break-on-success
    # (reference: src/generate.rs:117-126): with p=1.0 a token occurring
    # k times in a sample counts exactly once per sample, even when it
    # also qualifies as a substring candidate.
    # 1 constructor seed + 1 per matching sample.
    g = VocabularyGenerator(max_token_length=3, insert_probability=1.0,
                            added_tokens=["zq"], seed=0)
    g.feed(["zq zq zq zq", "zq", "no match here"])
    assert g.frequencies["zq"] == 3
    # Same semantics on the pure-Python path (split forces it).
    g2 = VocabularyGenerator(max_token_length=3, insert_probability=1.0,
                             added_tokens=["zq"], split=r"\S+", seed=0)
    g2.feed(["zq zq zq zq", "zq", "no match here"])
    assert g2.frequencies["zq"] == 3


def test_feed_special_native_overlapping_coin_count():
    # The native-path emulation must flip one coin per NON-OVERLAPPING
    # special-path occurrence plus one per OVERLAPPING substring-path
    # occurrence (the candidate scan visits every start position), with
    # break-on-success. "aa" in "aaaa": 2 + 3 = 5 coins.
    class FailCoin:
        def __init__(self):
            self.calls = 0

        def random(self):
            self.calls += 1
            return 0.99  # > p: never insert

    g = VocabularyGenerator(max_token_length=3, insert_probability=0.5,
                            added_tokens=["aa"], seed=0)
    g._rng = coin = FailCoin()
    g._feed_special_native(["aaaa"])
    assert coin.calls == 5
    assert g.frequencies["aa"] == 1  # constructor seed only

    # Ineligible for the substring path (too long): special-path coins
    # only, non-overlapping.
    g2 = VocabularyGenerator(max_token_length=1, insert_probability=0.5,
                             added_tokens=["aa"], seed=0)
    g2._rng = coin2 = FailCoin()
    g2._feed_special_native(["aaaa"])
    assert coin2.calls == 2

    # Success breaks out: at most +1 per sample.
    class WinCoin:
        def random(self):
            return 0.0

    g3 = VocabularyGenerator(max_token_length=3, insert_probability=0.5,
                             added_tokens=["aa"], seed=0)
    g3._rng = WinCoin()
    g3._feed_special_native(["aaaa", "aa", "bb"])
    assert g3.frequencies["aa"] == 3  # seed + 2 samples


def test_generate_absent_added_token_seeded():
    # reference: src/generate.rs:31-39 seeds +1 per added/suggested list
    # entry, so the .expect at generate.rs:186 is unreachable — a special
    # token never seen during feed still generates with score
    # n_entries * len(token).
    g = VocabularyGenerator(max_token_length=6, insert_probability=1.0,
                            added_tokens=["goodbye"], seed=0)
    g.feed(["hello world"])
    assert g.frequencies["goodbye"] == 1
    vocab = g.generate(300)
    byval = {t.value: t for t in vocab}
    assert b"goodbye" in byval and byval[b"goodbye"].keep is True
    # Duplicate entries accumulate (the reference loops over both lists).
    g2 = VocabularyGenerator(max_token_length=6, insert_probability=1.0,
                             added_tokens=["dup"], suggested_tokens=["dup"],
                             seed=0)
    assert g2.frequencies["dup"] == 2


def test_generate_full_byte_seed_flag():
    g = VocabularyGenerator(max_token_length=4, insert_probability=1.0,
                            full_byte_seed=True, seed=0)
    g.feed(["ab"])
    vocab = g.generate(300)
    assert any(t.value == b"\xff" for t in vocab)


def test_mine():
    # reference: src/mine.rs:51-77
    samples = [
        "std::string",
        "std::vector",
        "std::vector<std::string>",
        "std::map<int, std::string>",
    ]
    miner = IdiomMiner(2, r"std::\w+")
    idioms = miner.mine(samples)
    assert idioms == [("std::string", 3), ("std::vector", 2)]


def test_mine_leftmost_semantics_deviation():
    """Counter-example pinning the documented native-path deviation
    (PARITY.md "known deviations"): the reference's find_iter is
    leftmost-FIRST over alternations (src/mine.rs:33, Rust regex crate
    semantics: earlier alternative wins at the same start), while the
    native DFA scanner is leftmost-LONGEST. On `a|ab` over "ab xx ab"
    the two disagree; on every committed PATTERNS alternation they
    agree (tests/test_redfa.py conformance table)."""
    from tokengeex_tpu.utils import nativelib

    samples = ["ab xx ab"]
    miner = IdiomMiner(4, r"a|ab")
    got = dict(miner.mine(samples))
    if nativelib.get_lib() is not None:
        native = miner._mine_native(samples)
        assert native is not None, "native miner unexpectedly skipped"
        # leftmost-longest: the whole alternation's longest match wins.
        assert dict(native) == {"ab": 2}
        assert got == {"ab": 2}
    # Reference (leftmost-first) behavior, from the serial re path the
    # miner falls back to for non-DFA-able patterns:
    import re

    from tokengeex_tpu.train.patterns import rust_to_python

    ref = {}
    for m in re.compile(rust_to_python(r"a|ab")).finditer(samples[0]):
        ref[m.group(0)] = ref.get(m.group(0), 0) + 1
    assert ref == {"a": 2}


def test_filter():
    vocab = make_vocab(
        [(b"a", -1.0), (b"b", -5.0), (b"c", -9.0), (b"d", -13.0), (b"e", -20.0)]
    )
    vocab[3] = vocab[3].clone_with_keep(True)  # d: keep
    model = Model(vocab)
    out = VocabularyFilter(vocab_size=2, min_score=-8.0).filter(model)
    values = [t.value for t in out.vocab]
    # c (-9) and e (-20) are <= -8 and removable; d kept despite score.
    # num_to_remove = 3, but only c, e qualify -> 3 tokens remain.
    assert b"d" in values and b"a" in values and b"b" in values
    assert b"c" not in values and b"e" not in values
    # force removes keep tokens too
    out2 = VocabularyFilter(vocab_size=2, min_score=-8.0, force=True).filter(model)
    values2 = [t.value for t in out2.vocab]
    assert b"d" not in values2 and len(values2) == 2


def test_filter_min_score_none_keeps_all():
    model = Model(make_vocab([(b"a", -1.0), (b"b", -2.0)]))
    out = VocabularyFilter(vocab_size=0).filter(model)
    assert out.vocab_size() == 2


def test_digamma():
    # asymptotic: digamma(x) ~ ln(x) for large x
    assert digamma(100000.0) == pytest.approx(math.log(100000.0), abs=1e-4)
    # recurrence: digamma(x+1) = digamma(x) + 1/x
    for x in (0.7, 1.5, 3.2):
        assert digamma(x + 1) == pytest.approx(digamma(x) + 1.0 / x, rel=1e-12)


def _code_corpus():
    rng = random.Random(3)
    words = ["def", "return", "value", "data", "self", "import", "print"]
    samples = []
    for _ in range(60):
        n = rng.randint(3, 10)
        samples.append(
            " ".join(rng.choice(words) for _ in range(n)).encode()
        )
    return samples


def test_prune_end_to_end():
    samples = _code_corpus()
    gen = VocabularyGenerator(max_token_length=8, insert_probability=1.0,
                              allow=r"^ ?[a-z]+$", seed=1)
    gen.feed([s.decode() for s in samples])
    vocab = gen.generate(400)
    model = Model(vocab)
    v0 = model.vocab_size()

    pruner = VocabularyPruner(vocab_size=280, shrink_factor=0.8,
                              em_subiters=1, dropout=0.0, backend="native")
    model = pruner.prune(model, samples)
    assert model.vocab_size() <= 280 or model.vocab_size() < v0
    # Model still segments the corpus and roundtrips
    for s in samples[:5]:
        ids = model.encode(s.decode())
        assert model.decode(ids) == s.decode()
    # keep tokens (byte seed) survived
    count_bytes = sum(1 for t in model.vocab if len(t.value) == 1)
    assert count_bytes == 255


def test_prune_stall_terminates():
    # When every surviving token is always-keep (sole cover for some
    # position), prune_vocab is the identity and the reference's outer
    # loop (src/prune.rs:24) would spin forever; ours must stop and
    # return the best achievable vocabulary.
    samples = _code_corpus()
    gen = VocabularyGenerator(max_token_length=8, insert_probability=1.0,
                              allow=r"^ ?[a-z]+$", seed=3)
    gen.feed([s.decode() for s in samples])
    model = Model(gen.generate(400))
    pruner = VocabularyPruner(vocab_size=4, shrink_factor=0.8,
                              em_subiters=1, dropout=0.0, backend="native")
    model = pruner.prune(model, samples)  # must terminate
    assert model.vocab_size() > 4  # stalled at the always-keep floor
    for s in samples[:3]:
        ids = model.encode(s.decode())
        assert model.decode(ids) == s.decode()


def test_prune_em_improves_likelihood():
    samples = _code_corpus()
    gen = VocabularyGenerator(max_token_length=8, insert_probability=1.0,
                              allow=r"^ ?[a-z]+$", seed=2)
    gen.feed([s.decode() for s in samples])
    model = Model(gen.generate(400))
    pruner = VocabularyPruner(vocab_size=300, dropout=0.0, backend="native")

    def loglik(m):
        native = m.native()
        _, z = native.estep(samples)
        return float(z.sum())

    ll0 = loglik(model)
    expected = pruner.run_e_step(model, samples)
    model2 = Model(pruner.run_m_step(model, expected))
    ll1 = loglik(model2)
    assert ll1 > ll0 - 1e-6, (ll0, ll1)


def test_merge():
    vocab = [ScoredToken(bytes([b]), -10.0) for b in range(256)] + make_vocab(
        [(b"ab", -2.0), (b"cd", -2.0)]
    )
    model = Model(vocab)
    samples = [b"abcd" * 10] * 5
    merger = VocabularyMerger(allow=r"^[a-z]+$", num_merges=1,
                              step=1, scale_factor=0.9, max_token_length=8,
                              backend="native")
    model = merger.merge(model, samples)
    newest = model.vocab[-1]
    assert newest.value == b"abcd"
    assert newest.score == pytest.approx((-2.0 + -2.0) * 0.9)
    assert newest.keep is False
    # re-encode now uses the merged token
    assert model.encode("abcd") == [model.vocab_size() - 1]


def test_merge_respects_allow_and_length():
    vocab = [ScoredToken(bytes([b]), -10.0) for b in range(256)] + make_vocab(
        [(b"ab", -2.0), (b"1d", -2.0)]
    )
    model = Model(vocab)
    samples = [b"ab1d" * 10] * 5
    merger = VocabularyMerger(allow=r"^[a-z]+$", num_merges=2, step=2,
                              backend="native")
    v0 = model.vocab_size()
    model = merger.merge(model, samples)
    # "ab1d" contains digits: disallowed; singles pairs disallowed too;
    # no merges possible -> early stop
    for t in model.vocab[v0:]:
        assert False, f"unexpected merge {t}"


def test_freq_pass_prefers_native_under_device_backend(monkeypatch):
    # Round 5: measured crossover — the device freq pass at recipe
    # shapes runs 0.9 MB/s vs ~30 MB/s for the threaded C++ counter
    # (experiments/recipe_probe_r5.py), so under backend="device" the
    # frequency pass routes to native when the library loads, and
    # TGX_FREQ_BACKEND=device forces the chip path.
    from tokengeex_tpu.train import prune as prune_mod

    vocab = [ScoredToken(bytes([b]), -8.0) for b in b"ab"] + \
        [ScoredToken(b"ab", -2.0)]
    model = Model(vocab)
    if model.native() is None:
        import pytest

        pytest.skip("native library unavailable")
    pruner = prune_mod.VocabularyPruner(
        vocab_size=2, shrink_factor=0.8, em_subiters=1, dropout=0.0,
        backend="device")

    class _Task:
        def record(self, *a):
            pass

    samples = [b"abab", b"ab"]
    monkeypatch.delenv("TGX_FREQ_BACKEND", raising=False)
    # No session and no real device: the native gate must fire before
    # any device dispatch is attempted.
    freqs = pruner._count_frequencies(model, samples, _Task())
    assert freqs[model.token_to_id(b"ab")] == 3
    # Forced device routing falls through the gate (and then to the
    # device helpers, which on the CPU test backend still compute).
    monkeypatch.setenv("TGX_FREQ_BACKEND", "device")
    freqs2 = pruner._count_frequencies(model, samples, _Task())
    assert np.array_equal(freqs, freqs2)


def test_merge_auto_prefers_native():
    from tokengeex_tpu.train.merge import VocabularyMerger as ModelVocabularyMerger

    vocab = [ScoredToken(bytes([b]), -8.0) for b in b"ab"] + \
        [ScoredToken(b"ab", -2.0)]
    model = Model(vocab)
    if model.native() is None:
        import pytest

        pytest.skip("native library unavailable")
    merger = ModelVocabularyMerger.__new__(ModelVocabularyMerger)
    merger.backend = "auto"
    merger._corpus = None

    class _Task:
        def record(self, *a):
            pass

    pairs = merger._count_pairs(model, [b"abab", b"abab"], _Task())
    # (ab, ab) is the dominant adjacent pair under Viterbi encoding.
    top_pair, top_freq = pairs[0]
    tid = model.token_to_id(b"ab")
    assert top_pair == (tid, tid) and top_freq == 2
