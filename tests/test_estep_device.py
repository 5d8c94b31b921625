"""Device-backed corpus passes vs the native/oracle reference."""

import random

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tokengeex_tpu import Model, ScoredToken
from tokengeex_tpu.train import estep_device as ed
from tokengeex_tpu.utils import nativelib


def _setup():
    rng = random.Random(21)
    alphabet = b"abcdef ()"
    vocab = [ScoredToken(bytes([b]), rng.uniform(-11.0, -9.0)) for b in alphabet]
    seen = {t.value for t in vocab}
    while len(vocab) < 80:
        n = rng.randint(2, 8)
        w = bytes(rng.choice(alphabet) for _ in range(n))
        if w not in seen:
            seen.add(w)
            vocab.append(ScoredToken(w, rng.uniform(-9.0, -1.0)))
    samples = [
        "".join(rng.choice("abcdef ()") for _ in range(rng.randint(1, 700))).encode()
        for _ in range(30)
    ]
    return Model(vocab), samples


@pytest.fixture(scope="module")
def setup():
    return _setup()


def test_device_estep_matches_native(setup, monkeypatch):
    model, samples = setup
    monkeypatch.setattr(ed, "CHUNK", 128)
    monkeypatch.setattr(ed, "GROUP_BYTES", 1 << 14)  # force multiple groups
    expected_dev = ed.run_e_step_device(
        model, samples, dropout=0.0, max_snippet=256, dtype=jnp.float64
    )
    native = model.native()
    expected_ref, z = native.estep(samples, max_snippet=256)
    np.testing.assert_allclose(expected_dev, expected_ref, rtol=1e-8, atol=1e-9)


def test_device_encode_corpus_matches_native(setup, monkeypatch):
    model, samples = setup
    monkeypatch.setattr(ed, "CHUNK", 128)
    monkeypatch.setattr(ed, "GROUP_BYTES", 1 << 14)
    got = ed.encode_corpus_device(model, samples, dtype=jnp.float64)
    want = model.native().encode_batch(samples)
    assert got == want


def test_device_count_frequencies(setup, monkeypatch):
    model, samples = setup
    monkeypatch.setattr(ed, "CHUNK", 128)
    freqs = ed.count_frequencies_device(model, samples)
    want = model.native().count_frequencies(samples)
    np.testing.assert_array_equal(freqs, want)


def test_device_count_pairs(setup, monkeypatch):
    model, samples = setup
    monkeypatch.setattr(ed, "CHUNK", 128)
    pairs = dict(ed.count_pairs_device(model, samples))
    want = {(a, b): n for a, b, n in model.native().count_pairs(samples)}
    assert pairs == want


def test_device_corpus_reuse_and_mismatch_fallback(setup):
    # A DeviceCorpus reused across models gives identical encodes to a
    # fresh pack; a corpus built for DIFFERENT samples must be ignored
    # (silent span misassignment otherwise), not trusted.
    model, samples = setup
    sub = samples[:10]
    corpus = ed.DeviceCorpus(sub)
    got = ed.encode_corpus_device(model, sub, corpus=corpus)
    want = ed.encode_corpus_device(model, sub)
    assert got == want
    # Second pass reuses the cached inputs.
    got2 = ed.encode_corpus_device(model, sub, corpus=corpus)
    assert got2 == want
    # Mismatched samples: falls back to a fresh pack, stays correct.
    other = samples[10:16]
    got3 = ed.encode_corpus_device(model, other, corpus=corpus)
    assert got3 == ed.encode_corpus_device(model, other)


def test_device_estep_with_dropout_is_sane(setup, monkeypatch):
    model, samples = setup
    monkeypatch.setattr(ed, "CHUNK", 128)
    e = ed.run_e_step_device(model, samples, dropout=0.3, max_snippet=256,
                             dtype=jnp.float64, seed=7)
    e0 = ed.run_e_step_device(model, samples, dropout=0.0, max_snippet=256,
                              dtype=jnp.float64)
    # Dropout perturbs but totals stay in the same ballpark (token count
    # per byte is bounded)
    assert e.sum() > 0
    assert abs(e.sum() - e0.sum()) / e0.sum() < 0.5
    # determinism under same seed
    e2 = ed.run_e_step_device(model, samples, dropout=0.3, max_snippet=256,
                              dtype=jnp.float64, seed=7)
    np.testing.assert_array_equal(e, e2)


def test_tokenizer_device_batch_encode():
    from tokengeex_tpu import Tokenizer

    vocab = [ScoredToken(bytes([b]), -10.0) for b in range(256)]
    vocab += [ScoredToken(w, -3.0) for w in (b"def ", b"return", b" x")]
    tok = Tokenizer(Model(vocab), [], ["<|eos|>"])
    texts = ["def f():<|eos|>return x", "return<|eos|>", "<|eos|>"]
    got = tok.encode_batch(texts, backend="device")
    want = [tok.encode(t) for t in texts]
    assert got == want
    got_ord = tok.encode_ordinary_batch(texts, backend="device")
    want_ord = [tok.encode_ordinary(t) for t in texts]
    assert got_ord == want_ord


def test_em_probe_close_to_exact(setup, monkeypatch):
    # The single-word EM probe quantizes scores to ~1e-3 logprob; counts
    # must match the exact path closely.
    model, samples = setup
    monkeypatch.setattr(ed, "CHUNK", 128)
    e_exact = ed.run_e_step_device(model, samples, dropout=0.0,
                                  max_snippet=256, dtype=jnp.float64)
    e_em = ed.run_e_step_device(model, samples, dropout=0.0,
                                max_snippet=256, dtype=jnp.float32,
                                probe="em")
    np.testing.assert_allclose(e_em, e_exact, rtol=0.02, atol=0.05)


def test_device_encode_empty_sample(setup):
    model, samples = setup
    got = ed.encode_corpus_device(model, [b"", samples[0], b""])
    want = model.native().encode_batch([b"", samples[0], b""])
    assert got == want
    assert got[0] == [] and got[2] == []


def test_device_encode_dropout_sampling(setup):
    model, samples = setup
    got = ed.encode_corpus_device(model, samples[:6], dropout=0.5, seed=3)
    for s, ids in zip(samples[:6], got):
        # Sampled segmentations still decode exactly.
        assert model.decode_bytes(ids) == s
    got0 = ed.encode_corpus_device(model, samples[:6])
    # dropout=1.0 forbids all multi-byte tokens (reference:
    # src/model.rs:218-236 semantics).
    got1 = ed.encode_corpus_device(model, samples[:6], dropout=1.0)
    for s, ids in zip(samples[:6], got1):
        assert len(ids) == len(s)


def test_device_encode_dropout_sharded_deterministic(setup):
    # With 8 virtual devices, dropout encode goes through the sharded
    # mesh path (no silent single-device fallback); same seed must give
    # the same sampled segmentations, and every output must decode back.
    model, samples = setup
    assert len(jax.devices()) > 1
    got = ed.encode_corpus_device(model, samples[:8], dropout=0.5, seed=11)
    got2 = ed.encode_corpus_device(model, samples[:8], dropout=0.5, seed=11)
    assert got == got2
    for s, ids in zip(samples[:8], got):
        assert model.decode_bytes(ids) == s


def test_device_encode_turbo_probe(setup):
    model, samples = setup
    got = ed.encode_corpus_device(model, samples[:8], probe="em")
    exact = ed.encode_corpus_device(model, samples[:8])
    diffs = 0
    for s, ids, ref in zip(samples[:8], got, exact):
        assert model.decode_bytes(ids) == s  # always a valid segmentation
        diffs += ids != ref
    # Quantized scores may flip near-ties but most outputs agree.
    assert diffs <= 2


def test_em_probe_sensitivity_large_vocab(monkeypatch):
    # The default f32 "em" probe quantizes scores to ~1e-3; at a
    # realistic vocabulary scale the expected counts must stay within a
    # small relative envelope of the exact f64 path (PARITY.md).
    rng = random.Random(5)
    alphabet = b"abcdefgh ():=."
    vocab = [ScoredToken(bytes([b]), rng.uniform(-12.0, -10.0))
             for b in alphabet]
    seen = {t.value for t in vocab}
    while len(vocab) < 4096:
        n = rng.randint(2, 8)
        w = bytes(rng.choice(alphabet) for _ in range(n))
        if w not in seen:
            seen.add(w)
            vocab.append(ScoredToken(w, rng.uniform(-10.0, -2.0)))
    model = Model(vocab)
    samples = [
        "".join(rng.choice("abcdefgh ():=.") for _ in range(400)).encode()
        for _ in range(40)
    ]
    monkeypatch.setattr(ed, "GROUP_BYTES", 1 << 16)
    e_exact = ed.run_e_step_device(model, samples, dropout=0.0,
                                   max_snippet=512, dtype=jnp.float64)
    e_em = ed.run_e_step_device(model, samples, dropout=0.0,
                                max_snippet=512, probe="em")
    hot = e_exact >= 1.0
    assert hot.sum() > 100  # the comparison is meaningful
    rel = np.abs(e_em[hot] - e_exact[hot]) / e_exact[hot]
    assert float(np.median(rel)) < 0.02, float(np.median(rel))
    assert float(np.quantile(rel, 0.95)) < 0.15, float(np.quantile(rel, 0.95))
    # Total mass is preserved closely.
    assert abs(e_em.sum() - e_exact.sum()) / e_exact.sum() < 0.01


def test_device_encode_long_sample_chained(setup):
    # Samples wider than the pack width chain fixed-width windows with a
    # carried dp tail; ids must be byte-exact vs the unchunked native
    # encode (reference: src/model.rs:59-129), including tokens that
    # cross window boundaries.
    model, samples = setup
    rng = random.Random(31)
    long1 = "".join(rng.choice("abcdef ()") for _ in range(3000)).encode()
    long2 = "".join(rng.choice("abcdef ()") for _ in range(5131)).encode()
    mixed = [samples[0], long1, b"", long2, samples[1]]
    got = ed.encode_corpus_device(model, mixed, dtype=jnp.float64,
                                  max_width=512)
    want = model.native().encode_batch(mixed)
    assert got == want
    # f32 fast path still yields valid segmentations.
    got32 = ed.encode_corpus_device(model, mixed, max_width=512)
    for s, ids in zip(mixed, got32):
        assert model.decode_bytes(ids) == s


def test_device_encode_long_sample_no_path(setup):
    model, samples = setup
    bad = samples[0][:100] + b"zzz" + b"abcdef" * 300  # 'z' not in vocab
    from tokengeex_tpu import NoPathError

    with pytest.raises(NoPathError):
        ed.encode_corpus_device(model, [bad], max_width=512)


def test_device_encode_long_sample_dropout(setup):
    model, samples = setup
    rng = random.Random(32)
    long1 = "".join(rng.choice("abcdef ()") for _ in range(4000)).encode()
    got = ed.encode_corpus_device(model, [long1], dropout=0.5, seed=13,
                                  max_width=512)
    assert model.decode_bytes(got[0]) == long1
    got2 = ed.encode_corpus_device(model, [long1], dropout=0.5, seed=13,
                                   max_width=512)
    assert got == got2


def test_interval_sums_compensated_difference():
    """A tiny segment deep inside a large-prefix array must not lose
    its sum to f32 rounding of the block-prefix difference (round-4
    regression: +-5 count noise aborted the 1.1 GB M-step)."""
    import jax.numpy as jnp

    from tokengeex_tpu.ops import lattice_jax as lj

    N = 1 << 20
    w = np.ones(N, np.float32)
    # Three 1e-3 weights at a block-aligned segment ~3/4 in.
    s0 = (3 * N // 4) + 256
    w[s0 : s0 + 3] = 1e-3
    pre = np.array([s0 - 1, N], np.int32)  # second slot absent (pad)
    end = np.array([s0 + 2, N], np.int32)
    out = np.asarray(lj._interval_sums(
        jnp.asarray(w), jnp.asarray(pre), jnp.asarray(end), jnp.float32))
    np.testing.assert_allclose(out[0], 3e-3, rtol=1e-3)
    assert out[1] == 0.0
