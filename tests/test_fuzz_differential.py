"""Seeded fuzz: 3-way differential over the FULL byte alphabet.

oracle (pure-Python f64 spec) == native (C++ runtime) bit-exact, and
== device f64 Viterbi token-exact — on random binary vocabularies with
deliberate exact score ties (exercising the strictly-greater /
longest-token tie-breaks, reference: src/model.rs:59-129) and random
non-UTF-8 samples.
"""

import math
import os
import random

import jax
import jax.numpy as jnp
import pytest

jax.config.update("jax_enable_x64", True)

from tokengeex_tpu import OracleModel, ScoredToken
from tokengeex_tpu.core.types import NoPathError
from tokengeex_tpu.models.unigram import Model
from tokengeex_tpu.train.estep_device import encode_corpus_device
from tokengeex_tpu.utils import nativelib


def _fuzz_case(seed):
    rng = random.Random(seed)
    # All 256 bytes so every sample is segmentable, plus multi-byte
    # tokens over a binary-heavy alphabet with many duplicate scores.
    vocab = [ScoredToken(bytes([b]), math.log(1 / 256)) for b in range(256)]
    seen = {t.value for t in vocab}
    tie_scores = [rng.uniform(-6.0, -1.0) for _ in range(6)]
    while len(vocab) < 256 + 120:
        n = rng.randint(2, 10)
        w = bytes(rng.randrange(256) for _ in range(n)) if rng.random() < 0.5 \
            else bytes(rng.choice(b"\x00\xff\xc3\xa9ab ") for _ in range(n))
        if w in seen:
            continue
        seen.add(w)
        vocab.append(ScoredToken(w, rng.choice(tie_scores)))
    samples = []
    for _ in range(30):
        n = rng.randint(1, 160)
        if rng.random() < 0.5:
            base = rng.choice([t.value for t in vocab[256:]])
            s = (base * (n // max(1, len(base)) + 1))[:n]
        else:
            s = bytes(rng.randrange(256) for _ in range(n))
        samples.append(s)
    return vocab, samples


# TGX_FUZZ_SEEDS widens the sweep (e.g. nightly CI: TGX_FUZZ_SEEDS=32).
_N_SEEDS = int(os.environ.get("TGX_FUZZ_SEEDS", "8"))


@pytest.mark.parametrize(
    "seed", [7, 1234] + [s for s in range(2, _N_SEEDS)
                         if s not in (7, 1234)])
def test_fuzz_oracle_native_device(seed):
    vocab, samples = _fuzz_case(seed)
    oracle = OracleModel(vocab)
    want = [oracle.encode(s) for s in samples]

    if nativelib.get_lib() is not None:
        native = nativelib.NativeModel(vocab)
        got_native = native.encode_batch(samples)
        assert got_native == want, "native diverged from oracle"

    model = Model(vocab)
    got_device = encode_corpus_device(model, samples, dtype=jnp.float64)
    assert got_device == want, "device f64 diverged from oracle"


def test_fuzz_no_path_detection():
    """Drop byte 0x00 from the vocab: samples containing it must raise
    NoPath identically in oracle and device paths."""
    rng = random.Random(99)
    vocab = [ScoredToken(bytes([b]), math.log(1 / 256)) for b in range(1, 256)]
    oracle = OracleModel(vocab)
    ok = bytes(rng.randrange(1, 256) for _ in range(40))
    bad = ok[:20] + b"\x00" + ok[20:]
    want_ok = oracle.encode(ok)
    with pytest.raises(NoPathError):
        oracle.encode(bad)
    model = Model(vocab)
    got = encode_corpus_device(model, [ok], dtype=jnp.float64)
    assert got == [want_ok]
    with pytest.raises(NoPathError):
        encode_corpus_device(model, [bad], dtype=jnp.float64)


def test_fuzz_long_sample_chained_encode():
    """Samples past MAX_ENCODE_WIDTH (32 KiB) run the chained-window
    Viterbi with the bit-exact dp carry; token-exact vs the native
    UNCHUNKED lattice encode (itself oracle-bit-exact, test_native.py),
    with multi-byte tokens deliberately straddling window boundaries."""
    if nativelib.get_lib() is None:
        pytest.skip("native runtime unavailable")
    rng = random.Random(17)
    vocab = [ScoredToken(bytes([b]), math.log(1 / 256)) for b in range(256)]
    seen = {t.value for t in vocab}
    tie_scores = [rng.uniform(-6.0, -1.0) for _ in range(4)]
    while len(vocab) < 256 + 80:
        n = rng.randint(2, 12)
        w = bytes(rng.choice(b"abcdef \n\x00\xff") for _ in range(n))
        if w not in seen:
            seen.add(w)
            vocab.append(ScoredToken(w, rng.choice(tie_scores)))
    pool = [t.value for t in vocab[256:]]
    samples = []
    for k in range(3):
        n = rng.randint(40_000, 90_000)
        parts = []
        size = 0
        while size < n:
            p = rng.choice(pool) if rng.random() < 0.7 else \
                bytes(rng.choice(b"abcdef \n") for _ in range(rng.randint(1, 9)))
            parts.append(p)
            size += len(p)
        samples.append(b"".join(parts)[:n])
    # Plus one short sample so mixed batches exercise both paths.
    samples.append(b"abcabc")

    native = nativelib.NativeModel(vocab)
    want = native.encode_batch(samples)
    model = Model(vocab)
    got = encode_corpus_device(model, samples, dtype=jnp.float64)
    assert got == want, "chained-window encode diverged from native"


def test_fuzz_dropout_distribution_device_vs_oracle():
    """dropout > 0 skips multi-byte candidates with probability p
    (reference: src/model.rs:48-51). The device path draws its coins
    from a hash-mixed stream, the oracle from python random — the
    SEGMENTATION DISTRIBUTIONS must match: total-variation distance
    over N independent draws within sampling noise."""
    vocab = [ScoredToken(bytes([b]), math.log(1 / 256)) for b in range(256)]
    vocab += [ScoredToken(b"ab", -1.0), ScoredToken(b"ba", -1.2),
              ScoredToken(b"abab", -1.8), ScoredToken(b"bab", -2.0)]
    sample = b"ababab"
    dropout = 0.4
    N = 512

    oracle = OracleModel(vocab)
    counts_o = {}
    for k in range(N):
        ids = tuple(oracle.encode(sample, dropout, random.Random(k)))
        counts_o[ids] = counts_o.get(ids, 0) + 1

    model = Model(vocab)
    got = encode_corpus_device(model, [sample] * N, dropout=dropout,
                               seed=123, dtype=jnp.float64)
    counts_d = {}
    for ids in got:
        ids = tuple(ids)
        counts_d[ids] = counts_d.get(ids, 0) + 1

    keys = set(counts_o) | set(counts_d)
    tv = 0.5 * sum(abs(counts_o.get(k, 0) - counts_d.get(k, 0)) / N
                   for k in keys)
    assert tv < 0.12, (tv, counts_o, counts_d)
    # Both must actually sample more than one segmentation at p=0.4.
    assert len(counts_o) > 1 and len(counts_d) > 1


@pytest.mark.parametrize("seed,dropout", [(3, 0.0), (11, 0.3), (21, 0.0),
                                          (31, 0.3)])
def test_fuzz_fused_vs_xla_f32(seed, dropout):
    """Round-4 fused-probe kernels vs the XLA gather path on random
    binary vocabularies with exact ties and non-UTF-8 samples: the two
    f32 paths share hash family, probe semantics and dropout coins, so
    dp values (1e-6) and backpointers (exact) must agree — including
    under dropout."""
    from tokengeex_tpu.ops import lattice_jax as lj
    from tokengeex_tpu.ops.match_table import TokenTable
    from tokengeex_tpu.utils.packing import pack_samples
    import numpy as np

    vocab, samples = _fuzz_case(seed)
    samples = [s[:200] for s in samples]
    model = Model(vocab)
    dt = lj.DeviceTables.from_table(TokenTable.build(model.vocab),
                                    dtype=jnp.float32)
    assert lj.has_vscan(dt)
    packed = pack_samples(samples, width=256, max_snippet=256,
                          row_multiple=128)
    batch = lj.prepare_batch(packed, dt.max_len)
    drop_u = None
    if dropout > 0.0:
        drop_u = jax.random.randint(
            jax.random.PRNGKey(seed), (batch.p1.shape[0],
                                       batch.sid.shape[1]),
            minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32)
    dp_x, bl_x = lj.viterbi(dt, batch, C=128, drop_u=drop_u,
                            dropout=dropout, backend="xla",
                            dtype=jnp.float32)
    dp_f, bl_f = lj.viterbi(dt, batch, C=128, drop_u=drop_u,
                            dropout=dropout, backend="fused",
                            dtype=jnp.float32)
    dp_x, dp_f = np.asarray(dp_x), np.asarray(dp_f)
    fin = np.isfinite(dp_x)
    assert (fin == np.isfinite(dp_f)).all()
    np.testing.assert_allclose(dp_x[fin], dp_f[fin], rtol=1e-6, atol=1e-6)
    assert (np.asarray(bl_x)[fin] == np.asarray(bl_f)[fin]).all()


@pytest.mark.parametrize("seed", range(40, 46))
def test_fuzz_special_token_splitter(seed):
    """Random special tokens (including overlapping/nested substrings)
    against a naive reference scan of the first-special-wins semantics
    (reference: src/tokenizer.rs:299-347), plus an encode/decode
    roundtrip through the full Tokenizer pipeline."""
    from tokengeex_tpu import Tokenizer, make_vocab
    from tokengeex_tpu.core.splitter import split_special_tokens

    rng = random.Random(seed)
    alphabet = "abcx<|>#"
    specials = []
    while len(specials) < rng.randint(1, 5):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        if s and s not in specials:
            specials.append(s)
    text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))

    def naive(text, specials):
        out = []
        buf = ""
        i = 0
        while i < len(text):
            best = None  # first special (by list order) matching at i
            for sp in specials:
                if text.startswith(sp, i):
                    best = sp
                    break
            if best is None:
                buf += text[i]
                i += 1
            else:
                if buf:
                    out.append((buf, False))
                    buf = ""
                out.append((best, True))
                i += len(best)
        if buf:
            out.append((buf, False))
        return out

    got = [x for x in split_special_tokens(text, specials) if x[0] != ""]
    want = naive(text, specials)
    assert got == want, (text, specials)

    vocab = [ScoredToken(bytes([b]), math.log(1 / 256)) for b in range(256)]
    tok = Tokenizer(Model(vocab), [], specials)
    ids = tok.encode(text)
    assert tok.decode(ids, include_special_tokens=True) == text
    assert tok.decode_batch([ids], include_special_tokens=True)[0] == text
