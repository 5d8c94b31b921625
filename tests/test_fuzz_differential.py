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
_N_SEEDS = int(os.environ.get("TGX_FUZZ_SEEDS", "2"))


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
