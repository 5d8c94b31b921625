"""Differential tests: native C++ runtime vs the Python oracle."""

import math
import random

import numpy as np
import pytest

from tokengeex_tpu import Lattice, OracleModel, NoPathError, ScoredToken
from tokengeex_tpu.utils import nativelib

pytestmark = pytest.mark.skipif(
    nativelib.get_lib() is None, reason="native library unavailable"
)


def _random_vocab(rng, nbig=80):
    alphabet = b"abcdef ()"
    vocab = [ScoredToken(bytes([b]), rng.uniform(-11.0, -9.0)) for b in alphabet]
    seen = {t.value for t in vocab}
    while len(vocab) < len(alphabet) + nbig:
        n = rng.randint(2, 8)
        w = bytes(rng.choice(alphabet) for _ in range(n))
        if w not in seen:
            seen.add(w)
            vocab.append(ScoredToken(w, rng.uniform(-9.0, -1.0)))
    return vocab


def _random_samples(rng, n, maxlen=200):
    alphabet = "abcdef ()"
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, maxlen))).encode()
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def setup():
    rng = random.Random(11)
    vocab = _random_vocab(rng)
    samples = _random_samples(rng, 40)
    return vocab, samples, OracleModel(vocab), nativelib.NativeModel(vocab)


def test_encode_exact_match(setup):
    vocab, samples, oracle, native = setup
    got = native.encode_batch(samples)
    for s, ids in zip(samples, got):
        assert ids == oracle.encode(s.decode()), s


def test_encode_no_path(setup):
    vocab, samples, oracle, native = setup
    with pytest.raises(NoPathError):
        native.encode(b"zzz")


def test_estep_exact_match(setup):
    vocab, samples, oracle, native = setup
    # Single thread: summation order matches the sequential oracle, so
    # the comparison is bit-for-bit (the native lattice replicates node
    # order and pairwise log_sum_exp accumulation exactly).
    expected_n, z_n = native.estep(samples, max_snippet=64, num_threads=1)
    expected_o = [0.0] * len(vocab)
    z_o = []
    for s in samples:
        zs = 0.0
        for off in range(0, len(s), 64):
            lat = Lattice(s[off : off + 64])
            oracle.populate_nodes(lat, 0.0)
            zs += lat.populate_marginal(expected_o)
        z_o.append(zs)
    np.testing.assert_array_equal(expected_n, np.asarray(expected_o))
    np.testing.assert_array_equal(z_n, np.asarray(z_o))
    # Threaded path: same up to floating-point summation order.
    expected_t, z_t = native.estep(samples, max_snippet=64)
    np.testing.assert_allclose(expected_t, expected_n, rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(z_t, z_n)


def test_estep_dropout(setup):
    vocab, samples, oracle, native = setup
    # dropout=1.0 removes every multi-byte candidate: the lattice is the
    # byte path only, deterministic, identical to the oracle with
    # dropout=1.0 (reference: src/model.rs:48-51).
    expected_n, z_n = native.estep(samples, max_snippet=64, dropout=1.0,
                                   seed=5, num_threads=1)
    expected_o = [0.0] * len(vocab)
    rng = random.Random(0)
    for s in samples:
        for off in range(0, len(s), 64):
            lat = Lattice(s[off : off + 64])
            oracle.populate_nodes(lat, 1.0, rng)
            lat.populate_marginal(expected_o)
    np.testing.assert_allclose(expected_n, np.asarray(expected_o),
                               rtol=1e-12, atol=0)
    # Intermediate dropout: deterministic per (seed, sample) and
    # independent of thread partitioning; differs from dropout=0.
    e1, z1 = native.estep(samples, max_snippet=64, dropout=0.3, seed=7,
                          num_threads=1)
    e2, z2 = native.estep(samples, max_snippet=64, dropout=0.3, seed=7,
                          num_threads=4)
    # Same masks; counts equal up to partial-merge summation order,
    # per-sample z bit-for-bit.
    np.testing.assert_allclose(e1, e2, rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(z1, z2)
    e0, _ = native.estep(samples, max_snippet=64, dropout=0.0)
    assert not np.allclose(e1, e0)
    assert np.isfinite(z1).all()
    e3, _ = native.estep(samples, max_snippet=64, dropout=0.3, seed=8)
    assert not np.array_equal(e1, e3)  # different seed, different masks


def test_count_frequencies(setup):
    vocab, samples, oracle, native = setup
    freqs = native.count_frequencies(samples)
    want = np.zeros(len(vocab), dtype=np.int64)
    for s in samples:
        for tid in oracle.encode(s.decode()):
            want[tid] += 1
    np.testing.assert_array_equal(freqs, want)


def test_count_pairs(setup):
    vocab, samples, oracle, native = setup
    pairs = native.count_pairs(samples)
    want = {}
    for s in samples:
        ids = oracle.encode(s.decode())
        for a, b in zip(ids, ids[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = {(a, b): n for a, b, n in pairs}
    assert got == want
    # sorted by freq desc
    ns = [n for _, _, n in pairs]
    assert ns == sorted(ns, reverse=True)


def test_prune_alternatives(setup):
    vocab, samples, oracle, native = setup
    keep, alts = native.prune_alternatives()
    for tid in range(len(vocab)):
        lat = Lattice(vocab[tid].value)
        oracle.populate_nodes(lat, 0.0)
        nbests = lat.nbest(2)
        want_keep = not (len(nbests) > 1 and len(nbests[0]) > 1)
        assert keep[tid] == want_keep, (tid, vocab[tid])
        if len(nbests) > 1 and len(nbests[0]) == 1:
            want_alts = [n.token_id for n in nbests[1]]
            assert alts[tid] == want_alts, (tid, vocab[tid], alts[tid], want_alts)
        else:
            assert alts[tid] == []


def test_missing_native_dir_falls_back_to_oracle(tmp_path):
    """With TOKENGEEX_NATIVE_DIR pointing nowhere (and an empty cache dir),
    the library degrades to the Python oracle with a warning (subprocess:
    the dir is resolved at import time)."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, TOKENGEEX_NATIVE_DIR="/nonexistent-tg-native",
               XDG_CACHE_HOME=str(tmp_path), PYTHONPATH=root)
    out = subprocess.run(
        [sys.executable, "-c", (
            "import logging; logging.basicConfig(level=logging.WARNING)\n"
            "from tokengeex_tpu.utils import nativelib\n"
            "assert nativelib.get_lib() is None\n"
            "from tokengeex_tpu.core.types import new_default_vocab\n"
            "from tokengeex_tpu.models.unigram import Model\n"
            "print(Model(new_default_vocab()).encode('hi'))\n"
        )],
        env=env, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "[104, 105]" in out.stdout
    assert "falling back to the Python oracle" in out.stderr
