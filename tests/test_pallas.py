"""Pallas kernel parity: interpret-mode kernels vs the XLA scan path."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokengeex_tpu import ScoredToken
from tokengeex_tpu.ops import lattice_jax as lj
from tokengeex_tpu.ops.match_table import TokenTable
from tokengeex_tpu.utils.packing import pack_samples


def _setup(seed=0, n_samples=48, width=128):
    rng = random.Random(seed)
    alphabet = b"abcdef ()"
    vocab = [ScoredToken(bytes([b]), rng.uniform(-11.0, -9.0)) for b in alphabet]
    seen = {t.value for t in vocab}
    while len(vocab) < 70:
        n = rng.randint(2, 8)
        w = bytes(rng.choice(alphabet) for _ in range(n))
        if w not in seen:
            seen.add(w)
            vocab.append(ScoredToken(w, rng.uniform(-9.0, -1.0)))
    samples = [
        "".join(rng.choice("abcdef ()") for _ in range(rng.randint(1, 90))).encode()
        for _ in range(n_samples)
    ]
    tbl = TokenTable.build(vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
    packed = pack_samples(samples, width=width, row_multiple=128)
    batch = lj.prepare_batch(packed, dt.max_len)
    t2i = {t.value: i for i, t in enumerate(vocab)}
    return dt, packed, batch, t2i


def test_pallas_viterbi_matches_xla():
    dt, packed, batch, _t2i = _setup()
    dp_x, bl_x = lj.viterbi(dt, batch, C=32, dtype=jnp.float32)
    dp_p, bl_p = lj.viterbi(dt, batch, C=32, dtype=jnp.float32,
                            backend="pallas")
    valid = np.isfinite(np.asarray(dp_x))
    np.testing.assert_allclose(np.asarray(dp_p)[valid],
                               np.asarray(dp_x)[valid], rtol=1e-6)
    assert (np.isfinite(np.asarray(dp_p)) == valid).all()
    np.testing.assert_array_equal(np.asarray(bl_p)[valid],
                                  np.asarray(bl_x)[valid])


def test_pallas_forward_matches_xla():
    dt, packed, batch, _t2i = _setup(seed=1)
    a_x = np.asarray(lj.forward(dt, batch, C=32, dtype=jnp.float32))
    a_p = np.asarray(lj.forward(dt, batch, C=32, dtype=jnp.float32,
                                backend="pallas"))
    valid = np.isfinite(a_x)
    assert (np.isfinite(a_p) == valid).all()
    np.testing.assert_allclose(a_p[valid], a_x[valid], rtol=2e-5, atol=1e-5)


def test_pallas_backward_matches_xla():
    dt, packed, batch, _t2i = _setup(seed=2)
    A = lj.forward(dt, batch, C=32, dtype=jnp.float32)
    e_x = lj.fold_expected(dt, lj.backward_expected(dt, batch, A, C=32,
                                                    dtype=jnp.float32))
    e_p = lj.fold_expected(dt, lj.backward_expected(dt, batch, A, C=32,
                                                    dtype=jnp.float32,
                                                    backend="pallas"))
    np.testing.assert_allclose(e_p, e_x, rtol=1e-4, atol=1e-4)


def test_pallas_backtrack_end_to_end():
    dt, packed, batch, t2i = _setup(seed=3)
    dp, bl = lj.viterbi(dt, batch, C=32, dtype=jnp.float32,
                        backend="pallas")
    spans = lj.backtrack(packed, np.asarray(dp), np.asarray(bl), t2i)
    assert all(s is not None for s in spans)
