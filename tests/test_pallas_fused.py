"""Fused-probe Pallas kernels (ops/lattice_pallas_fused.py) vs the XLA
gather path: identical dp/backpointers, forward log-probs, backward
betas, and EM expected counts — with and without dropout — plus the
session integration (fused e_step == native oracle counts).

Runs in Pallas interpret mode on the CPU backend (tests/conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokengeex_tpu.models.unigram import Model
from tokengeex_tpu.ops import lattice_jax as lj
from tokengeex_tpu.ops.match_table import TokenTable
from tokengeex_tpu.train.generate import VocabularyGenerator
from tokengeex_tpu.utils.packing import pack_samples


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    words = ["an", "er", "ti", "on", "ra", "lo", "de", "mi", "value",
             "def", "return", "data", "self", "print"]
    samples = []
    for _ in range(200):
        n = rng.integers(2, 30)
        samples.append(" ".join(words[i] for i in
                                rng.integers(0, len(words), n)).encode())
    gen = VocabularyGenerator(max_token_length=11, insert_probability=1.0,
                              allow=r"^ ?[a-z]+$", seed=0)
    gen.feed([s.decode() for s in samples[:100]])
    model = Model(gen.generate(900))
    tbl = TokenTable.build(model.vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
    assert lj.has_vscan(dt)
    packed = pack_samples(samples, width=512, max_snippet=512,
                          row_multiple=128)
    batch = lj.prepare_batch(packed, dt.max_len)
    return model, dt, batch


def _drop(batch, dropout, seed):
    if dropout == 0.0:
        return None
    return jax.random.randint(
        jax.random.PRNGKey(seed),
        (batch.p1.shape[0], batch.sid.shape[1]),
        minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32)


@pytest.mark.parametrize("dropout", [0.0, 0.3])
def test_fused_viterbi_matches_xla(setup, dropout):
    _, dt, batch = setup
    du = _drop(batch, dropout, 3)
    dp_x, bl_x = lj.viterbi(dt, batch, C=256, drop_u=du, dropout=dropout,
                            backend="xla")
    dp_f, bl_f = lj.viterbi(dt, batch, C=256, drop_u=du, dropout=dropout,
                            backend="fused")
    dp_x, dp_f = np.asarray(dp_x), np.asarray(dp_f)
    fin = np.isfinite(dp_x)
    assert (fin == np.isfinite(dp_f)).all()
    np.testing.assert_allclose(dp_x[fin], dp_f[fin], rtol=1e-6, atol=1e-6)
    assert (np.asarray(bl_x)[fin] == np.asarray(bl_f)[fin]).all()


@pytest.mark.parametrize("dropout", [0.0, 0.3])
def test_fused_forward_betas_match_xla(setup, dropout):
    _, dt, batch = setup
    du = _drop(batch, dropout, 5)
    for op, kw in (("forward", {}), ("betas", {})):
        if op == "forward":
            x = lj.forward(dt, batch, C=256, drop_u=du, dropout=dropout)
            f = lj.forward(dt, batch, C=256, drop_u=du, dropout=dropout,
                           backend="fused")
        else:
            x = lj.backward_betas(dt, batch, C=256, drop_u=du,
                                  dropout=dropout)
            f = lj.backward_betas(dt, batch, C=256, drop_u=du,
                                  dropout=dropout, backend="fused")
        x, f = np.asarray(x), np.asarray(f)
        fin = np.isfinite(x)
        assert (fin == np.isfinite(f)).all(), op
        np.testing.assert_allclose(x[fin], f[fin], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dropout", [0.0, 0.2])
def test_fused_estep_matches_cached(setup, dropout):
    _, dt, batch = setup
    du = _drop(batch, dropout, 9)
    score, slots = lj.match_cache(dt, batch, C=256, dtype=jnp.float32)
    seg = lj.build_seg_struct(slots, lj.seg_nbins(dt, jnp.float32))
    slot_rows = lj.slot_score_rows(dt)
    _, exp1 = lj.estep_cached(dt, batch, slots, slot_rows, seg=seg,
                              drop_u=du, dropout=dropout, C=256)
    _, exp2 = lj.estep_fused(dt, batch, seg, slot_rows, drop_u=du,
                             dropout=dropout, C=256)
    e1 = lj.fold_expected(dt, exp1)
    e2 = lj.fold_expected(dt, exp2)
    np.testing.assert_allclose(e1, e2, rtol=1e-4, atol=1e-4)


def test_session_uses_fused_and_matches_oracle(setup, monkeypatch):
    """DeviceTrainSession routes through estep_fused for vscan-sized
    vocabularies and reproduces the oracle E-step counts."""
    from tokengeex_tpu.train.device_session import DeviceTrainSession

    model, dt, batch = setup
    rng = np.random.default_rng(1)
    words = ["an", "er", "ti", "on", "value", "def", "data"]
    samples = [(" ".join(words[i] for i in rng.integers(0, len(words),
                                                        rng.integers(2, 9)))
                ).encode() for _ in range(40)]

    # The fused path is single-device (mesh runs keep the sharded
    # program); pin the session to one of the 8 virtual CPU devices.
    dev0 = jax.devices()[:1]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: dev0)
    sess = DeviceTrainSession(model, samples, max_snippet=512,
                              kernel="pallas")
    assert sess._fused()
    calls = {"fused": 0}
    orig = lj.estep_fused

    def spy(*a, **k):
        calls["fused"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(lj, "estep_fused", spy)
    got = sess.e_step(model, dropout=0.0, seed=0)
    assert calls["fused"] > 0, "session did not take the fused path"

    native = model.native()
    want, _z = native.estep(samples, max_snippet=512)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    # Frequency pass goes through the fused Viterbi with no slot cache.
    freqs = sess.count_frequencies(model)
    want_f = np.zeros(len(model.vocab), dtype=np.int64)
    for s in samples:
        for tid in model.oracle.encode(s.decode()):
            want_f[tid] += 1
    assert (freqs == want_f).all()
