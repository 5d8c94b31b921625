"""Differential tests: device (JAX) lattice ops vs the exact oracle.

The device path must reproduce the oracle's Viterbi segmentations
(including tie-breaks) and EM expected counts on packed batches.
"""

import math
import random

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from tokengeex_tpu import Lattice, OracleModel, ScoredToken
from tokengeex_tpu.ops import lattice_jax as lj
from tokengeex_tpu.ops.match_table import TokenTable
from tokengeex_tpu.utils.packing import pack_samples


def _random_vocab(rng: random.Random, nbig: int = 60):
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


def _random_samples(rng: random.Random, n: int, maxlen: int = 90):
    alphabet = "abcdef ()"
    out = []
    for _ in range(n):
        k = rng.randint(1, maxlen)
        out.append("".join(rng.choice(alphabet) for _ in range(k)).encode())
    return out


def _setup(seed=0, n_samples=24, dtype=jnp.float64):
    rng = random.Random(seed)
    vocab = _random_vocab(rng)
    samples = _random_samples(rng, n_samples)
    oracle = OracleModel(vocab)
    tbl = TokenTable.build(vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=dtype)
    packed = pack_samples(samples, width=128)
    batch = lj.prepare_batch(packed, dt.max_len)
    return vocab, samples, oracle, dt, packed, batch


def test_match_table_lookup_roundtrip():
    rng = random.Random(1)
    vocab = _random_vocab(rng)
    tbl = TokenTable.build(vocab)
    dt = lj.DeviceTables.from_table(tbl)
    # Probe every vocab token's own bytes through the device slab path.
    samples = [t.value for t in vocab]
    packed = pack_samples(samples, width=64)
    batch = lj.prepare_batch(packed, dt.max_len)
    score, ids = lj._match_slab(dt, batch, 0, packed.width, dt.max_len,
                                mode="exact")
    ids = np.asarray(ids)  # (B, L, n_pos)
    score_f, slots = lj._match_slab(dt, batch, 0, packed.width, dt.max_len,
                                    mode="fast")
    slots = np.asarray(slots)
    for (r, s, e, si, _), token in zip(packed.spans, [samples[sp[3]] for sp in packed.spans]):
        tid = ids[r, e - s - 1, s]
        assert tid >= 0, f"token {token!r} not matched"
        assert vocab[tid].value == token
        # fast path agrees through the slot -> id mapping
        slot = slots[r, e - s - 1, s]
        assert dt.slot_to_id[slot] == tid


def test_viterbi_matches_oracle():
    vocab, samples, oracle, dt, packed, batch = _setup(seed=2)
    dp, best_l = lj.viterbi(dt, batch, C=32, dtype=jnp.float64)
    got_spans = lj.backtrack(packed, np.asarray(dp), np.asarray(best_l),
                             oracle.token_to_ids)
    got = lj.reassemble(packed, got_spans, len(samples))
    for s, ids in zip(samples, got):
        want = oracle.encode(s.decode())
        assert ids == want, (s, ids, want)


def test_viterbi_f32_close_to_oracle():
    vocab, samples, oracle, dt64, packed, batch = _setup(seed=3)
    tbl = TokenTable.build(vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
    dp, best_l = lj.viterbi(dt, batch, C=32, dtype=jnp.float32)
    got_spans = lj.backtrack(packed, np.asarray(dp), np.asarray(best_l),
                             oracle.token_to_ids)
    got = lj.reassemble(packed, got_spans, len(samples))
    mismatches = sum(
        1 for s, ids in zip(samples, got) if ids != oracle.encode(s.decode())
    )
    # Random distinct scores: f32 rounding should flip at most a rare tie.
    assert mismatches <= 1


def test_native_backtrack_matches_python():
    # The threaded native backtrack (tg_backtrack_ids) must resolve the
    # exact same id sequences as the Python dict-lookup loop, including
    # per-span NoPath flags.
    from tokengeex_tpu.utils import nativelib

    vocab, samples, oracle, dt64, packed, batch = _setup(seed=7)
    if nativelib.get_lib() is None:
        pytest.skip("native library unavailable")
    tbl = TokenTable.build(vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
    dp, best_l = lj.viterbi(dt, batch, C=32, dtype=jnp.float32)
    dp = np.asarray(dp)
    best_l = np.asarray(best_l)
    nm = nativelib.NativeModel(vocab)
    want = lj.backtrack(packed, dp, best_l, oracle.token_to_ids)
    got = lj.backtrack(packed, dp, best_l, oracle.token_to_ids,
                       native_model=nm)
    assert got == want

    # NoPath: mark one span's dp end as -inf; both paths must agree.
    dp_bad = dp.copy()
    r0, s0, e0, _, _ = packed.spans[0]
    dp_bad[r0, e0 - 1] = -np.inf
    with pytest.raises(lj.NoPathError):
        lj.backtrack(packed, dp_bad, best_l, oracle.token_to_ids,
                     native_model=nm)
    got_soft = lj.backtrack(packed, dp_bad, best_l, oracle.token_to_ids,
                            raise_no_path=False, native_model=nm)
    want_soft = lj.backtrack(packed, dp_bad, best_l, oracle.token_to_ids,
                             raise_no_path=False)
    assert got_soft == want_soft and got_soft[0] is None


def test_forward_z_matches_oracle():
    vocab, samples, oracle, dt, packed, batch = _setup(seed=4)
    A = lj.forward(dt, batch, C=32, dtype=jnp.float64)
    A = np.asarray(A)
    for (r, s, e, si, ci) in packed.spans:
        lat = Lattice(samples[si][s - s:] if False else samples[si])
        # spans are whole samples here (no chopping, width > maxlen)
        oracle.populate_nodes(lat, 0.0)
        expected = [0.0] * len(vocab)
        z = lat.populate_marginal(expected)
        # Sample occupies [s, e) in row r; A resets at s, so z = A[e] - A[s]=A[e]-0
        got_z = A[r, e]
        assert got_z == pytest.approx(z, rel=1e-10), (si, got_z, z)


def test_expected_counts_match_oracle():
    vocab, samples, oracle, dt, packed, batch = _setup(seed=5)
    A = lj.forward(dt, batch, C=32, dtype=jnp.float64)
    expected_dev = lj.fold_expected(
        dt, lj.backward_expected(dt, batch, A, C=32, dtype=jnp.float64)
    )
    expected_ref = [0.0] * len(vocab)
    for s in samples:
        lat = Lattice(s)
        oracle.populate_nodes(lat, 0.0)
        lat.populate_marginal(expected_ref)
    np.testing.assert_allclose(expected_dev, expected_ref, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("dropout", [0.0, 0.3])
def test_segsum_matches_scatter_backward(dropout):
    # Scatter-free (sorted-hit segmented-scan) expected counts must
    # equal the fused scatter path, with and without dropout.
    vocab, samples, oracle, dt, packed, batch = _setup(
        seed=11, dtype=jnp.float32)
    score, slots = lj.match_cache(dt, batch, C=32, dtype=jnp.float32)
    drop_u = None
    if dropout > 0.0:
        key = jax.random.PRNGKey(3)
        drop_u = jax.random.randint(
            key, (batch.p1.shape[0], batch.sid.shape[1]),
            minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32)
    A = lj.forward(dt, batch, C=32, dtype=jnp.float32,
                   cache=(score, slots), drop_u=drop_u, dropout=dropout)
    legacy = lj.backward_expected(
        dt, batch, A, C=32, dtype=jnp.float32, cache=(score, slots),
        drop_u=drop_u, dropout=dropout)
    Bt = lj.backward_betas(
        dt, batch, C=32, dtype=jnp.float32, cache=(score, slots),
        drop_u=drop_u, dropout=dropout)
    seg = lj.build_seg_struct(slots, lj.seg_nbins(dt, jnp.float32))
    # The hit lists are compacted to a power-of-two capacity: tail
    # misses must not survive truncation.
    B, L, W = slots.shape
    nh = np.asarray(seg.n_hit)
    for l0, perm_l in enumerate(seg.perm):
        assert perm_l.shape[0] <= B * W
        assert perm_l.shape[0] % 128 == 0
        assert int(nh[l0]) <= perm_l.shape[0]
    got = lj.segsum_expected(
        dt, batch, A, Bt, seg, lj.slot_score_rows(dt),
        drop_u=drop_u, dropout=dropout, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(legacy), rtol=2e-4, atol=2e-4)
    # And through the fold, against the oracle when dropout is off.
    if dropout == 0.0:
        expected_ref = [0.0] * len(vocab)
        for s in samples:
            lat = Lattice(s)
            oracle.populate_nodes(lat, 0.0)
            lat.populate_marginal(expected_ref)
        np.testing.assert_allclose(
            lj.fold_expected(dt, got), expected_ref, rtol=2e-3, atol=2e-3)


def test_packed_boundaries_are_independent():
    # Two different packings of the same samples must give identical
    # expected counts (boundary resets isolate samples).
    vocab, samples, oracle, dt, packed, batch = _setup(seed=6, n_samples=12)
    A = lj.forward(dt, batch, C=32, dtype=jnp.float64)
    e1 = lj.fold_expected(dt, lj.backward_expected(dt, batch, A, C=32, dtype=jnp.float64))

    packed2 = pack_samples(samples, width=256)
    batch2 = lj.prepare_batch(packed2, dt.max_len)
    A2 = lj.forward(dt, batch2, C=64, dtype=jnp.float64)
    e2 = lj.fold_expected(dt, lj.backward_expected(dt, batch2, A2, C=64, dtype=jnp.float64))
    np.testing.assert_allclose(e1, e2, rtol=1e-9, atol=1e-12)


def test_snippet_chopping_matches_reference_semantics():
    # max_snippet chops long samples; marginals per snippet independently
    # (reference: src/prune.rs:75-83).
    rng = random.Random(7)
    vocab = _random_vocab(rng)
    oracle = OracleModel(vocab)
    long_sample = _random_samples(rng, 1, maxlen=200)[0]
    tbl = TokenTable.build(vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float64)

    packed = pack_samples([long_sample], width=128, max_snippet=64)
    batch = lj.prepare_batch(packed, dt.max_len)
    A = lj.forward(dt, batch, C=32, dtype=jnp.float64)
    e_dev = lj.fold_expected(dt, lj.backward_expected(dt, batch, A, C=32, dtype=jnp.float64))

    e_ref = [0.0] * len(vocab)
    for off in range(0, len(long_sample), 64):
        lat = Lattice(long_sample[off : off + 64])
        oracle.populate_nodes(lat, 0.0)
        lat.populate_marginal(e_ref)
    np.testing.assert_allclose(e_dev, e_ref, rtol=1e-9, atol=1e-12)


def test_no_path_detection():
    vocab = [ScoredToken(b"a", -1.0)]
    tbl = TokenTable.build(vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float64)
    packed = pack_samples([b"ab"], width=32)
    batch = lj.prepare_batch(packed, dt.max_len)
    dp, best_l = lj.viterbi(dt, batch, C=32, dtype=jnp.float64)
    from tokengeex_tpu import NoPathError

    with pytest.raises(NoPathError):
        lj.backtrack(packed, np.asarray(dp), np.asarray(best_l),
                     {t.value: i for i, t in enumerate(vocab)})


def test_viterbi_tie_break_longest_token():
    # Exact-tie: ["ab"] vs ["a","b"] both -4.0; longest token must win
    # (reference: src/model.rs:100-108 strict > over ascending start pos).
    vocab = [
        ScoredToken(b"a", -2.0),
        ScoredToken(b"b", -2.0),
        ScoredToken(b"ab", -4.0),
    ]
    tbl = TokenTable.build(vocab)
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float64)
    packed = pack_samples([b"ab"], width=32)
    batch = lj.prepare_batch(packed, dt.max_len)
    dp, best_l = lj.viterbi(dt, batch, C=32, dtype=jnp.float64)
    spans = lj.backtrack(packed, np.asarray(dp), np.asarray(best_l),
                         {t.value: i for i, t in enumerate(vocab)})
    assert spans[0] == [2]


def test_packing_rejects_oversize_and_width_multiple():
    from tokengeex_tpu.utils.packing import pack_samples

    with pytest.raises(ValueError):
        pack_samples([b"x" * 100], width=64)
    packed = pack_samples([b"x" * 100], width=64, max_snippet=64)
    assert packed.rows % 8 == 0
    assert sum(e - s for (_, s, e, _, _) in packed.spans) == 100


def test_best_l_fits_int8():
    # encode ships backpointers as int8; token lengths must stay < 128
    from tokengeex_tpu.ops.match_table import TokenTable

    vocab = [ScoredToken(b"a" * 100, -1.0), ScoredToken(b"a", -2.0)]
    tbl = TokenTable.build(vocab)
    assert tbl.max_token_len < 128
