"""Cuckoo token-table collision guarantees.

The 1-gather EM probe discriminates vocabulary tokens with only
(slot index, high-16 fp2 bits); at large vocabularies some token pairs
are EXPECTED to collide there. TokenTable.build must detect every such
case by emulating the device probes and repair it (pin the cluster into
t2), so no vocabulary token is ever silently scored/counted as another.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tokengeex_tpu import ScoredToken
from tokengeex_tpu.ops import hashing as H
from tokengeex_tpu.ops import match_table as mt
from tokengeex_tpu.ops import lattice_jax as lj


def _entry_key(tokens, bits):
    """(idx1 << 16 | fp2_hi16) per token — the EM-probe cluster key."""
    by = {t: i for i, t in enumerate(tokens)}
    fp1, fp2, lens, _ = mt._entry_arrays(by, max(map(len, tokens)))
    idx1 = H.host_table_index(fp1, lens, H.IDX_A1, H.IDX_M1, bits)
    return (idx1.astype(np.uint64) << np.uint64(16)) | \
        (fp2.astype(np.uint64) >> np.uint64(16))


def _find_em_collision_pair(bits=8, length=6):
    """Brute-force two distinct tokens sharing (idx1, fp2-hi16)."""
    rng = np.random.default_rng(0)
    raw = rng.integers(97, 123, size=(1 << 15, length), dtype=np.uint8)
    toks = list({bytes(r) for r in raw})
    keys = _entry_key(toks, bits)
    order = np.argsort(keys)
    dup = np.nonzero(keys[order][1:] == keys[order][:-1])[0]
    assert dup.size, "no collision found; enlarge the search"
    k = int(dup[0])
    return toks[order[k]], toks[order[k + 1]]


def _vocab_bytes(vocab):
    out = {}
    for i, t in enumerate(vocab):
        out[t.value] = i
    return out


def test_build_repairs_em_shadowing():
    a, b = _find_em_collision_pair()
    fillers = [bytes([97 + i]) * 2 for i in range(8)]
    vocab = [ScoredToken(v, -5.0) for v in fillers]
    vocab += [ScoredToken(a, -4.0), ScoredToken(b, -4.5)]
    by = _vocab_bytes(vocab)
    max_len = max(len(t.value) for t in vocab)
    ents = mt._entry_arrays(by, max_len)

    # Unrepaired build: one of the pair lands in t2 shadowed by the
    # other's t1 slot — the emulation must flag it.
    t1, t2 = mt._build_cuckoo_vectorized(by, 8, max_len, entries=ents)
    assert mt._shadowed_entries(ents, t1, t2, 8).size > 0

    # The public build path must repair it.
    tbl = mt.TokenTable.build(vocab)
    ents2 = mt._entry_arrays(by, tbl.max_token_len)
    assert mt._shadowed_entries(ents2, tbl.t1, tbl.t2, tbl.bits).size == 0
    # Every token still resolves to its exact row somewhere.
    for tok, tid in by.items():
        rows = np.concatenate([tbl.t1, tbl.t2])
        assert (rows[:, 3] == np.uint32(tid)).sum() == 1


def test_fingerprint_collision_raises():
    ents = (
        np.array([7, 7], dtype=np.uint32),
        np.array([9, 9], dtype=np.uint32),
        np.array([3, 3], dtype=np.uint32),
        np.array([0, 1], dtype=np.uint32),
    )
    with pytest.raises(mt.CuckooBuildError, match="fingerprint collision"):
        mt._check_fingerprint_uniqueness({b"aaa": 0, b"bbb": 1}, ents)


def _find_zero_hi_token(length=6):
    """A token whose fp2 high-16 bits are zero (hits the empty-slot
    check word)."""
    rng = np.random.default_rng(1)
    raw = rng.integers(97, 123, size=(1 << 20, length), dtype=np.uint8)
    toks = list({bytes(r) for r in raw})
    by = {t: i for i, t in enumerate(toks)}
    _, fp2, _, _ = mt._entry_arrays(by, length)
    hits = np.nonzero((fp2 & np.uint32(0xFFFF0000)) == 0)[0]
    assert hits.size, "no zero-hi token found; enlarge the search"
    return toks[int(hits[0])]


def test_em_probe_empty_t1_slot_falls_through():
    # A token stored only in t2 whose fp2-hi16 is 0 used to be masked by
    # the empty t1 slot's zero check word (q=0xFFFF -> global miss).
    x = _find_zero_hi_token()
    bits = 8
    size = 1 << bits
    empty = np.zeros((size, 4), dtype=np.uint32)
    empty[:, 3] = np.uint32(0xFFFFFFFF)
    t1 = empty.copy()
    t2 = empty.copy()
    by = {x: 0}
    fp1, fp2, lens, ids = mt._entry_arrays(by, len(x))
    idx2 = int(H.host_table_index(fp2, lens, H.IDX_A2, H.IDX_M2, bits)[0])
    t2[idx2] = [fp1[0], fp2[0], lens[0], 0]

    tbl = mt.TokenTable(
        t1=t1, t2=t2, bits=bits,
        scores=np.array([-4.0], dtype=np.float32),
        scores_f64=np.array([-4.0], dtype=np.float64),
        max_token_len=len(x), vocab_size=1,
    )
    assert mt._shadowed_entries((fp1, fp2, lens, ids), t1, t2, bits).size == 0

    from tokengeex_tpu.utils.packing import pack_samples

    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
    packed = pack_samples([x], width=512)
    batch = lj.prepare_batch(packed, dt.max_len)
    score, slot = lj.match_cache(dt, batch, C=512, probe="em")
    s = float(score[0, len(x) - 1, 0])
    assert np.isfinite(s) and s < 0  # the token matches
    assert int(slot[0, len(x) - 1, 0]) == idx2 + size  # at its t2 slot
    # Fast probe resolves it too.
    score_f, slot_f = lj.match_cache(dt, batch, C=512, probe="fast")
    assert np.isfinite(float(score_f[0, len(x) - 1, 0]))


def test_build_large_random_vocab_shadow_free():
    # A few hundred thousand tokens make EM-probe collisions likely;
    # build must still come out shadow-free.
    rng = np.random.default_rng(2)
    raw = rng.integers(97, 123, size=(120_000, 7), dtype=np.uint8)
    toks = list({bytes(r) for r in raw})
    vocab = [ScoredToken(t, -6.0) for t in toks]
    tbl = mt.TokenTable.build(vocab)
    by = _vocab_bytes(vocab)
    ents = mt._entry_arrays(by, tbl.max_token_len)
    assert mt._shadowed_entries(ents, tbl.t1, tbl.t2, tbl.bits).size == 0
