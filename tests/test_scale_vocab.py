"""Scale-vocabulary fuzz: the paths the recipe actually runs.

The reference recipe spends nearly all its EM time at 32k-500k vocab
(reference: src/prune.rs:24-54 — 13 shrink rounds from 500k), where the
fused in-VMEM probe does not apply (table bits > TGX_VSCAN_BITS) and
the session runs the cached-slot bucket path in the DENSE RANK space
(ops.lattice_jax.RankSpace, round 5). Round-3/4 fuzz built 376-token
vocabularies, so both round-4 scale bugs (segsum f32 ulp loss on wide
score ranges, group-index collisions) escaped it — these cases cross
the vscan->bucket boundary, use post-M-step-like wide score ranges,
and pin rank-space / slot-space / native equivalence.
"""

import random

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tokengeex_tpu import ScoredToken
from tokengeex_tpu.models.unigram import Model
from tokengeex_tpu.ops import lattice_jax as lj
from tokengeex_tpu.ops.match_table import TokenTable
from tokengeex_tpu.train.device_session import DeviceTrainSession
from tokengeex_tpu.utils import nativelib


def _scale_case(seed, n_tokens=20_000, wide_scores=False):
    """Random vocabulary big enough that TokenTable.bits > 15 (the
    vscan/bucket boundary) plus a small corpus it segments densely.

    wide_scores=True assigns post-M-step-like magnitudes: most tokens
    in [-12, -1], a rare tail at ~-40 — the dynamic range that exposed
    the round-4 segsum ulp bug (a rare token's marginals vanishing to
    f32 rounding when a SEG_BLK block mixes it with huge-weight
    neighbors; commit 3755947's trigger was exactly this shape).
    """
    rng = random.Random(seed)
    alphabet = b"abcdef ()"
    vocab = [ScoredToken(bytes([b]), rng.uniform(-11.0, -9.0))
             for b in alphabet]
    seen = {t.value for t in vocab}
    rare = []
    while len(vocab) < n_tokens:
        n = rng.randint(2, 8)
        w = bytes(rng.choice(alphabet) for _ in range(n))
        if w in seen:
            continue
        seen.add(w)
        if wide_scores and rng.random() < 0.002:
            vocab.append(ScoredToken(w, rng.uniform(-16.0, -13.0)))
            rare.append(w)
        else:
            vocab.append(ScoredToken(w, rng.uniform(-12.0, -1.0)))
    samples = []
    pool = [t.value for t in vocab[len(alphabet):]]
    for _ in range(48):
        parts = []
        size = 0
        target = rng.randint(64, 500)
        while size < target:
            p = rng.choice(pool) if rng.random() < 0.6 else \
                bytes(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
            parts.append(p)
            size += len(p)
        samples.append(b"".join(parts)[:target])
    if wide_scores:
        # Guarantee the rare tail occurs in-corpus repeatedly (its
        # expected counts are the assertion target; single occurrences
        # would sit below the f32 block-sum noise floor by design).
        for w in rare[:8]:
            samples.extend([b"ab" + w + b"ba" + w + b"cd"] * 5)
    return Model(vocab), samples, rare


@pytest.fixture(scope="module")
def scale_setup():
    return _scale_case(5)


def test_scale_vocab_crosses_vscan_boundary(scale_setup):
    model, _samples, _ = scale_setup
    tbl = TokenTable.build(model.vocab)
    assert tbl.bits > lj.vscan_max_bits()
    dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
    assert not lj.has_vscan(dt)  # the recipe-scale bucket path


def test_scale_vocab_session_estep_vs_native(scale_setup):
    """Session EM (rank space, bucket probe, segsum) at >vscan vocab ==
    the native f64 reference within f32 EM tolerance."""
    if nativelib.get_lib() is None:
        pytest.skip("native runtime unavailable")
    model, samples, _ = scale_setup
    sess = DeviceTrainSession(model, samples, max_snippet=512)
    assert sess.use_rank
    assert sess._nbins() < lj.seg_nbins(sess.dt, jnp.float32)
    e = sess.e_step(model, 0.0, 0)
    want, _ = model.native().estep(samples, max_snippet=512)
    np.testing.assert_allclose(e, want, rtol=3e-3, atol=1e-3)


def test_scale_vocab_rank_vs_slot_space(scale_setup, monkeypatch):
    """TGX_RANK=0 (raw slot space, the round-4 formulation) and the
    default rank space run the same kernels over remapped indices —
    counts must agree to f32 noise, after rescoring + removals."""
    model, samples, _ = scale_setup
    sess_r = DeviceTrainSession(model, samples, max_snippet=512)
    monkeypatch.setenv("TGX_RANK", "0")
    sess_s = DeviceTrainSession(model, samples, max_snippet=512)
    assert sess_r.use_rank and not sess_s.use_rank
    e_r = sess_r.e_step(model, 0.0, 0)
    e_s = sess_s.e_step(model, 0.0, 0)
    np.testing.assert_allclose(e_r, e_s, rtol=1e-4, atol=1e-5)

    # Rescore + drop some tokens: rebind keeps both spaces' caches.
    rng = random.Random(9)
    vocab2 = [t.clone_with_score(t.score - rng.random())
              for i, t in enumerate(model.vocab)
              if len(t.value) == 1 or i % 7 != 0]
    model2 = Model(vocab2)
    e_r2 = sess_r.e_step(model2, 0.0, 1)
    e_s2 = sess_s.e_step(model2, 0.0, 1)
    np.testing.assert_allclose(e_r2, e_s2, rtol=1e-4, atol=1e-5)


def test_scale_vocab_wide_scores_keep_rare_tokens():
    """Post-M-step-like score ranges: low-probability tokens whose
    f64-reference expected counts are small-but-real must survive the
    f32 segsum when their hits share SEG_BLK blocks with marginal-1.0
    neighbors (round-4 bug class 3755947: the old exp(score)-factored
    formulation silently zeroed them). Tolerances follow the
    documented f32 conditioning contract (_interval_sums): edge pieces
    are accurate to ~ulp(block total), so counts are asserted well
    above that floor, not at it."""
    if nativelib.get_lib() is None:
        pytest.skip("native runtime unavailable")
    model, samples, rare = _scale_case(11, wide_scores=True)
    sess = DeviceTrainSession(model, samples, max_snippet=512)
    e = sess.e_step(model, 0.0, 0)
    want, _ = model.native().estep(samples, max_snippet=512)
    ids = model.oracle.token_to_ids
    checked = 0
    for w in rare:
        i = ids[w]
        if want[i] > 1e-4:
            checked += 1
            assert e[i] > 0.0, (w, want[i], e[i])
            np.testing.assert_allclose(e[i], want[i], rtol=0.1,
                                       atol=5e-5)
    assert checked >= 4  # the fixture really exercised the rare tail


def test_scale_vocab_freq_pass_uses_cache_and_matches(scale_setup):
    """Frequency pass at >vscan vocab: the shared-packing cached-slot
    Viterbi must count exactly what per-sample native encodes count
    (reference: src/prune.rs:205-246)."""
    if nativelib.get_lib() is None:
        pytest.skip("native runtime unavailable")
    model, samples, _ = scale_setup
    sess = DeviceTrainSession(model, samples, max_snippet=512)
    sess.e_step(model, 0.0, 0)  # populates the slot cache
    assert sess.slot_cache or sess.seg_cache
    freqs = sess.count_frequencies(model)
    want = np.zeros(model.vocab_size(), dtype=np.int64)
    for ids in model.native().encode_batch(samples):
        np.add.at(want, np.asarray(ids, dtype=np.int64), 1)
    assert (freqs == want).all()


def test_scale_vocab_mesh_vs_single_device(scale_setup, monkeypatch):
    """Sharded-mesh counts == single-device counts at recipe-scale
    vocab (the 8-virtual-device CPU mesh vs a pinned single device)."""
    model, samples, _ = scale_setup
    sess_m = DeviceTrainSession(model, samples, max_snippet=512)
    assert sess_m.use_mesh
    e_m = sess_m.e_step(model, 0.0, 0)

    single = DeviceTrainSession(model, samples, max_snippet=512)
    single.use_mesh = False
    single.n_dev = 1
    single.row_mult = 128 if single.kernel == "pallas" else 1
    e_1 = single.e_step(model, 0.0, 0)
    np.testing.assert_allclose(e_m, e_1, rtol=1e-4, atol=1e-5)
