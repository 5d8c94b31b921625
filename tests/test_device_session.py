"""DeviceTrainSession: probe-once slot caching across EM passes,
frequency passes, and prune rounds."""

import random

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tokengeex_tpu import Model, ScoredToken
from tokengeex_tpu.train import estep_device as ed
from tokengeex_tpu.train.device_session import DeviceTrainSession
from tokengeex_tpu.train.prune import VocabularyPruner


def _setup():
    rng = random.Random(77)
    alphabet = b"abcdef ()"
    vocab = [ScoredToken(bytes([b]), rng.uniform(-11.0, -9.0))
             for b in alphabet]
    seen = {t.value for t in vocab}
    while len(vocab) < 90:
        n = rng.randint(2, 8)
        w = bytes(rng.choice(alphabet) for _ in range(n))
        if w not in seen:
            seen.add(w)
            vocab.append(ScoredToken(w, rng.uniform(-9.0, -1.0)))
    samples = [
        "".join(rng.choice("abcdef ()")
                for _ in range(rng.randint(1, 700))).encode()
        for _ in range(24)
    ]
    return Model(vocab), samples


@pytest.fixture(scope="module")
def setup():
    return _setup()


def test_session_estep_matches_native(setup):
    model, samples = setup
    sess = DeviceTrainSession(model, samples, max_snippet=256)
    e = sess.e_step(model, 0.0, 0)
    want, _ = model.native().estep(samples, max_snippet=256)
    np.testing.assert_allclose(e, want, rtol=3e-3, atol=1e-3)
    assert len(sess.slot_cache) > 0  # slots actually cached


def test_session_cached_pass_after_rescoring(setup):
    # Second pass on a RESCORED + SHRUNK vocab reuses cached slots; the
    # result must match a fresh run on the new model.
    model, samples = setup
    sess = DeviceTrainSession(model, samples, max_snippet=256)
    sess.e_step(model, 0.0, 0)
    assert len(sess.slot_cache) > 0

    rng = random.Random(3)
    new_vocab = [
        t.clone_with_score(t.score - rng.random())
        for i, t in enumerate(model.vocab)
        if len(t.value) == 1 or i % 5 != 0  # drop some multi-byte tokens
    ]
    model2 = Model(new_vocab)
    e_cached = sess.e_step(model2, 0.0, 0)
    want, _ = model2.native().estep(samples, max_snippet=256)
    np.testing.assert_allclose(e_cached, want, rtol=3e-3, atol=1e-3)


def test_session_mesh_fns_survive_rebind(setup):
    # f32 rebinds must REUSE the compiled sharded fns (tables are
    # per-call args, lj.dt_call_args) — a rebuild per EM sub-iteration
    # means a full recompile per pass on a pod — while still producing
    # the new binding's counts.
    model, samples = setup
    sess = DeviceTrainSession(model, samples, max_snippet=256)
    assert sess.use_mesh  # conftest provides 8 virtual devices
    sess.e_step(model, 0.0, 0)
    fn_before = sess._fns.get("estep:0.0")
    assert fn_before is not None

    rng = random.Random(11)
    new_vocab = [
        t.clone_with_score(t.score - rng.random())
        for i, t in enumerate(model.vocab)
        if len(t.value) == 1 or i % 4 != 0
    ]
    model2 = Model(new_vocab)
    e_reused = sess.e_step(model2, 0.0, 0)
    assert sess._fns.get("estep:0.0") is fn_before  # no rebuild
    want, _ = model2.native().estep(samples, max_snippet=256)
    np.testing.assert_allclose(e_reused, want, rtol=3e-3, atol=1e-3)


def test_session_fused_singledevice_dropout_matches_mesh(setup):
    # The single-device path fuses each group into one estep_cached
    # dispatch and expands the dropout KEY inside the graph; with the
    # same seed it must reproduce the mesh path's counts (both expand
    # the same per-group key to the same (B, sid_w) shape).
    model, samples = setup
    mesh_sess = DeviceTrainSession(model, samples, max_snippet=256)
    e_mesh = mesh_sess.e_step(model, 0.3, 7)

    single = DeviceTrainSession(model, samples, max_snippet=256)
    single.use_mesh = False
    single.n_dev = 1
    single.row_mult = 1
    # The comparison needs identical group shapes (drop bits depend on
    # the (B, sid_w) expansion shape); this corpus packs to a row count
    # that is already a multiple of the mesh padding.
    assert [sub.rows for _, sub in single._groups()] == \
        [sub.rows for _, sub in mesh_sess._groups()]
    e_single = single.e_step(model, 0.3, 7)
    # pass 2 exercises the fused estep_cached branch (slots cached).
    e_single2 = single.e_step(model, 0.3, 7)
    np.testing.assert_allclose(e_single, e_mesh, rtol=2e-3, atol=1e-3)
    np.testing.assert_array_equal(e_single, e_single2)


def test_no_recompiles_across_rebinds(setup):
    # The whole point of stable-shape tables + placeholder scores: an
    # EM pass after a vocabulary rebind must add ZERO new executables
    # to the jit caches (a recompile costs minutes per pass through a
    # remote-compile relay).
    model, samples = setup
    sess = DeviceTrainSession(model, samples, max_snippet=256)
    rng = random.Random(21)

    def shrink(m):
        v = m.vocab
        keep = [t.clone_with_score(t.score - rng.random())
                for i, t in enumerate(v)
                if len(t.value) == 1 or i % 7 != 0]
        return Model(keep)

    m1 = shrink(model)
    m2 = shrink(m1)
    sess.e_step(model, 0.05, 0)
    sess.e_step(m1, 0.05, 1)  # warm every shape incl. the rebind path
    sess.count_frequencies(m1)
    fns = [f for k, f in sess._fns.items()
           if k not in ("mesh",) and hasattr(f, "_cache_size")]
    from tokengeex_tpu.ops import lattice_jax as lj
    fns.append(lj._op_worker)
    before = [f._cache_size() for f in fns]
    sess.e_step(m2, 0.05, 2)
    sess.count_frequencies(m2)
    sess.count_frequencies(shrink(m2))
    after = [f._cache_size() for f in fns]
    assert after == before, (before, after)


def test_session_count_frequencies(setup):
    model, samples = setup
    # One sample longer than max_snippet exercises the unchunked
    # fallback inside the session's frequency pass.
    rng = random.Random(9)
    extra = "".join(rng.choice("abcdef ()") for _ in range(1500)).encode()
    all_samples = list(samples) + [extra]
    sess = DeviceTrainSession(model, all_samples, max_snippet=512)
    sess.e_step(model, 0.0, 0)  # warm the slot cache
    freqs = sess.count_frequencies(model)
    want = model.native().count_frequencies(all_samples)
    np.testing.assert_array_equal(freqs, want)


def test_session_dropout_deterministic(setup):
    model, samples = setup
    sess = DeviceTrainSession(model, samples, max_snippet=256)
    e1 = sess.e_step(model, 0.3, 7)
    e2 = sess.e_step(model, 0.3, 7)
    np.testing.assert_array_equal(e1, e2)
    e3 = sess.e_step(model, 0.3, 8)
    assert not np.array_equal(e1, e3)
    e0 = sess.e_step(model, 0.0, 7)
    assert not np.allclose(e1, e0)


def test_pruner_device_backend_uses_session(setup):
    model, samples = setup
    pruner = VocabularyPruner(vocab_size=40, shrink_factor=0.8,
                              em_subiters=2, dropout=0.0,
                              backend="device")
    seen = []
    orig = VocabularyPruner.run_e_step

    def spy(self, m, s):
        seen.append(self._session)
        return orig(self, m, s)

    VocabularyPruner.run_e_step = spy
    try:
        m2 = pruner.prune(model, samples)
    finally:
        VocabularyPruner.run_e_step = orig
    # The session drove the E-steps...
    assert seen and all(s is not None for s in seen)
    # ...and prune() released its HBM caches on the way out (a 100 MB
    # pipeline OOMed in the merge stage when the prune session's slot
    # caches stayed resident).
    assert pruner._session is None
    assert len(seen[0].slot_cache) == 0
    assert len(seen[0].input_cache) == 0
    assert seen[0].dt is None and seen[0].cache_used == 0
    assert m2.vocab_size() <= 49
    # Byte tokens survive (keep=True) and the model still encodes.
    ids = ed.encode_corpus_device(m2, samples[:4])
    for s, i in zip(samples[:4], ids):
        assert m2.decode_bytes(i) == s


def test_session_segsum_single_device(setup):
    # Single-device sessions use the scatter-free segsum count path;
    # results must match the mesh/legacy session and stay consistent
    # across a rescoring rebind (static structure reused).
    model, samples = setup
    sess = DeviceTrainSession(model, samples, max_snippet=256)
    e_mesh = sess.e_step(model, 0.0, 0)
    # Round 4: mesh sessions build PER-SHARD seg structures too
    # (parallel/mesh.build_seg_struct_sharded) — the scatter-free count
    # path is no longer single-device (round-3 VERDICT item 4).
    assert sess.seg_cache, "mesh session did not build sharded seg"
    # perm planes are per-length tuples; sharded planes carry a leading
    # shard axis.
    seg0 = next(iter(sess.seg_cache.values()))
    assert isinstance(seg0.perm, tuple)
    assert np.asarray(seg0.perm[0]).ndim == 2

    single = DeviceTrainSession(model, samples, max_snippet=256)
    single.use_mesh = False
    single.n_dev = 1
    single.row_mult = 1
    e1 = single.e_step(model, 0.0, 0)
    assert len(single.seg_cache) > 0  # segsum actually engaged
    np.testing.assert_allclose(e1, e_mesh, rtol=3e-3, atol=1e-3)

    rng = random.Random(5)
    model2 = Model([t.clone_with_score(t.score - rng.random())
                    for t in model.vocab])
    e2 = single.e_step(model2, 0.0, 0)
    want, _ = model2.native().estep(samples, max_snippet=256)
    np.testing.assert_allclose(e2, want, rtol=3e-3, atol=1e-3)

    # Dropout through segsum matches the legacy (non-session) stream.
    ed_leg = ed.run_e_step_device(model, samples, dropout=0.3,
                                  max_snippet=256, seed=5)
    e_drop = single.e_step(model, 0.3, 5)
    np.testing.assert_allclose(e_drop, ed_leg, rtol=5e-4, atol=5e-4)


def test_session_dropout_matches_legacy(setup):
    # Same seed => same per-group drop_u stream => identical expected
    # counts whether dropout is baked into the probe (legacy) or applied
    # as a post-mask over cached slots (session).
    model, samples = setup
    sess = DeviceTrainSession(model, samples, max_snippet=256)
    e_sess = sess.e_step(model, 0.3, 5)
    e_leg = ed.run_e_step_device(model, samples, dropout=0.3,
                                 max_snippet=256, seed=5)
    # Same coins, different summation ORDER: the session counts via the
    # segsum path (per-slot interval sums) while the legacy stream
    # scatter-adds — f32 totals agree to ~1e-4 relative, not bit-exact.
    np.testing.assert_allclose(e_sess, e_leg, rtol=5e-4, atol=5e-4)


def test_session_device_freq_counts_single_device(setup, monkeypatch):
    """Single-device sessions count Viterbi frequencies IN-GRAPH
    (lj.viterbi_freq: on-path backpointer walk + exact-table id probe +
    int scatter) — only the (V,) vector leaves the device. Long samples
    are excluded from the device counts (_countable_ends) and re-added
    via the exact chained encode; totals must equal the native
    reference exactly."""
    import jax

    from tokengeex_tpu.ops import lattice_jax as lj

    model, samples = setup
    rng = random.Random(9)
    # 5 KB: above the f32 EM snippet cap but whole in the FREQ packing
    # (counted in-graph); 40 KB: beyond MAX_ENCODE_WIDTH's whole-sample
    # packing, exercising the exact chained fallback.
    mid = "".join(rng.choice("abcdef ()") for _ in range(5000)).encode()
    extra = "".join(rng.choice("abcdef ()") for _ in range(40_000)).encode()
    all_samples = list(samples) + [mid, extra]

    dev0 = jax.devices()[:1]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: dev0)
    calls = {"n": 0}
    orig = lj.viterbi_freq

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(lj, "viterbi_freq", spy)
    sess = DeviceTrainSession(model, all_samples, max_snippet=512)
    # Warm the EM caches FIRST: the freq packing's group indices must
    # never collide with the EM slot cache (fed EM-shaped caches to
    # freq-shaped batches and crashed the 1.1 GB run).
    sess.e_step(model, 0.0, 0)
    assert sess.slot_cache
    freqs = sess.count_frequencies(model)
    assert calls["n"] > 0, "device frequency counting not engaged"
    want = model.native().count_frequencies(all_samples)
    np.testing.assert_array_equal(freqs, want)


def test_session_long_snippet_f32_accuracy(setup):
    """f32 EM over LONG samples: at the reference's 81920-byte snippet
    the f32 DP drift inflated total expected counts ~3x (round-4 bug on
    real corpora); the device path now sub-chops f32 EM at
    TGX_DEVICE_SNIPPET (1 KiB). This corpus is ADVERSARIAL: barely any
    vocab words match, so segmentations cost ~9.5 nats/byte and the
    drift bound sits at ~2% (drift ~ eps*(c*n)*sqrt(n/3)); trained
    vocabularies (c ~ 2-4) stay well under 1%. Bounds absorb drift +
    the window-boundary semantics delta vs the reference's 81920."""
    from tokengeex_tpu.train import estep_device as ed

    model, _ = setup
    rng = random.Random(31)
    words = ["ab", "cd", "ef", "def", "face(", "bead", "cafe", " "]
    long_samples = []
    for _ in range(3):
        parts = []
        size = 0
        while size < 40_000:
            w = words[rng.randrange(len(words))]
            parts.append(w)
            size += len(w)
        long_samples.append("".join(parts).encode()[:40_000])

    sess = DeviceTrainSession(model, long_samples, max_snippet=81920)
    assert sess.max_snippet == ed.DEVICE_EM_SNIPPET
    e = sess.e_step(model, 0.0, 0)
    want, _z = model.native().estep(long_samples, max_snippet=81920)
    assert abs(e.sum() - want.sum()) / want.sum() < 0.04, (
        e.sum(), want.sum())
    big = want > 50
    np.testing.assert_allclose(e[big], want[big], rtol=0.12)
