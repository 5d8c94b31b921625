"""Hand-derived golden vectors for the trickiest reference semantics.

Unlike tests/data/conformance.json (self-generated regression pins),
every expected value here was derived BY HAND from the Rust source —
they can catch a consistently-wrong port.
"""

import numpy as np
import pytest

from tokengeex_tpu import Model, OracleModel, Lattice, ScoredToken
from tokengeex_tpu.train.prune import VocabularyPruner


def test_nbest_chain_golden():
    # reference: src/lattice.rs:152-238 (A* hypothesis search).
    # vocab scores chosen so all four segmentations of "abb" have
    # distinct hand-computed path scores:
    #   ab|b   : -1.5 + -1.2        = -2.7   (best)
    #   a|bb   : -1.0 + -2.0        = -3.0
    #   a|b|b  : -1.0 + -1.2 + -1.2 = -3.4
    #   abb    : -3.9               = -3.9
    vocab = [
        ScoredToken(b"a", -1.0),
        ScoredToken(b"b", -1.2),
        ScoredToken(b"ab", -1.5),
        ScoredToken(b"bb", -2.0),
        ScoredToken(b"abb", -3.9),
    ]
    oracle = OracleModel(vocab)
    lat = Lattice(b"abb")
    oracle.populate_nodes(lat, 0.0)
    paths = lat.nbest(4)
    byval = {t.value: i for i, t in enumerate(vocab)}
    got = [[n.token_id for n in path] for path in paths]
    want = [
        [byval[b"ab"], byval[b"b"]],
        [byval[b"a"], byval[b"bb"]],
        [byval[b"a"], byval[b"b"], byval[b"b"]],
        [byval[b"abb"]],
    ]
    assert got == want


def test_nbest_two_best_of_own_token():
    # The pruner asks nbest(2) of each token's own bytes
    # (reference: src/prune.rs:179-203): "ab" with a dominant
    # single-token path must yield itself first, then the best
    # decomposition.
    vocab = [
        ScoredToken(b"a", -2.0),
        ScoredToken(b"b", -2.1),
        ScoredToken(b"ab", -1.0),
    ]
    oracle = OracleModel(vocab)
    lat = Lattice(b"ab")
    oracle.populate_nodes(lat, 0.0)
    paths = lat.nbest(2)
    got = [[n.token_id for n in path] for path in paths]
    assert got == [[2], [0, 1]]  # [ab], then [a, b] at -4.1


def test_estep_marginals_analytic():
    # reference: src/lattice.rs:245-312 (forward/backward marginals).
    # Vocab {a:-1.0, b:-1.5, ab:-2.0} on "ab" has exactly two paths:
    #   a|b : exp(-2.5), ab : exp(-2.0); Z = e^-2 + e^-2.5.
    # Expected counts are the path posteriors:
    #   E[a] = E[b] = e^-2.5 / Z, E[ab] = e^-2 / Z.
    import math

    vocab = [
        ScoredToken(b"a", -1.0),
        ScoredToken(b"b", -1.5),
        ScoredToken(b"ab", -2.0),
    ]
    z = math.exp(-2.0) + math.exp(-2.5)
    p_split = math.exp(-2.5) / z
    p_whole = math.exp(-2.0) / z
    want = np.array([p_split, p_split, p_whole])

    oracle = OracleModel(vocab)
    lat = Lattice(b"ab")
    oracle.populate_nodes(lat, 0.0)
    expected = [0.0] * len(vocab)
    got_z = lat.populate_marginal(expected)
    assert got_z == pytest.approx(math.log(z), rel=1e-12)
    np.testing.assert_allclose(expected, want, rtol=1e-12)

    from tokengeex_tpu.train.estep_device import run_e_step_device
    import jax.numpy as jnp

    e_dev = run_e_step_device(Model(vocab), [b"ab"], dropout=0.0,
                              max_snippet=64, dtype=jnp.float64)
    np.testing.assert_allclose(e_dev, want, rtol=1e-12)


def test_mstep_digamma_analytic():
    # reference: src/prune.rs:124-170. digamma at small integers is
    # exact: psi(1) = -gamma, psi(2) = 1-gamma, psi(3) = 3/2-gamma, so
    # counts [1, 2] rescore to exactly [-3/2, -1/2] (gamma cancels).
    vocab = [ScoredToken(b"a", -9.0), ScoredToken(b"b", -9.0)]
    pruner = VocabularyPruner(vocab_size=2, backend="oracle")
    out = pruner.run_m_step(Model(vocab), np.array([1.0, 2.0]))
    assert out[0].score == pytest.approx(-1.5, abs=1e-12)
    assert out[1].score == pytest.approx(-0.5, abs=1e-12)


def test_prune_loss_golden(monkeypatch):
    # reference: src/prune.rs:245-320, with every branch pinned:
    #   keep=True        -> kept unconditionally
    #   freq=0, !keep_al -> dropped ("never occurs")
    #   no alternatives  -> kept
    #   freq>0           -> loss candidate
    #   freq=0 + always_keep + alternatives -> falls through EVERY
    #       branch and is silently dropped (reference quirk)
    #
    # Hand-computed losses (sum_freq=92, num_samples=10, V=6 so the
    # alternatives.len()-1 normalizer quirk multiplies freq by 5):
    #   "bc" freq 30, alts [b, c]:
    #       loss = 3 * (ln(30/92) - (ln 38 + ln 34 - 2 ln 242))
    #            = 3 * (-1.120592 + 3.813929) = +8.0800
    #   "c" freq 4, alts [b]:
    #       loss = 0.4 * (ln(4/92) - (ln 12 - ln 112))
    #            = 0.4 * (-3.135495 + 2.233592) = -0.3608
    # so "bc" ranks before "c".
    vocab = [
        ScoredToken(b"a", -1.0, True),    # 0: keep
        ScoredToken(b"bc", -2.0),         # 1: candidate, loss +8.08
        ScoredToken(b"b", -2.5),          # 2: no alternatives -> kept
        ScoredToken(b"c", -2.6),          # 3: candidate, loss -0.36
        ScoredToken(b"bcc", -5.0),        # 4: freq 0 + always_keep quirk
        ScoredToken(b"cc", -3.0),         # 5: freq 0, dropped
    ]
    model = Model(vocab)
    freqs = np.array([50, 30, 8, 4, 0, 0], dtype=np.int64)
    always_keep = np.array([True, False, True, False, True, False])
    alternatives = [[], [2, 3], [], [2], [1, 2], [2]]
    samples = [b"x"] * 10  # only len(samples) matters after the patches

    pruner = VocabularyPruner(vocab_size=4, shrink_factor=0.5,
                              backend="oracle")
    monkeypatch.setattr(pruner, "_alternatives",
                        lambda m: (always_keep, alternatives))
    monkeypatch.setattr(pruner, "_count_frequencies",
                        lambda m, s, t: freqs)

    out = pruner.prune_vocab(model, samples)
    got = [t.value for t in out]
    # a (keep), b (no alts), then candidates by loss desc: bc, c;
    # final sort by score desc.
    assert got == [b"a", b"bc", b"b", b"c"]

    # Tighter target: only the top candidate survives.
    pruner2 = VocabularyPruner(vocab_size=3, shrink_factor=0.1,
                               backend="oracle")
    monkeypatch.setattr(pruner2, "_alternatives",
                        lambda m: (always_keep, alternatives))
    monkeypatch.setattr(pruner2, "_count_frequencies",
                        lambda m, s, t: freqs)
    got2 = [t.value for t in pruner2.prune_vocab(model, samples)]
    assert got2 == [b"a", b"bc", b"b"]
    # The freq-0 always_keep token with alternatives fell through every
    # branch (reference quirk) — never kept, never a candidate.
    assert b"bcc" not in got and b"bcc" not in got2
