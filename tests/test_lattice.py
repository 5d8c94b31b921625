"""Lattice forward-backward / nbest golden tests.

Based on the reference's disabled lattice test, which documents expected
marginals for a worked example (reference: src/lattice.rs:403-474).
"""

import math

import pytest

from tokengeex_tpu import Lattice, Model, make_vocab

VOCAB = [
    (b"<", -3.0),
    (b" value", -6.0),
    (b">", -3.0),
    (b"DC value", -8.0),
    (b"<DC", -4.0),
    (b"<DC value>", -12.0),
]

SENTENCE = b"<DC value>"

# Three segmentations exist:
#   ["<DC value>"]            score -12
#   ["<DC", " value", ">"]    score -13
#   ["<", "DC value", ">"]    score -14
_P = [math.exp(-12.0), math.exp(-13.0), math.exp(-14.0)]
_Z = sum(_P)
EXPECTED = {
    b"<DC value>": _P[0] / _Z,
    b">": (_P[1] + _P[2]) / _Z,
    b"<DC": _P[1] / _Z,
    b" value": _P[1] / _Z,
    b"<": _P[2] / _Z,
    b"DC value": _P[2] / _Z,
}


def _build():
    model = Model(make_vocab(VOCAB))
    lattice = Lattice(SENTENCE)
    model.oracle.populate_nodes(lattice, 0.0)
    return model, lattice


def test_populate_marginal():
    model, lattice = _build()
    expected = [0.0] * len(VOCAB)
    z = lattice.populate_marginal(expected)
    assert math.isfinite(z)
    assert abs(z - math.log(_Z)) < 1e-9
    for i, (value, _) in enumerate(VOCAB):
        assert expected[i] == pytest.approx(EXPECTED[value], abs=1e-6), value
    # Reference fixture values (src/lattice.rs:448-453)
    assert expected[5] == pytest.approx(0.665241, abs=1e-5)
    assert expected[2] == pytest.approx(0.334759, abs=1e-5)
    assert expected[4] == pytest.approx(0.244728, abs=1e-5)
    assert expected[1] == pytest.approx(0.244728, abs=1e-5)
    assert expected[0] == pytest.approx(0.090031, abs=1e-5)
    assert expected[3] == pytest.approx(0.090031, abs=1e-5)


def test_viterbi_best_path():
    # The reference's Lattice::viterbi includes the EOS sentinel in its
    # result (backtrack starts at begin_nodes[len][0] == EOS and pushes
    # every node that has a prev; reference: src/lattice.rs:140-148).
    from tokengeex_tpu import EOS_TOKEN_ID

    model, lattice = _build()
    nodes = lattice.viterbi()
    assert [n.token_id for n in nodes] == [5, EOS_TOKEN_ID]


def test_nbest_ordering():
    model, lattice = _build()
    nbests = lattice.nbest(10)
    paths = [[n.token_id for n in path] for path in nbests]
    assert paths == [[5], [4, 1, 2], [0, 3, 2]]


def test_nbest_2_for_prune_alternatives():
    # prune_vocab uses nbest(2) on each token's own bytes
    # (reference: src/prune.rs:179-203).
    model, lattice = _build()
    nbests = lattice.nbest(2)
    assert [n.token_id for n in nbests[0]] == [5]
    assert [n.token_id for n in nbests[1]] == [4, 1, 2]


def test_marginal_sums_to_expected_token_count():
    # Sum over token marginals weighted by nothing = expected number of
    # tokens in a random segmentation; each segmentation contributes
    # len(path) * P(path). Cross-check against enumeration.
    model, lattice = _build()
    expected = [0.0] * len(VOCAB)
    lattice.populate_marginal(expected)
    want = (1 * _P[0] + 3 * _P[1] + 3 * _P[2]) / _Z
    assert sum(expected) == pytest.approx(want, abs=1e-9)
