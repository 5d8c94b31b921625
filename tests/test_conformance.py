"""Conformance golden test: a deterministic generate->prune->merge
pipeline over a synthetic multi-language corpus, with committed token-id
goldens (tests/data/conformance.json).

The reference ships no conformance corpus (its tests are inline units
only — SURVEY.md section 4); this harness pins the full pipeline's
behavior so any semantic regression (tie-breaks, scoring, EM, merge
order) shows up as a golden mismatch.

Regenerate the goldens after INTENTIONAL semantic changes with:
    python tests/test_conformance.py --regen
"""

import json
import os
import sys

import pytest

os.environ.setdefault("TOKENGEEX_NUM_THREADS", "1")  # deterministic sums

from tokengeex_tpu import Model, Tokenizer
from tokengeex_tpu.train.generate import VocabularyGenerator
from tokengeex_tpu.train.merge import VocabularyMerger
from tokengeex_tpu.train.prune import VocabularyPruner

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "conformance.json")


def _corpus():
    """Deterministic multi-language mini corpus."""
    import random

    rng = random.Random(1234)
    templates = {
        "python": "def {f}({a}):\n    {v} = {a} + 1\n    return {v}\n",
        "cpp": "int {f}(int {a}) {{ int {v} = {a} + 1; return {v}; }}\n",
        "chinese": "# {f} 模块\n这个函数处理 {a} 数据并返回 {v} 结果。\n",
        "json": '{{"{f}": "{a}", "{v}": [1, 2, 3]}}\n',
    }
    idents = ["data", "value", "result", "count", "index", "total", "item"]
    samples = []
    for _ in range(120):
        lang = rng.choice(list(templates))
        parts = [
            templates[lang].format(
                f=rng.choice(idents), a=rng.choice(idents), v=rng.choice(idents)
            )
            for _ in range(rng.randint(2, 6))
        ]
        samples.append("".join(parts))
    return samples


def _build_tokenizer():
    samples = _corpus()
    gen = VocabularyGenerator(
        max_token_length=12,
        insert_probability=1.0,  # deterministic: no RNG dependence
        allow=r"^ ?[a-z]+$|^.$|^[㐀-䶿一-鿿]+$",
        seed=0,
    )
    gen.feed(samples)
    model = Model(gen.generate(700))
    pruner = VocabularyPruner(vocab_size=500, shrink_factor=0.8,
                              em_subiters=1, dropout=0.0, backend="native")
    raw = [s.encode("utf-8") for s in samples]
    model = pruner.prune(model, raw)
    merger = VocabularyMerger(allow=r"^[ -~]+$", num_merges=20, step=10,
                              backend="native")
    model = merger.merge(model, raw)
    return Tokenizer(model, [], ["<|eos|>"]), samples


def _goldens(tokenizer, samples):
    probe_texts = samples[:10] + [
        "def data(value):\n    return value + 1\n",
        "这个函数处理数据<|eos|>",
        "x = [1, 2, 3]",
    ]
    return {
        "vocab_size": tokenizer.vocab_size(),
        "vocab_sample": [
            t.to_json_obj() for t in tokenizer.model.vocab[:32]
        ],
        "encodings": [tokenizer.encode(t, 0.0) for t in probe_texts],
    }


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden not generated")
def test_pipeline_conformance():
    tokenizer, samples = _build_tokenizer()
    got = _goldens(tokenizer, samples)
    want = json.load(open(GOLDEN))
    assert got["vocab_size"] == want["vocab_size"]
    assert got["vocab_sample"] == want["vocab_sample"]
    for i, (g, w) in enumerate(zip(got["encodings"], want["encodings"])):
        assert g == w, f"encoding {i} diverged"


def test_roundtrip_property():
    tokenizer, samples = _build_tokenizer()
    for s in samples[:20]:
        ids = tokenizer.encode(s, 0.0)
        assert tokenizer.decode(ids, include_special_tokens=True) == s


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        tokenizer, samples = _build_tokenizer()
        with open(GOLDEN, "w") as f:
            json.dump(_goldens(tokenizer, samples), f, indent=1)
        print(f"wrote {GOLDEN}")
