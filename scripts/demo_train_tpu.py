"""End-to-end training demo on the device: generate -> prune(EM) -> merge.

Runs the full vocabulary-engineering pipeline on a synthetic code corpus
with the device (TPU) backend for every corpus pass, printing per-stage
wall times. Usage:

    python scripts/demo_train_tpu.py [--mb 4] [--vocab 8192] [--target 6144]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_corpus(nbytes: int):
    rng = np.random.default_rng(0)
    words = [
        "def", "return", "value", "data", "self", "import", "print", "class",
        "for", "in", "range", "len", "if", "else", "while", "try", "except",
        "yield", "lambda", "None", "True", "False", "result", "index",
    ]
    lines = []
    size = 0
    while size < nbytes:
        n = int(rng.integers(3, 12))
        line = " ".join(words[i] for i in rng.integers(0, len(words), n))
        lines.append(line)
        size += len(line) + 1
    text = "\n".join(lines).encode()[:nbytes]
    return [bytes(text[i : i + 2048]) for i in range(0, len(text), 2048)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=4)
    ap.add_argument("--vocab", type=int, default=8192)
    ap.add_argument("--target", type=int, default=6144)
    ap.add_argument("--backend", default="device")
    args = ap.parse_args()

    from tokengeex_tpu import Model, Tokenizer
    from tokengeex_tpu.train.generate import VocabularyGenerator
    from tokengeex_tpu.train.merge import VocabularyMerger
    from tokengeex_tpu.train.prune import VocabularyPruner

    samples = build_corpus(int(args.mb * 1e6))
    total = sum(map(len, samples))
    print(f"corpus: {total/1e6:.1f} MB, {len(samples)} samples")

    t0 = time.time()
    # Allow multiword substrings so the initial vocabulary can actually
    # reach --vocab (the "exact" single-word patterns cap out at a few
    # hundred tokens on a small-alphabet corpus).
    gen = VocabularyGenerator(max_token_length=16, insert_probability=1.0,
                              allow=r"^[a-zA-Z ]+$", seed=0)
    gen.feed([s.decode() for s in samples])
    model = Model(gen.generate(args.vocab))
    print(f"[generate] {time.time()-t0:.1f}s -> vocab {model.vocab_size()}")

    t0 = time.time()
    pruner = VocabularyPruner(vocab_size=args.target, shrink_factor=0.8,
                              em_subiters=1, dropout=0.0,
                              backend=args.backend)
    model = pruner.prune(model, samples)
    prune_s = time.time() - t0
    print(f"[prune/{args.backend}] {prune_s:.1f}s -> vocab "
          f"{model.vocab_size()} ({total/prune_s/1e6:.2f} MB/s incl. all rounds)")

    t0 = time.time()
    merger = VocabularyMerger(allow=r"^[a-z ]+$", num_merges=16, step=16,
                              backend=args.backend)
    model = merger.merge(model, samples)
    print(f"[merge/{args.backend}] {time.time()-t0:.1f}s -> vocab "
          f"{model.vocab_size()}")

    tok = Tokenizer(model, [], [])
    ids = tok.encode(samples[0].decode())
    assert tok.decode(ids) == samples[0].decode()
    print("roundtrip OK; chars/token =",
          round(len(samples[0]) / len(ids), 2))


if __name__ == "__main__":
    main()
