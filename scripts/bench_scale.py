#!/usr/bin/env python
"""Reference-scale pipeline benchmark on real hardware.

Runs the full generate -> prune -> filter -> merge pipeline at a
realistic fraction of the reference workload (README.md:155-250 trains
500k->32k over ~11 GB; this script defaults to 100 MB and 100k->32k,
tunable via env) and records per-stage wall-clock, s/GB, and final
compression (chars/token) on a held-out split.

Env knobs: TGX_SCALE_MB (default 100), TGX_SCALE_GEN (default 100000),
TGX_SCALE_VOCAB (default 32000), TGX_SCALE_MERGES (default 500).

Output: one JSON object per stage on stdout + a summary object.
"""

import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Surface per-round Task telemetry (%/ETA/MB/s) on stderr; without this
# the prune stage runs silently for its whole duration.
logging.basicConfig(
    level=os.environ.get("TOKENGEEX_LOG", "info").upper(),
    format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    stream=sys.stderr,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_corpus(nbytes: int, seed: int = 0):
    """Synthetic multi-language corpus: python-ish, c-ish, and chinese
    text, NUL-separated samples like the reference's .bin files."""
    rng = np.random.default_rng(seed)
    syll = ["an", "er", "ti", "on", "ra", "lo", "de", "mi", "cu", "va",
            "be", "so", "ne", "pa", "gen", "st", "qu", "ix", "al", "um",
            "tro", "ba", "ke", "zu", "phi", "wo", "ja", "vy", "osh", "el"]
    # A 20k-word pool: a 6k pool capped the learnable vocabulary at
    # ~17.5k tokens (the prune always-keep floor), stalling 32k runs.
    pool = []
    seen = set()
    while len(pool) < 20000:
        w = "".join(syll[i] for i in
                    rng.integers(0, len(syll), rng.integers(2, 5)))
        if w not in seen:
            seen.add(w)
            pool.append(w)
    weights = np.array([1.0 / (1 + i) ** 0.8 for i in range(len(pool))])
    weights /= weights.sum()
    kw_py = ["def", "return", "import", "class", "for", "in", "if",
             "else", "while", "self", "print", "lambda", "yield"]
    kw_c = ["int", "void", "struct", "static", "const", "char", "float",
            "return", "sizeof", "typedef", "switch", "case"]
    zh = [chr(c) for c in rng.integers(0x4E00, 0x9FBF, 1500)]

    def line(lang):
        n = int(rng.integers(3, 12))
        words = [pool[i] for i in rng.choice(len(pool), n, p=weights)]
        if lang == 0:
            head = kw_py[int(rng.integers(0, len(kw_py)))]
            return f"{head} {words[0]}({', '.join(words[1:3])}):\n    " + \
                " ".join(words[3:])
        if lang == 1:
            head = kw_c[int(rng.integers(0, len(kw_c)))]
            return f"{head} {words[0]} = {words[1]}({', '.join(words[2:4])});"
        toks = "".join(zh[i] for i in rng.integers(0, len(zh),
                                                   rng.integers(4, 20)))
        return f"{words[0]} {toks} {words[1]}"

    samples = []
    size = 0
    while size < nbytes:
        lang = int(rng.integers(0, 3))
        sample = "\n".join(line(lang) for _ in range(rng.integers(5, 40)))
        samples.append(sample.encode("utf-8"))
        size += len(samples[-1]) + 1
    return samples


def stage(name, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    return out, dt


def main():
    mb = float(os.environ.get("TGX_SCALE_MB", "100"))
    gen_size = int(os.environ.get("TGX_SCALE_GEN", "100000"))
    vocab_size = int(os.environ.get("TGX_SCALE_VOCAB", "32000"))
    num_merges = int(os.environ.get("TGX_SCALE_MERGES", "500"))

    from tokengeex_tpu import Model, Tokenizer
    from tokengeex_tpu.train.filter import VocabularyFilter
    from tokengeex_tpu.train.generate import VocabularyGenerator
    from tokengeex_tpu.train.merge import VocabularyMerger
    from tokengeex_tpu.train.patterns import PATTERNS, build_allow_regex
    from tokengeex_tpu.train.prune import VocabularyPruner

    corpus_dir = os.environ.get("TGX_SCALE_CORPUS")
    if corpus_dir:
        # Real .bin corpus (scripts/datagen.py layout): TGX_SCALE_MB
        # caps how much of the train split is used (0 = all).
        import glob as _glob

        def load_split(split, cap):
            # Round-robin across language files so a byte cap keeps the
            # language mix instead of truncating alphabetically.
            streams = [
                [s for s in open(p, "rb").read().split(b"\0") if s]
                for p in sorted(_glob.glob(f"{corpus_dir}/{split}/*.bin"))
            ]
            out = []
            size = 0
            i = 0
            while streams and (not cap or size < cap):
                stream = streams[i % len(streams)]
                if stream:
                    s = stream.pop()
                    out.append(s)
                    size += len(s)
                else:
                    streams.pop(i % len(streams))
                    i -= 1
                i += 1
            return out

        train = load_split("train", int(mb * 1e6))
        test = load_split("test", int(mb * 1e5))
    else:
        train = build_corpus(int(mb * 1e6), seed=0)
        test = build_corpus(int(mb * 1e5), seed=1)
    nbytes = sum(len(s) for s in train)
    log(f"train {nbytes/1e6:.1f} MB in {len(train)} samples; "
        f"test {sum(len(s) for s in test)/1e6:.1f} MB")
    results = {"train_mb": nbytes / 1e6}

    allow_path = os.path.join(os.path.dirname(__file__), "..", "data",
                              "exact.regex")
    with open(allow_path) as f:
        allow = f.read().replace("\n", "")

    gen = VocabularyGenerator(max_token_length=16, insert_probability=0.01,
                              allow=allow, seed=0)
    texts = [s.decode("utf-8") for s in train]
    _, dt = stage("generate_feed", lambda: gen.feed(texts))
    results["generate_feed_s"] = dt
    results["generate_feed_mb_s"] = nbytes / 1e6 / dt
    print(json.dumps({"stage": "generate_feed", "seconds": round(dt, 2),
                      "mb_per_s": round(nbytes / 1e6 / dt, 2)}), flush=True)

    vocab, dt = stage("generate", lambda: gen.generate(gen_size))
    model = Model(vocab)
    print(json.dumps({"stage": "generate", "seconds": round(dt, 2),
                      "vocab": len(vocab)}), flush=True)

    pruner = VocabularyPruner(vocab_size=vocab_size, shrink_factor=0.8,
                              em_subiters=2, dropout=0.05,
                              backend="device")
    model, dt = stage("prune", lambda: pruner.prune(model, train))
    results["prune_s"] = dt
    results["prune_s_per_gb"] = dt / (nbytes / 1e9)
    print(json.dumps({"stage": "prune", "seconds": round(dt, 2),
                      "s_per_gb_total": round(dt / (nbytes / 1e9), 1),
                      "vocab": model.vocab_size()}), flush=True)

    filt = VocabularyFilter(vocab_size=vocab_size - 2000, min_score=-13.0)
    model, dt = stage("filter", lambda: filt.filter(model))
    print(json.dumps({"stage": "filter", "seconds": round(dt, 2),
                      "vocab": model.vocab_size()}), flush=True)

    fine = build_allow_regex(
        [p for n, p, _, _ in PATTERNS
         if n in ("lowercase-word", "space-lowercase-word",
                  "capitalized-word", "space-capitalized-word",
                  "chinese-word", "short-number")])
    merger = VocabularyMerger(allow=fine, num_merges=num_merges, step=100,
                              scale_factor=0.9, max_token_length=20,
                              backend="device")
    model, dt = stage("merge", lambda: merger.merge(model, train))
    results["merge_s"] = dt
    print(json.dumps({"stage": "merge", "seconds": round(dt, 2),
                      "vocab": model.vocab_size()}), flush=True)

    # Compression + encode throughput on held-out data. First pass pays
    # compiles + upload (reported as cold); the second pass over the
    # device-cached corpus is the steady serving rate.
    from tokengeex_tpu.train.estep_device import (DeviceCorpus,
                                                  encode_corpus_device)

    test_bytes = sum(len(s) for s in test)
    test_corpus = DeviceCorpus(test)
    t0 = time.time()
    encoded = encode_corpus_device(model, test, corpus=test_corpus)
    enc_dt = time.time() - t0
    t0 = time.time()
    encode_corpus_device(model, test, corpus=test_corpus)
    enc_warm = time.time() - t0
    results["encode_steady_mb_s"] = test_bytes / 1e6 / enc_warm
    total_tokens = sum(len(ids) for ids in encoded)
    total_chars = sum(len(s.decode("utf-8", "replace")) for s in test)
    results["chars_per_token"] = total_chars / max(total_tokens, 1)
    results["encode_mb_s"] = test_bytes / 1e6 / enc_dt
    print(json.dumps({"stage": "evaluate",
                      "chars_per_token": round(results["chars_per_token"], 3),
                      "encode_mb_per_s": round(results["encode_mb_s"], 1),
                      "encode_steady_mb_per_s":
                          round(results["encode_steady_mb_s"], 1),
                      "final_vocab": model.vocab_size()}), flush=True)

    # Cross-library compression reference: an HF `tokenizers` BPE
    # trained locally on the SAME corpus at the SAME final vocab size
    # (the image has no network; pretrained vocabs are unreachable).
    try:
        from tokenizers import Tokenizer as HFTokenizer
        from tokenizers.models import BPE
        from tokenizers.pre_tokenizers import ByteLevel
        from tokenizers.trainers import BpeTrainer

        hf = HFTokenizer(BPE())
        hf.pre_tokenizer = ByteLevel()
        t0 = time.time()
        hf.train_from_iterator(
            (s.decode("utf-8") for s in train),
            BpeTrainer(vocab_size=model.vocab_size(),
                       show_progress=False))
        hf_train_s = time.time() - t0
        hf_tokens = sum(len(hf.encode(s.decode("utf-8")).ids)
                        for s in test)
        results["hf_bpe_chars_per_token"] = total_chars / max(hf_tokens, 1)
        results["hf_bpe_train_s"] = hf_train_s
        print(json.dumps({
            "stage": "hf_bpe_reference",
            "chars_per_token": round(results["hf_bpe_chars_per_token"], 3),
            "train_seconds": round(hf_train_s, 2),
            "vocab": hf.get_vocab_size()}), flush=True)
    except Exception as e:  # noqa: BLE001
        log(f"hf tokenizers reference unavailable: {e}")

    out = os.environ.get("TGX_SCALE_OUT", "BASELINE_SCALE.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"stage": "summary", **{
        k: (round(v, 3) if isinstance(v, float) else v)
        for k, v in results.items()}}), flush=True)


if __name__ == "__main__":
    main()
