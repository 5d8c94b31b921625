"""Evaluate a tokenizer's compression on a NUL-separated test set.

Mirrors the reference harness (reference: scripts/evaluate.py): uniform
interface over tokengeex_tpu / tiktoken / sentencepiece / transformers /
HF tokenizers; per-language chars/token plus a 50-bucket sorted token
frequency distribution; JSON output consumed by scripts/plot.py.
"""

import argparse
import base64
import glob
import json
import sys

import numpy as np


def make_encoder(lib: str, f: str):
    """(encode_batch_fn, vocab_size): every library here has a parallel
    or at least vectorized batch API — the reference's per-sample loop
    (reference: scripts/evaluate.py) serializes what rayon/pthreads can
    parallelize, and at GB-scale test sets that dominates wall-clock."""
    if lib == "tiktoken":
        import tiktoken

        try:
            enc = tiktoken.encoding_for_model(f)
        except KeyError:
            # Not a known model name: treat as "<ranks-path>:<model>",
            # a custom .tiktoken rank table (one "<base64-token> <rank>"
            # per line) paired with the named model's split pattern.
            path, model = f.split(":")
            ranks = {}
            with open(path, "rb") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        tok_b64, _, rank = line.partition(b" ")
                        ranks[base64.b64decode(tok_b64)] = int(rank)
            pat = tiktoken.encoding_for_model(model)._pat_str
            enc = tiktoken.Encoding("custom", pat_str=pat,
                                    mergeable_ranks=ranks, special_tokens={})
        return enc.encode_ordinary_batch, enc.n_vocab
    if lib == "sentencepiece":
        import sentencepiece

        sp = sentencepiece.SentencePieceProcessor(model_file=f)
        return sp.EncodeAsIds, sp.vocab_size()  # accepts a list
    if lib == "transformers":
        import transformers

        tok = transformers.AutoTokenizer.from_pretrained(f)
        return (lambda texts: tok(texts, add_special_tokens=False)["input_ids"],
                tok.vocab_size)
    if lib == "tokenizers":
        import tokenizers

        tok = tokenizers.Tokenizer.from_file(f)
        return (lambda texts: [e.ids for e in tok.encode_batch(texts)],
                tok.get_vocab_size())
    if lib in ("tokengeex", "tokengeex_tpu"):
        import tokengeex_tpu

        tok = tokengeex_tpu.Tokenizer.from_file(f)
        return (lambda texts: tok.encode_batch(texts, 0.0)), tok.vocab_size()
    raise ValueError(f"Invalid tokenization library: {lib}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-l", required=True, help="Tokenization library")
    parser.add_argument("-f", required=True, help="Vocab file or slug")
    parser.add_argument("-i", required=True, help="Input file glob")
    parser.add_argument("-o", required=True, help="Output JSON path")
    args = parser.parse_args()

    encode_batch, vocab_size = make_encoder(args.l, args.f)
    vocab_name = args.f.split("/")[-1].split(".")[0]
    print(f"[{vocab_name}] Vocab size: {vocab_size}")

    num_buckets = 50
    bucket_size = max(1, vocab_size // num_buckets)
    out = {
        "vocab_size": vocab_size,
        "compression": {},
        "frequency_buckets": [0] * num_buckets,
    }
    frequency = np.zeros(vocab_size, dtype=np.int64)

    for file in sorted(glob.glob(args.i)):
        lang = file.split("/")[-1].split(".")[0]
        samples = open(file, encoding="utf-8").read().split("\0")
        num_chars = sum(len(s) for s in samples)
        num_tokens = 0
        # Chunked so huge files don't hold every id list at once.
        for i in range(0, len(samples), 4096):
            idss = encode_batch(samples[i : i + 4096])
            flat = np.concatenate(
                [np.asarray(ids, dtype=np.int64) for ids in idss]
                or [np.zeros(0, np.int64)])
            num_tokens += int(flat.size)
            flat = flat[flat < vocab_size]
            frequency += np.bincount(flat, minlength=vocab_size)
        cpt = round(num_chars / max(1, num_tokens), 2)
        out["compression"][lang] = {
            "num_tokens": num_tokens,
            "num_chars": num_chars,
            "chars_per_token": cpt,
        }
        print(f"[{vocab_name}] {lang}, {len(samples)} samples, "
              f"{num_tokens} tokens, {num_chars} chars, {cpt} chars per token")

    frequency[::-1].sort()
    for i in range(num_buckets):
        out["frequency_buckets"][i] = int(
            frequency[i * bucket_size : (i + 1) * bucket_size].sum()
        )

    with open(args.o, "w") as f:
        json.dump(out, f, indent=4)


if __name__ == "__main__":
    main()
