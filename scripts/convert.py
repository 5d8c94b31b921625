"""Convert / truncate a TikToken vocabulary.

Mirrors the reference (reference: scripts/convert.py) and completes it:
the reference raises NotImplementedError for the TokenGeeX and HF output
paths (reference: scripts/convert.py:108-116); here --tokengeex emits a
v2.0 unigram JSON with frequency-derived log-prob scores.
"""

import argparse
import glob
import json
import math
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", required=True,
                        help="Model slug of the tiktoken vocabulary")
    parser.add_argument("-v", type=int,
                        help="Truncated vocabulary size")
    parser.add_argument("-f", help="Glob of corpus files for frequency counts")
    parser.add_argument("--tokengeex", help="Output path (v2.0 JSON)")
    parser.add_argument("--tiktoken", help="Output path (tiktoken format)")
    args = parser.parse_args()

    import tiktoken

    enc = tiktoken.encoding_for_model(args.i)
    mergeable_ranks = enc._mergeable_ranks
    print(f"Loaded {args.i}: {len(mergeable_ranks)} tokens")

    freqs = {rank: 0 for rank in mergeable_ranks.values()}
    if args.f:
        for file in glob.glob(args.f):
            data = open(file, "rb").read().split(b"\0")
            for raw in data:
                if not raw:
                    continue
                for tid in enc.encode_ordinary(raw.decode("utf-8", "replace")):
                    if tid in freqs:
                        freqs[tid] += 1

    items = sorted(mergeable_ranks.items(), key=lambda kv: kv[1])
    if args.v and args.f:
        # Keep single bytes plus the most frequent tokens.
        singles = [(tok, rank) for tok, rank in items if len(tok) == 1]
        multi = [(tok, rank) for tok, rank in items if len(tok) > 1]
        multi.sort(key=lambda kv: -freqs.get(kv[1], 0))
        items = singles + multi[: max(0, args.v - len(singles))]
    elif args.v:
        items = items[: args.v]

    if args.tiktoken:
        from tiktoken.load import dump_tiktoken_bpe

        ranks = {tok: i for i, (tok, _) in enumerate(items)}
        dump_tiktoken_bpe(ranks, args.tiktoken)
        print(f"Wrote tiktoken vocabulary ({len(ranks)}) to {args.tiktoken}")

    if args.tokengeex:
        sys.path.insert(0, ".")
        from tokengeex_tpu import Model, ScoredToken, Tokenizer

        total = sum(freqs.get(rank, 0) + 1 for _, rank in items)
        vocab = [
            ScoredToken(tok, math.log((freqs.get(rank, 0) + 1) / total),
                        len(tok) == 1)
            for tok, rank in items
        ]
        Tokenizer(Model(vocab), [], []).save(args.tokengeex)
        print(f"Wrote tokengeex vocabulary ({len(vocab)}) to {args.tokengeex}")


if __name__ == "__main__":
    main()
