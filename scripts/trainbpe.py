"""Train baseline BPE tokenizers for comparison.

Mirrors the reference (reference: scripts/trainbpe.py): a HuggingFace
byte-level BPE (max token length 32) and, when the sentencepiece package
is available, a SentencePiece BPE with byte_fallback, identity
normalization and split_digits.

Usage:
    python scripts/trainbpe.py hf  -v 32768 -o out.json  train1.bin ...
    python scripts/trainbpe.py spm -v 32768 -o out.model train1.bin ...
"""

import argparse
import sys


def load_samples(paths):
    samples = []
    for path in paths:
        data = open(path, "rb").read().split(b"\0")
        samples.extend(d.decode("utf-8") for d in data if d)
    return samples


def train_hf(args):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tokenizer = Tokenizer(models.BPE())
    tokenizer.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=args.vocab_size,
        max_token_length=32,
        special_tokens=[],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    samples = load_samples(args.train)
    tokenizer.train_from_iterator(samples, trainer=trainer)
    tokenizer.save(args.output)
    print(f"Saved HF BPE ({args.vocab_size}) to {args.output}")


def train_spm(args):
    try:
        import sentencepiece as spm
    except ImportError:
        print("sentencepiece is not installed in this environment; "
              "use the 'hf' backend instead", file=sys.stderr)
        raise SystemExit(2)

    spm.SentencePieceTrainer.train(
        input=",".join(args.train),
        model_prefix=args.output,
        model_type="bpe",
        vocab_size=args.vocab_size,
        byte_fallback=True,
        normalization_rule_name="identity",
        split_digits=True,
        max_sentence_length=2**20,
    )
    print(f"Saved SentencePiece BPE ({args.vocab_size}) to {args.output}.model")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("backend", choices=["hf", "spm"])
    parser.add_argument("-v", "--vocab-size", type=int, required=True)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("train", nargs="+")
    args = parser.parse_args()
    if args.backend == "hf":
        train_hf(args)
    else:
        train_spm(args)


if __name__ == "__main__":
    main()
