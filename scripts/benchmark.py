"""Encode throughput benchmark vs tiktoken / HuggingFace.

Mirrors the reference harness (reference: scripts/benchmark.py) with
the bit-rot fixed: usage
    python scripts/benchmark.py [num_threads] [vocab.json] [corpus.bin]
Adds a TPU row when a non-CPU JAX device is available.
"""

import os
import sys
import time

num_threads = int(sys.argv[1]) if len(sys.argv) > 1 else 1
vocab_path = sys.argv[2] if len(sys.argv) > 2 else "./data/unigram-65k.json"
corpus_path = sys.argv[3] if len(sys.argv) > 3 else "./data/train.bin"

os.environ["TOKENIZERS_PARALLELISM"] = "1"
os.environ["TOKENGEEX_NUM_THREADS"] = str(num_threads)


def bytes_to_mb(n: int) -> float:
    return round(n / 1024 / 1024, 2)


def report(name: str, num_bytes: int, seconds: float) -> None:
    label = ("single thread" if num_threads < 2 else f"{num_threads} threads")
    print(f"{name:<12} {bytes_to_mb(int(num_bytes / seconds)):>7} MB/s "
          f"{round(seconds, 2):>6}s ({label})")


def benchmark_batch(documents) -> None:
    num_bytes = sum(len(d.encode()) for d in documents)

    try:
        import tiktoken

        enc = tiktoken.get_encoding("gpt2")
        enc.encode("warmup")
        start = time.perf_counter()
        enc.encode_ordinary_batch(documents, num_threads=num_threads)
        report("TikToken", num_bytes, time.perf_counter() - start)
    except Exception as e:  # pragma: no cover - optional dependency
        print(f"TikToken     skipped ({e})")

    try:
        from transformers import AutoTokenizer

        hf_enc = AutoTokenizer.from_pretrained("gpt2")
        hf_enc.model_max_length = int(1e30)
        hf_enc.encode("warmup")
        start = time.perf_counter()
        hf_enc(documents)
        report("HuggingFace", num_bytes, time.perf_counter() - start)
    except Exception as e:  # pragma: no cover
        print(f"HuggingFace  skipped ({e})")

    import tokengeex_tpu

    tokenizer = tokengeex_tpu.load(vocab_path)
    tokenizer.encode("warmup")
    start = time.perf_counter()
    # Full pipeline batch path: special split + processors + threaded
    # C++ Viterbi, like the reference's rayon encode_batch
    # (reference: src/tokenizer.rs:102-111).
    tokenizer.encode_batch(documents)
    report("TokenGeeX", num_bytes, time.perf_counter() - start)

    try:
        import jax

        if jax.devices()[0].platform != "cpu":
            import jax.numpy as jnp

            from tokengeex_tpu.train.estep_device import encode_corpus_device

            samples = [d.encode() for d in documents]
            encode_corpus_device(tokenizer.model, samples[:2])  # warm/compile
            start = time.perf_counter()
            encode_corpus_device(tokenizer.model, samples)
            report(f"TokenGeeX-{jax.devices()[0].platform}", num_bytes,
                   time.perf_counter() - start)
    except Exception as e:  # pragma: no cover
        print(f"TokenGeeX-device skipped ({e})")


samples = open(corpus_path, "rb").read().split(b"\0")
benchmark_batch([s.decode() for s in samples if s])
