"""Plot chars/token per language + token frequency distribution from an
evaluate.py output log.

Mirrors the reference (reference: scripts/plot.py): per-language bar
chart with corpus / HumanEvalX / CodeGeeX weighted averages, and a
log-scale 50-bucket frequency distribution.
"""

import argparse
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HUMANEVALX_LANGUAGES = ["go", "python", "cpp", "java", "javascript"]
CODEGEEX_LANGUAGES = [
    "jsx", "javascript", "typescript", "java", "python", "html", "cpp", "c",
]


def plot_cpt(args, data, filename):
    comp = data["compression"]
    langs = sorted(comp, key=lambda k: -comp[k]["num_chars"])
    values = [comp[k]["chars_per_token"] for k in langs]

    plt.figure(figsize=(12, 6))
    plt.bar(range(len(langs)), values, color=plt.cm.viridis(
        np.linspace(0.1, 0.9, len(langs))))
    plt.xticks(range(len(langs)), langs, rotation=45, ha="right")
    plt.ylim(top=max(7, max(values) + 0.5) if values else 7)
    plt.title(f"Character per Token Ratio by Language ({filename})")

    num_tokens = sum(comp[k]["num_tokens"] for k in comp)
    num_chars = sum(comp[k]["num_chars"] for k in comp)
    if num_tokens:
        avg = num_chars / num_tokens
        plt.axhline(y=avg, color="r", linestyle="--",
                    label=f"Average: {avg:.2f}")
    for subset, name, color in [
        (HUMANEVALX_LANGUAGES, "HumanEvalX", "green"),
        (CODEGEEX_LANGUAGES, "CodeGeeX", "blue"),
    ]:
        if all(lang in comp for lang in subset):
            st = sum(comp[k]["num_tokens"] for k in subset)
            sc = sum(comp[k]["num_chars"] for k in subset)
            plt.axhline(y=sc / st, color=color, linestyle="dotted",
                        label=f"{name} Average: {sc / st:.2f}")
    plt.legend()
    plt.tight_layout()
    plt.savefig(args.cpt, dpi=300)
    plt.close()


def plot_freq(args, data, filename):
    buckets = np.asarray(data["frequency_buckets"], dtype=np.float64)
    if buckets.sum():
        buckets = buckets / buckets.sum() * 100
    fig, ax = plt.subplots(figsize=(10, 6))
    ax.bar(range(1, len(buckets) + 1), buckets)
    ax.set_yscale("log")
    ax.set_xlabel("Sorted vocabulary bucket")
    ax.set_ylabel("% of token occurrences")
    ax.set_title(f"Token Frequency Distribution ({filename})")
    plt.tight_layout()
    plt.savefig(args.freq, dpi=300)
    plt.close()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", required=True, help="evaluate.py output JSON")
    parser.add_argument("--cpt", help="chars-per-token chart output path")
    parser.add_argument("--freq", help="frequency chart output path")
    args = parser.parse_args()

    with open(args.i) as f:
        data = json.load(f)
    filename = args.i.split("/")[-1].split(".")[0]
    if args.cpt:
        plot_cpt(args, data, filename)
    if args.freq:
        plot_freq(args, data, filename)


if __name__ == "__main__":
    main()
