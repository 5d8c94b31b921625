"""Compare two evaluate.py output logs side by side.

The reference ships this as an empty stub (reference:
scripts/compare.py:1-9); here it prints per-language chars/token deltas.

Usage: python scripts/compare.py a.json b.json
"""

import json
import sys


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    ca, cb = a["compression"], b["compression"]
    langs = sorted(set(ca) | set(cb))
    print(f"{'lang':>20} | {'A cpt':>7} | {'B cpt':>7} | {'delta':>7}")
    for lang in langs:
        va = ca.get(lang, {}).get("chars_per_token")
        vb = cb.get(lang, {}).get("chars_per_token")
        if va is None or vb is None:
            print(f"{lang:>20} | {va or '-':>7} | {vb or '-':>7} |")
            continue
        print(f"{lang:>20} | {va:>7.2f} | {vb:>7.2f} | {vb - va:>+7.2f}")

    def avg(c):
        t = sum(v["num_tokens"] for v in c.values())
        n = sum(v["num_chars"] for v in c.values())
        return n / t if t else 0.0

    print(f"{'AVERAGE':>20} | {avg(ca):>7.2f} | {avg(cb):>7.2f} | "
          f"{avg(cb) - avg(ca):>+7.2f}")


if __name__ == "__main__":
    main()
