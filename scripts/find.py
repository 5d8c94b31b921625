"""Count occurrences of a string across NUL-separated corpus files.

Mirrors the reference (reference: scripts/find.py). Usage:
    python scripts/find.py <string> [glob]
"""

import glob
import sys


def count_occurrences(string: str, path: str) -> None:
    print(f"{'file':>40} | {'by occur':>10} | {'by sample':>10} | % of samples")
    total = 0
    total_by_sample = 0
    total_samples = 0
    for file in sorted(glob.glob(path)):
        data = open(file, "rb").read().split(b"\0")
        samples = [d.decode("utf-8", "replace") for d in data if d]
        occurrences = sum(s.count(string) for s in samples)
        by_sample = sum(1 for s in samples if string in s)
        total += occurrences
        total_by_sample += by_sample
        total_samples += len(samples)
        pct = (by_sample / len(samples) * 100) if samples else 0.0
        print(f"{file:>40} | {occurrences:>10} | {by_sample:>10} | {pct:.2f}%")
    pct = (total_by_sample / total_samples * 100) if total_samples else 0.0
    print(f"{'TOTAL':>40} | {total:>10} | {total_by_sample:>10} | {pct:.2f}%")


if __name__ == "__main__":
    string = sys.argv[1]
    path = sys.argv[2] if len(sys.argv) > 2 else "./hub/data/train/*.bin"
    count_occurrences(string, path)
