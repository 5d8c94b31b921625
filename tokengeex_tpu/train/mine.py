"""Idiom miner: top-N frequent regex matches from a corpus.

Reference: src/mine.rs. Counts every match of `pattern` across all
samples and returns the num_idioms most frequent matched strings.
"""

from __future__ import annotations

import dataclasses
import re
from collections import Counter
from typing import List, Sequence, Tuple

from .patterns import rust_to_python


@dataclasses.dataclass
class IdiomMiner:
    """reference: src/mine.rs:8-19."""

    num_idioms: int
    pattern: str  # rust-syntax regex

    def mine(self, samples: Sequence[str]) -> List[Tuple[str, int]]:
        """reference: src/mine.rs:21-48 (rayon find_iter + DashMap).

        Default path: the threaded C++ scanner over the pattern's
        byte-DFA (utils/nativelib.mine_counts) — non-overlapping
        leftmost-longest matches, counted natively so corpus-scale
        mining never touches per-match Python objects. Falls back to
        the serial re.finditer loop when the pattern needs lookarounds
        (not DFA-able) or the native library is unavailable."""
        native = self._mine_native(samples)
        if native is not None:
            return native
        regex = re.compile(rust_to_python(self.pattern))
        frequencies: Counter = Counter()
        for sample in samples:
            for m in regex.finditer(sample):
                frequencies[m.group(0)] += 1
        return frequencies.most_common(self.num_idioms)

    def _mine_native(self, samples: Sequence[str]):
        try:
            from ..core.redfa import compile_dfa
            from ..utils import nativelib

            if nativelib.get_lib() is None:
                return None
            dfa = compile_dfa(self.pattern)
        except Exception:
            return None
        counts = nativelib.mine_counts(
            [s.encode("utf-8") for s in samples], dfa)
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return top[: self.num_idioms]
