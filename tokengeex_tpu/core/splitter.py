"""Special-token splitter.

Reference: src/tokenizer.rs:299-347 (SpecialTokenSplitter). Scans the
input character by character; at each position the FIRST special token
(in registration order) that matches wins. Specials match anywhere in
the string — no word-boundary requirement (see reference tests
src/tokenizer.rs:441-487, e.g. "randomstring" -> [("random", True),
("string", False)]).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple


def split_special_tokens(
    text: str, special_tokens: List[str]
) -> Iterator[Tuple[str, bool]]:
    """Yield (span, is_special) pairs covering `text` in order."""
    cursor = 0
    n = len(text)
    while cursor < n:
        rest = text[cursor:]
        emitted = False
        for i in range(len(rest)):
            suffix = rest[i:]
            for tok in special_tokens:
                if suffix.startswith(tok):
                    if i > 0:
                        yield rest[:i], False
                        cursor += i
                    else:
                        yield rest[: len(tok)], True
                        cursor += len(tok)
                    emitted = True
                    break
            if emitted:
                break
        if not emitted:
            yield rest, False
            return
