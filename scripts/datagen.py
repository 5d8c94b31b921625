"""Build the pre-training corpus (NUL-separated .bin per language/split).

Mirrors the reference pipeline (reference: scripts/datagen.py):
  - The Stack v1.2 dedup per-language quotas with quality filters
    (size 16B-256KB, line-count caps incl. the stricter 256-line cap for
    json/yaml/toml/sql/r/hcl, avg/max line length, alphanum fraction
    >= 0.25, <= 30% digits, base64/hex/unicode-escape blob regexes,
    >= 80% Chinese-or-ASCII characters),
  - chinese-markdown set,
  - synthetic FIM "infilling" samples joined by the \\u007f sentinel.

Adds an offline `--synthetic` mode that emits a deterministic
multi-language corpus with the same file layout, for zero-egress
environments and conformance testing.
"""

import argparse
import glob
import os
import random
import re


def mb(size: float) -> int:
    return int(size * (1024**2))


BLOB_REGEXES = [
    re.compile(r"[a-zA-Z0-9+/\n=]{64,}"),
    re.compile(r"(?:\b(?:0x|\\x)?[0-9a-fA-F]{2}(?:,|\b\s*)){8,}"),
    re.compile(r"(?:\\u[0-9a-fA-F]{4}){8,}"),
]

STRICT_LINE_LANGS = {"json", "yaml", "toml", "sql", "r", "hcl"}


def has_many_non_chinese_non_ascii(content: str, p: float) -> bool:
    """reference: scripts/datagen.py:19-43."""
    total = 0
    bad = 0
    for ch in content:
        total += 1
        if "\u0000" <= ch <= "\u007f":
            continue
        if ("一" <= ch <= "鿿" or "㐀" <= ch <= "䶿"
                or "豈" <= ch <= "﫿"):
            continue
        bad += 1
    if total == 0:
        return False
    return bad / total > p


def passes_quality_filters(content: str, lang: str) -> bool:
    """The Stack quality filters (reference: scripts/datagen.py:99-147)."""
    size = len(content.encode("utf-8"))
    if size < 16 or size > mb(1) / 4:
        return False
    lines = content.split("\n")
    num_lines = len(lines)
    if lang in STRICT_LINE_LANGS:
        if num_lines > 256:
            return False
    elif num_lines > 4096:
        return False
    line_lengths = [len(line) for line in lines]
    avg_line_length = sum(line_lengths) / max(1, num_lines)
    max_line_length = max(line_lengths, default=0)
    if avg_line_length > 100 or avg_line_length < 10 or max_line_length > 1000:
        return False
    alphanum = sum(ch.isalnum() for ch in content)
    if alphanum / max(1, len(content)) < 0.25:
        return False
    if sum(ch.isdigit() for ch in content) > 0.3 * len(content):
        return False
    for regex in BLOB_REGEXES:
        matches = regex.findall(content)
        if matches and (
            any(len(m) > 256 for m in matches)
            or sum(len(m) for m in matches) / len(content) > 0.5
        ):
            return False
    if has_many_non_chinese_non_ascii(content, 0.2):
        return False
    return True


def write_quota(out_dir, lang, iterator, train, test):
    for split in ("train", "test"):
        os.makedirs(f"{out_dir}/{split}", exist_ok=True)
    files = {
        split: open(f"{out_dir}/{split}/{lang}.bin", "wb")
        for split in ("train", "test")
    }
    written = 0
    visited = 0
    for content in iterator:
        visited += 1
        if not passes_quality_filters(content, lang):
            continue
        f = files["test"] if written < test else files["train"]
        if written >= test + train:
            break
        encoded = content.encode("utf-8")
        f.write(encoded)
        f.write(b"\0")
        written += len(encoded) + 1
    for f in files.values():
        f.close()
    print(f"Wrote {written}/{train + test} for {lang} to {out_dir}. "
          f"{visited} samples visited.")


def generate_the_stack(args, lang, quota):
    """reference: scripts/datagen.py:46-168 (requires network)."""
    import datasets

    train, test = quota
    the_stack = datasets.load_dataset(
        "bigcode/the-stack-dedup", data_dir=f"data/{lang}",
        split="train", streaming=True,
    )
    write_quota(args.output, lang, (s["content"] for s in the_stack),
                train, test)


def generate_infilling(args):
    """FIM samples: shuffled chunks joined by \\u007f (DEL)
    (reference: scripts/datagen.py:213-280)."""
    train, test = (mb(float(x)) for x in args.infilling_quota.split(","))
    for split in ("train", "test"):
        os.makedirs(f"{args.output}/{split}", exist_ok=True)
    files = {
        split: open(f"{args.output}/{split}/infilling.bin", "wb")
        for split in ("train", "test")
    }
    pool = []
    for path in glob.glob(f"{args.output}/train/*.bin"):
        if path.endswith("infilling.bin"):
            continue
        content = open(path, "rb").read().decode("utf-8").split("\0")
        pool.extend(content[: len(content) // 5])

    written = 0
    rng = random.Random(0)
    while pool and written < train + test:
        content = ""
        for _ in range(4):
            if not pool:
                break
            sample = pool.pop(rng.randrange(len(pool)))
            chunk_size = max(32, min(len(sample) // 10, 128))
            chunks = [sample[i : i + chunk_size]
                      for i in range(0, len(sample), chunk_size)]
            if len(chunks) < 10:
                continue
            for _ in range(9):
                content += chunks.pop(rng.randrange(len(chunks))) + "\u007f"
            content += chunks.pop(rng.randrange(len(chunks)))
        if not content:
            continue
        f = files["test"] if written < test else files["train"]
        encoded = content.encode("utf-8")
        f.write(encoded)
        f.write(b"\0")
        written += len(encoded) + 1
    for f in files.values():
        f.close()
    print(f"Wrote infilling to {args.output}.")


# ---------------------------------------------------------------------------
# Offline synthetic corpus
# ---------------------------------------------------------------------------

_SYNTH_TEMPLATES = {
    "python": "def {f}({a}, {b}):\n    {v} = {a} + {b}\n    if {v} > 10:\n        return {v} * 2\n    return [{a} for {a} in range({v})]\n",
    "cpp": "int {f}(int {a}, int {b}) {{\n    int {v} = {a} + {b};\n    for (int i = 0; i < {v}; ++i) {{\n        {v} += compute({a}, i);\n    }}\n    return {v};\n}}\n",
    "javascript": "function {f}({a}, {b}) {{\n    const {v} = {a} + {b};\n    return items.map(({a}) => {a} * {v});\n}}\n",
    "go": "func {f}({a} int, {b} int) int {{\n    {v} := {a} + {b}\n    for i := 0; i < {v}; i++ {{\n        {v} += process({a}, i)\n    }}\n    return {v}\n}}\n",
    "java": "public int {f}(int {a}, int {b}) {{\n    int {v} = {a} + {b};\n    while ({v} < 100) {{\n        {v} = update({v}, {a});\n    }}\n    return {v};\n}}\n",
    "markdown": "# {f} guide\n\nThe {v} component handles {a} and {b} events.\n\n- configure the {a} handler\n- register the {b} callback\n",
    "chinese-markdown": "# {f} 使用指南\n\n这个模块提供了 {a} 和 {b} 的处理能力。\n\n- 配置 {a} 处理器\n- 注册 {b} 回调函数\n- 返回结果数据\n",
}

_IDENTS = ["handler", "value", "result", "index", "total", "buffer", "count",
           "stream", "record", "cursor", "offset", "window", "packet"]

_SYLLABLES = ["an", "er", "ti", "on", "ra", "lo", "de", "mi", "cu", "va",
              "be", "so", "ne", "pa", "gen", "st", "qu", "ix", "al", "tor"]


def _ident_pool(rng, size: int = 4000):
    """Zipf-weighted identifier pool: without lexical diversity a
    synthetic corpus caps the trainable vocabulary at a few hundred
    tokens (seen in round 1's bench corpus)."""
    pool = list(_IDENTS)
    seen = set(pool)
    while len(pool) < size:
        w = "".join(rng.choice(_SYLLABLES)
                    for _ in range(rng.randint(2, 4)))
        if w not in seen:
            seen.add(w)
            pool.append(w)
    weights = [1.0 / (i + 10) for i in range(size)]
    return pool, weights


def generate_synthetic(args):
    rng = random.Random(42)
    pool, weights = _ident_pool(rng)
    for lang, template in _SYNTH_TEMPLATES.items():
        def gen():
            while True:
                parts = []
                for _ in range(rng.randint(4, 20)):
                    f, a, b, v = rng.choices(pool, weights=weights, k=4)
                    parts.append(template.format(f=f + "_" + a, a=a, b=b,
                                                 v=v))
                yield "".join(parts)

        train, test = (mb(float(x)) for x in args.synthetic_quota.split(","))
        # "synth-" prefix: never collide with a real harvested/downloaded
        # language bin of the same name in a mixed corpus.
        write_quota(args.output, f"synth-{lang}", gen(), train, test)


# ---------------------------------------------------------------------------
# Offline harvest: real source code shipped inside the image
# ---------------------------------------------------------------------------

_HARVEST_LANGS = {
    ".py": "python", ".pyi": "python", ".pyx": "cython", ".pxd": "cython",
    ".h": "cpp", ".hpp": "cpp", ".cc": "cpp", ".cpp": "cpp",
    ".c": "c",
    ".js": "javascript", ".ts": "typescript",
    ".json": "json", ".yaml": "yaml", ".yml": "yaml", ".toml": "toml",
    ".md": "markdown", ".rst": "markdown",
    ".html": "html", ".css": "css", ".xml": "xml", ".svg": "xml",
    ".sh": "shell", ".txt": "text",
    ".pl": "perl", ".pm": "perl", ".tcl": "tcl", ".cmake": "cmake",
    ".proto": "protobuf", ".el": "lisp",
}

_HARVEST_ROOTS = ["/opt/venv", "/usr/lib", "/usr/share", "/usr/include",
                  "/usr/local", "/etc", os.path.expanduser("~/.cache/uv")]


def generate_harvest(args):
    """Real-code corpus without network: walk the Python environment and
    system trees for source files, bucket by language, dedup by content
    hash, shuffle deterministically, and emit the same train/test .bin
    layout (with the same Stack quality filters) as the reference's
    downloader (reference: scripts/datagen.py:46-168 + DATASET.md)."""
    import hashlib

    roots = args.harvest_roots or _HARVEST_ROOTS
    by_lang = {}
    for root in roots:
        for dirpath, _dirnames, filenames in os.walk(root):
            for f in filenames:
                lang = _HARVEST_LANGS.get(os.path.splitext(f)[1].lower())
                if lang is not None:
                    by_lang.setdefault(lang, []).append(
                        os.path.join(dirpath, f))
    train, test = (mb(float(x)) for x in args.harvest_quota.split(","))
    rng = random.Random(20260818)
    for lang in sorted(by_lang):
        paths = sorted(by_lang[lang])
        rng.shuffle(paths)
        seen = set()

        def gen():
            for path in paths:
                try:
                    with open(path, "rb") as fh:
                        raw = fh.read(mb(1))
                except OSError:
                    continue
                digest = hashlib.sha1(raw).digest()
                if digest in seen:
                    continue
                seen.add(digest)
                try:
                    yield raw.decode("utf-8")
                except UnicodeDecodeError:
                    continue

        write_quota(args.output, lang, gen(), train, test)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--the-stack-quotas", nargs="*", default=[],
        help="{lang}:{train_mb},{test_mb} quotas for The Stack",
    )
    parser.add_argument("--infilling-quota", default=None,
                        help="{train_mb},{test_mb}")
    parser.add_argument("--synthetic", action="store_true",
                        help="emit a deterministic offline corpus instead")
    parser.add_argument("--synthetic-quota", default="4,0.5",
                        help="{train_mb},{test_mb} per synthetic language")
    parser.add_argument("--harvest", action="store_true",
                        help="harvest real source files shipped in the "
                             "image (offline)")
    parser.add_argument("--harvest-quota", default="256,16",
                        help="{train_mb},{test_mb} per harvested language")
    parser.add_argument("--harvest-roots", nargs="*", default=None)
    args = parser.parse_args()

    if args.harvest:
        generate_harvest(args)
    if args.synthetic:
        generate_synthetic(args)
    for quota in args.the_stack_quotas:
        lang, sizes = quota.split(":")
        train_mb, test_mb = (float(x) for x in sizes.split(","))
        generate_the_stack(args, lang, (mb(train_mb), mb(test_mb)))
    if args.infilling_quota:
        generate_infilling(args)


if __name__ == "__main__":
    main()
