"""CLI end-to-end pipeline test: regex -> generate -> prune -> filter ->
merge -> encode/decode on a tiny corpus."""

import json
import os
import random
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    return subprocess.run(
        [sys.executable, "-m", "tokengeex_tpu.cli", *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus")
    rng = random.Random(5)
    words = ["def", "return", "value", "data", "print", "import"]
    samples = [
        " ".join(rng.choice(words) for _ in range(rng.randint(3, 12)))
        for _ in range(80)
    ]
    path = tmp / "train.bin"
    path.write_bytes(b"\x00".join(s.encode() for s in samples))
    return tmp, str(path)


def test_regex_command(corpus):
    tmp, _ = corpus
    out = str(tmp / "allow.regex")
    r = run_cli("regex", "-o", out, "-p", "space-lowercase-word", "-p",
                "any-char")
    assert r.returncode == 0, r.stderr
    content = open(out).read()
    assert content == "^(?: ?[a-z]+)$|^(?:.)$"


def test_regex_list():
    r = run_cli("regex")
    assert r.returncode == 0
    assert "lowercase-word" in r.stdout


def test_full_pipeline(corpus):
    tmp, train = corpus
    allow = str(tmp / "allow.regex")
    r = run_cli("regex", "-o", allow, "-p", "space-lowercase-word")
    assert r.returncode == 0, r.stderr

    # generate
    vocab0 = str(tmp / "v0.json")
    r = run_cli(
        "generate", "-v", "400", "-o", vocab0,
        "--train", f"code:{train}", "--processor", "crlf",
        "--allow", allow, "--insert-probability", "1.0",
        "--max-token-length", "8", "--special", "<|eos|>",
    )
    assert r.returncode == 0, r.stderr
    obj = json.load(open(vocab0))
    assert obj["version"] == "2.0"
    assert obj["special_tokens"] == ["<|eos|>"]
    assert len(obj["vocab"]) <= 400

    # prune
    vocab1 = str(tmp / "v1.json")
    r = run_cli(
        "prune", "-i", vocab0, "-o", vocab1, "-v", "300",
        "--train", f"code:{train}", "--dropout", "0.0",
        "--backend", "native",
    )
    assert r.returncode == 0, r.stderr
    assert len(json.load(open(vocab1))["vocab"]) <= 300

    # filter
    vocab2 = str(tmp / "v2.json")
    r = run_cli("filter", "-i", vocab1, "-o", vocab2, "-v", "290",
                "--min-score", "-13.0")
    assert r.returncode == 0, r.stderr

    # merge
    vocab3 = str(tmp / "v3.json")
    r = run_cli(
        "merge", "-i", vocab2, "-o", vocab3, "--train", f"code:{train}",
        "--allow", allow, "--num-merges", "5", "--step", "5",
        "--backend", "native",
    )
    assert r.returncode == 0, r.stderr
    n2 = len(json.load(open(vocab2))["vocab"])
    n3 = len(json.load(open(vocab3))["vocab"])
    assert n3 >= n2

    # encode/decode roundtrip via CLI
    r = run_cli("encode", "-v", vocab3, "-i", "def return value<|eos|>")
    assert r.returncode == 0, r.stderr
    ids = json.loads(r.stdout)
    assert ids
    r = run_cli("decode", "-v", vocab3, "-i", ",".join(map(str, ids)))
    assert r.returncode == 0, r.stderr
    assert r.stdout.rstrip("\n") == "def return value<|eos|>"
    # decode must also accept encode's own JSON list output verbatim.
    r = run_cli("decode", "-v", vocab3, "-i", json.dumps(ids))
    assert r.returncode == 0, r.stderr
    assert r.stdout.rstrip("\n") == "def return value<|eos|>"


def test_mine_command(corpus):
    tmp, train = corpus
    out = str(tmp / "idioms.json")
    r = run_cli("mine", "-n", "3", "-o", out, "--train", f"code:{train}",
                "-p", r"[a-z]+")
    assert r.returncode == 0, r.stderr
    idioms = json.load(open(out))
    assert len(idioms) == 3
