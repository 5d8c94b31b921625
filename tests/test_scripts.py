"""Smoke tests for the tooling scripts (datagen filters, evaluate/plot
pipeline, compare)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(*args, cwd=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["MPLBACKEND"] = "Agg"
    return subprocess.run([sys.executable, *args], capture_output=True,
                          text=True, env=env, cwd=cwd or REPO, timeout=300)


def test_datagen_synthetic(tmp_path):
    out = str(tmp_path / "hub")
    r = run_script("scripts/datagen.py", "--output", out, "--synthetic",
                   "--synthetic-quota", "0.05,0.01")
    assert r.returncode == 0, r.stderr
    train = os.listdir(os.path.join(out, "train"))
    # Synthetic sources carry a "synth-" prefix so they never collide
    # with a real harvested/downloaded .bin of the same language.
    assert "synth-python.bin" in train and "synth-chinese-markdown.bin" in train
    data = open(os.path.join(out, "train", "synth-python.bin"), "rb").read()
    samples = [s for s in data.split(b"\0") if s]
    assert samples and all(16 <= len(s) for s in samples)


def test_datagen_quality_filters():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import datagen

    ok = "def handler(a, b):\n    return a + b\n" * 20
    assert datagen.passes_quality_filters(ok, "python")
    assert not datagen.passes_quality_filters("x", "python")  # too short
    assert not datagen.passes_quality_filters("1234567890" * 10, "python")
    base64_blob = "A" * 40 + "aGVsbG8gd29ybGQ=" * 30
    assert not datagen.passes_quality_filters(base64_blob, "python")
    # > 20% non-Chinese-non-ASCII characters is rejected
    arabic = ("مرحبا مرحبا مرحبا with text\n" * 20)
    assert not datagen.passes_quality_filters(arabic, "markdown")
    # ... but a fraction below the threshold passes
    mild = ("مرحبا dummy line with text\n" * 20)
    assert datagen.passes_quality_filters(mild, "markdown")
    chinese = ("这是一个测试的行文字 abc def ghi jkl\n" * 20)
    assert datagen.passes_quality_filters(chinese, "markdown")


def test_evaluate_plot_compare(tmp_path):
    # Tiny corpus + vocab -> evaluate -> plot -> compare.
    import tokengeex_tpu as tg

    corpus = tmp_path / "python.bin"
    corpus.write_bytes(b"\x00".join([b"def f(): return x"] * 5))
    vocab = [tg.ScoredToken(bytes([b]), -10.0) for b in range(256)]
    vocab += [tg.ScoredToken(b"def ", -2.0), tg.ScoredToken(b"return", -2.0)]
    tok = tg.Tokenizer(tg.Model(vocab), [], [])
    vpath = str(tmp_path / "v.json")
    tok.save(vpath)

    log_path = str(tmp_path / "log.json")
    r = run_script("scripts/evaluate.py", "-l", "tokengeex", "-f", vpath,
                   "-i", str(tmp_path / "*.bin"), "-o", log_path)
    assert r.returncode == 0, r.stderr
    log = json.load(open(log_path))
    assert log["compression"]["python"]["chars_per_token"] > 1.0
    assert len(log["frequency_buckets"]) == 50

    r = run_script("scripts/plot.py", "-i", log_path,
                   "--cpt", str(tmp_path / "cpt.png"),
                   "--freq", str(tmp_path / "freq.png"))
    assert r.returncode == 0, r.stderr
    assert os.path.exists(tmp_path / "cpt.png")
    assert os.path.exists(tmp_path / "freq.png")

    r = run_script("scripts/compare.py", log_path, log_path)
    assert r.returncode == 0, r.stderr
    assert "AVERAGE" in r.stdout


def test_find_script(tmp_path):
    corpus = tmp_path / "python.bin"
    corpus.write_bytes(b"\x00".join([b"def f(): return x", b"no match"]))
    r = run_script("scripts/find.py", "return", str(tmp_path / "*.bin"))
    assert r.returncode == 0, r.stderr
    assert "TOTAL" in r.stdout
