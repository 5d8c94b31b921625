"""Multi-host validation: 2 JAX processes with jax.distributed, driving
the TRAINER entry points (run_e_step_device / VocabularyPruner.prune)
directly — the pod execution model (SURVEY.md section 5 / build-plan
phase 5) run on CPU. Every process holds the global corpus, packs it
identically, and feeds only its addressable row shards; reductions
cross process boundaries exactly as they would cross DCN.

Bit-exactness: with the same total device count, the per-device row
partition matches a single-process run, so the f64 expected counts are
bit-for-bit identical (psum of two f64 partials is order-insensitive).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import numpy as np

mode = sys.argv[1]          # estep | prune
proc_id = int(sys.argv[2])  # -1 = single process
nprocs = int(sys.argv[3])
out_path = sys.argv[4]

import jax
if proc_id >= 0:
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import random
from tokengeex_tpu import Model, ScoredToken

rng = random.Random(99)
alphabet = b"abcdef "
vocab = [ScoredToken(bytes([b]), rng.uniform(-11.0, -9.0)) for b in alphabet]
seen = set(t.value for t in vocab)
while len(vocab) < 60:
    n = rng.randint(2, 6)
    w = bytes(rng.choice(alphabet) for _ in range(n))
    if w not in seen:
        seen.add(w)
        vocab.append(ScoredToken(w, rng.uniform(-9.0, -1.0)))
samples = [
    "".join(rng.choice("abcdef ") for _ in range(rng.randint(5, 120))).encode()
    for _ in range(32)
]
model = Model(vocab)

if mode == "estep":
    from tokengeex_tpu.train.estep_device import run_e_step_device

    expected = run_e_step_device(model, samples, dropout=0.0,
                                 max_snippet=128, dtype=jnp.float64)
    if proc_id <= 0:
        np.save(out_path, expected)
elif mode == "merge":
    # Pod merge through the device-cached corpus (DeviceCorpus caches
    # GLOBAL row-sharded inputs when multi-process): identical merges
    # to the single-process run.
    from tokengeex_tpu.train.merge import VocabularyMerger

    merger = VocabularyMerger(allow=".*", num_merges=6, step=3,
                              scale_factor=0.9, max_token_length=8,
                              backend="device")
    m2 = merger.merge(model, samples)
    if proc_id <= 0:
        data = [[t.value.hex(), repr(t.score), t.keep] for t in m2.vocab]
        with open(out_path, "w") as f:
            json.dump(data, f)
elif mode == "generate_sharded":
    # Pod generate: disjoint per-process shards + allreduce of the
    # document-frequency counters == single-process full-corpus feed
    # (insert_probability=1.0 makes every coin deterministic).
    from tokengeex_tpu.train.generate import VocabularyGenerator

    local = [s.decode() for s in
             (samples if proc_id < 0 else samples[proc_id::nprocs])]
    g = VocabularyGenerator(max_token_length=6, insert_probability=1.0,
                            added_tokens=["absent"], seed=0)
    g.feed(local)
    g.allreduce_frequencies()
    vocab = g.generate(300)
    if proc_id <= 0:
        data = [[t.value.hex(), t.score, t.keep] for t in vocab]
        with open(out_path, "w") as f:
            json.dump(data, f)
elif mode == "prune_sharded":
    # Per-host corpus sharding (SURVEY section 2.4): each process holds
    # ONLY its disjoint sample shard; the single-process reference run
    # holds the full corpus. f64 sessions so the only cross-run
    # difference is summation order (compared with rtol below).
    from tokengeex_tpu.train.prune import VocabularyPruner

    local = samples if proc_id < 0 else samples[proc_id::nprocs]
    pruner = VocabularyPruner(vocab_size=45, shrink_factor=0.8,
                              em_subiters=2, dropout=0.0, backend="device",
                              corpus_sharded=proc_id >= 0,
                              device_dtype=jnp.float64)
    sess_seen = []
    _orig_estep = VocabularyPruner.run_e_step
    VocabularyPruner.run_e_step = (
        lambda self, m, s: (sess_seen.append(self._session),
                            _orig_estep(self, m, s))[1])
    try:
        m2 = pruner.prune(model, local)
    finally:
        VocabularyPruner.run_e_step = _orig_estep
    assert sess_seen and sess_seen[0] is not None, \
        "device session not created"
    assert pruner._session is None, "session HBM not released after prune"
    if proc_id >= 0:
        assert sess_seen[0].local_shard, "local_shard not active"
    if proc_id <= 0:
        data = [[t.value.hex(), t.score, t.keep] for t in m2.vocab]
        with open(out_path, "w") as f:
            json.dump(data, f)
else:
    from tokengeex_tpu.train.prune import VocabularyPruner

    pruner = VocabularyPruner(vocab_size=45, shrink_factor=0.8,
                              em_subiters=2, dropout=0.0, backend="device")
    sess_seen = []
    _orig_estep = VocabularyPruner.run_e_step
    VocabularyPruner.run_e_step = (
        lambda self, m, s: (sess_seen.append(self._session),
                            _orig_estep(self, m, s))[1])
    try:
        m2 = pruner.prune(model, samples)
    finally:
        VocabularyPruner.run_e_step = _orig_estep
    # The multi-process prune must run through the slot-cached device
    # session (round-2 verdict item 4), not a per-pass fallback; the
    # session's HBM caches are released when prune returns.
    assert sess_seen and sess_seen[0] is not None, \
        "device session not created"
    assert pruner._session is None, "session HBM not released after prune"
    if proc_id <= 0:
        data = [[t.value.hex(), repr(t.score), t.keep] for t in m2.vocab]
        with open(out_path, "w") as f:
            json.dump(data, f)
print("done", proc_id, flush=True)
"""


def _run_workers(tmp_path, mode, port, n=2):
    """Launch the n-process run and the matched single-process run
    (n CPU devices total in both); return (multi_out, single_out)."""
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as f:
        f.write(WORKER.replace("{port}", str(port)))

    def env_with(devs):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs}"
        return env

    ext = "npy" if mode == "estep" else "json"
    multi_out = str(tmp_path / f"{mode}_multi.{ext}")
    single_out = str(tmp_path / f"{mode}_single.{ext}")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, mode, str(i), str(n), multi_out],
            env=env_with(1), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(n)
    ]
    procs.append(subprocess.Popen(
        [sys.executable, worker, mode, "-1", "1", single_out],
        env=env_with(n), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True))
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        assert p.returncode == 0, stdout[-3000:]
    return multi_out, single_out


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(os.environ.get("TGX_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_estep_bit_exact(tmp_path):
    multi_out, single_out = _run_workers(tmp_path, "estep", _free_port())
    expected_multi = np.load(multi_out)
    expected_single = np.load(single_out)
    # f64, same device count, same partition: bit-for-bit.
    np.testing.assert_array_equal(expected_multi, expected_single)
    assert expected_multi.sum() > 0


@pytest.mark.skipif(os.environ.get("TGX_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_prune_end_to_end(tmp_path):
    multi_out, single_out = _run_workers(tmp_path, "prune", _free_port())
    with open(multi_out) as f:
        vocab_multi = json.load(f)
    with open(single_out) as f:
        vocab_single = json.load(f)
    # Final pruned vocabulary identical: same tokens, same order, same
    # scores (repr round-trips f64 exactly), same keep flags.
    assert vocab_multi == vocab_single
    assert len(vocab_multi) <= 45 + 8  # pruned to target (+keep bytes)


@pytest.mark.skipif(os.environ.get("TGX_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_merge_device_corpus(tmp_path):
    """2-process BPE merge through the device-resident corpus cache
    equals the single-process merge exactly (pair counts are integers
    from Viterbi encodes)."""
    multi_out, single_out = _run_workers(tmp_path, "merge", _free_port())
    with open(multi_out) as f:
        vocab_multi = json.load(f)
    with open(single_out) as f:
        vocab_single = json.load(f)
    assert vocab_multi == vocab_single
    assert len(vocab_multi) == 66  # 60 + 6 merges


@pytest.mark.skipif(os.environ.get("TGX_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_sharded_generate(tmp_path):
    """Pod generate: per-process shard feed + frequency allreduce equals
    the single-process full-corpus vocabulary exactly (document
    frequencies are integers; p=1.0 removes coin randomness)."""
    multi_out, single_out = _run_workers(tmp_path, "generate_sharded",
                                         _free_port())
    with open(multi_out) as f:
        vocab_multi = json.load(f)
    with open(single_out) as f:
        vocab_single = json.load(f)
    assert vocab_multi == vocab_single
    assert any(bytes.fromhex(v[0]) == b"absent" for v in vocab_multi)


@pytest.mark.skipif(os.environ.get("TGX_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_sharded_corpus_prune(tmp_path):
    """Per-host corpus sharding: 2 processes with DISJOINT sample shards
    (no process ever materializes the full corpus) prune to the same
    vocabulary as one process holding everything. Token identity, order
    and keep flags are exact; scores differ only by f64 summation order
    across the different row partitions."""
    multi_out, single_out = _run_workers(tmp_path, "prune_sharded",
                                         _free_port())
    with open(multi_out) as f:
        vocab_multi = json.load(f)
    with open(single_out) as f:
        vocab_single = json.load(f)
    assert [v[0] for v in vocab_multi] == [v[0] for v in vocab_single]
    assert [v[2] for v in vocab_multi] == [v[2] for v in vocab_single]
    np.testing.assert_allclose([v[1] for v in vocab_multi],
                               [v[1] for v in vocab_single], rtol=1e-12)
    assert len(vocab_multi) <= 45 + 8


@pytest.mark.skipif(os.environ.get("TGX_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_four_process_estep_bit_exact(tmp_path):
    # DCN-shaped scaling: 4 processes x 1 device each vs one process
    # with 4 devices — same global partition, f64 counts bit-for-bit.
    multi_out, single_out = _run_workers(tmp_path, "estep", _free_port(),
                                         n=4)
    expected_multi = np.load(multi_out)
    expected_single = np.load(single_out)
    np.testing.assert_array_equal(expected_multi, expected_single)
    assert expected_multi.sum() > 0
