"""Multi-host validation: 2 JAX processes with jax.distributed, corpus
sharded per process, expected counts psum-reduced across processes.

This is the pod execution model (SURVEY.md section 5 / build-plan phase
5) run on CPU: each process owns a corpus shard and a slice of the
global mesh; the E-step's count reduction crosses process boundaries
exactly as it would cross DCN on a multi-host pod.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
out_path = sys.argv[3]

import jax
jax.distributed.initialize(
    coordinator_address="127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=proc_id,
)
assert jax.process_count() == nprocs

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tokengeex_tpu import Model, ScoredToken
from tokengeex_tpu.ops import lattice_jax as lj
from tokengeex_tpu.ops.match_table import TokenTable
from tokengeex_tpu.parallel import mesh as pmesh
from tokengeex_tpu.utils.packing import pack_samples

import random
rng = random.Random(99)
alphabet = b"abcdef "
vocab = [ScoredToken(bytes([b]), rng.uniform(-11.0, -9.0)) for b in alphabet]
seen = set(t.value for t in vocab)
while len(vocab) < 50:
    n = rng.randint(2, 6)
    w = bytes(rng.choice(alphabet) for _ in range(n))
    if w not in seen:
        seen.add(w)
        vocab.append(ScoredToken(w, rng.uniform(-9.0, -1.0)))
samples = ["".join(rng.choice("abcdef ") for _ in range(rng.randint(5, 60))).encode()
           for _ in range(32)]

tbl = TokenTable.build(vocab)
dt = lj.DeviceTables.from_table(tbl, dtype=jnp.float32)
L = dt.max_len

# Global corpus packed identically everywhere; each process feeds its
# row shard into the global mesh.
packed = pack_samples(samples, width=128, row_multiple=len(jax.devices()))
batch_host = lj.prepare_batch(packed, L)  # local arrays (per process)

mesh = Mesh(np.array(jax.devices()), ("data",))
step = pmesh.sharded_e_step(dt, mesh, width=128, chunk=64,
                            dtype=jnp.float32, kernel="xla")

def globalize(x):
    x = np.asarray(x)
    rows = x.shape[0]
    per = rows // nprocs
    local = x[proc_id * per : (proc_id + 1) * per]
    if x.ndim == 1:
        return jnp.asarray(x)  # replicated vectors
    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, local, x.shape)

args = tuple(globalize(a) for a in pmesh.batch_to_arrays(batch_host))
A, acc = step(*args)
expected = lj.fold_expected(dt, jax.device_get(acc))
if proc_id == 0:
    np.save(out_path, expected)
print("proc", proc_id, "done", flush=True)
"""


@pytest.mark.skipif(os.environ.get("TGX_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_estep(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = str(tmp_path / "worker.py")
    out = str(tmp_path / "expected.npy")
    with open(worker, "w") as f:
        f.write(WORKER.replace("{port}", str(port)))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", out],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=240)
        outputs.append(stdout)
        assert p.returncode == 0, stdout[-2000:]

    expected_multi = np.load(out)

    # Single-process reference on the same corpus/vocab.
    import random

    from tokengeex_tpu import Model, ScoredToken
    from tokengeex_tpu.train.estep_device import run_e_step_device

    rng = random.Random(99)
    alphabet = b"abcdef "
    vocab = [ScoredToken(bytes([b]), rng.uniform(-11.0, -9.0)) for b in alphabet]
    seen = set(t.value for t in vocab)
    while len(vocab) < 50:
        n = rng.randint(2, 6)
        w = bytes(rng.choice(alphabet) for _ in range(n))
        if w not in seen:
            seen.add(w)
            vocab.append(ScoredToken(w, rng.uniform(-9.0, -1.0)))
    samples = [
        "".join(rng.choice("abcdef ") for _ in range(rng.randint(5, 60))).encode()
        for _ in range(32)
    ]
    model = Model(vocab)
    expected_single = run_e_step_device(model, samples, dropout=0.0,
                                        max_snippet=128)
    np.testing.assert_allclose(expected_multi, expected_single,
                               rtol=2e-2, atol=0.05)
