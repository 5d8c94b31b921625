"""2-process primitive validation for the multi-process session work.

Validates, with jax.distributed on CPU:
  1. module-level jit mixing a process-local (committed) table array
     with a GLOBAL row-sharded index array;
  2. jax.make_array_from_process_local_data for per-host corpus blocks;
  3. reuse of a cached global sharded array across jit calls;
  4. numpy (uncommitted) table arg in the same global call.

Run: python experiments/mp_probe.py <proc_id> <nprocs> <port>
"""

import sys

import numpy as np

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax

jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=proc_id)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

n_dev = len(jax.devices())
mesh = Mesh(np.array(jax.devices()), ("data",))
sharding = NamedSharding(mesh, P("data"))

# 2. per-host local blocks -> global array
rows_loc = 4
local = np.arange(rows_loc * 3, dtype=np.int32).reshape(rows_loc, 3) \
    + 100 * proc_id
garr = jax.make_array_from_process_local_data(
    sharding, local, (rows_loc * nprocs, 3))
print(f"[{proc_id}] global shape {garr.shape} ok", flush=True)

# 1 + 4. jit mixing local committed / numpy tables with the global array
table_dev = jnp.arange(1000, dtype=jnp.float32)  # committed local
table_np = np.arange(1000, dtype=np.float32)     # uncommitted

@jax.jit
def gather(tbl, idx):
    return jnp.take(tbl, idx, axis=0).sum()

try:
    s = jax.device_get(gather(table_dev, garr % 1000))
    print(f"[{proc_id}] committed-table mix OK: {s}", flush=True)
except Exception as e:
    print(f"[{proc_id}] committed-table mix FAILS: {type(e).__name__}: {e}",
          flush=True)

s2 = jax.device_get(gather(table_np, garr % 1000))
print(f"[{proc_id}] numpy-table mix OK: {s2}", flush=True)

# 3. cached reuse across calls (simulates the slot cache)
for i in range(3):
    s3 = jax.device_get(gather(table_np * (i + 1), garr % 1000))
print(f"[{proc_id}] cached-global reuse OK: {s3}", flush=True)

# psum through shard_map on the global array
from jax.experimental.shard_map import shard_map
import functools

f = jax.jit(shard_map(lambda x: jax.lax.psum(x.sum(), "data"),
                      mesh=mesh, in_specs=(P("data"),), out_specs=P()))
print(f"[{proc_id}] psum {jax.device_get(f(garr))}", flush=True)
print(f"[{proc_id}] ALL OK", flush=True)
