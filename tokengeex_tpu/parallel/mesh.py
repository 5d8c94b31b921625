"""Multi-chip scaling: 1-D data mesh + psum-reduced corpus passes.

The reference's only parallelism is rayon data-parallelism over samples
with RwLock-merged partials (reference: src/prune.rs:65-112,
src/task.rs:134-137). The TPU-native equivalent: a 1-D
`jax.sharding.Mesh` over all chips, corpus row-groups sharded along it
with `shard_map`, the vocabulary tables replicated per chip, and dense
per-token count tensors reduced with `jax.lax.psum` over ICI. TP/PP/SP
are not applicable to this workload (no neural network; the model state
is the token table, which fits replicated in HBM; sequence scaling is
handled by the packed-window DP carry instead).

Multi-host pods: call `jax.distributed.initialize()` before using these
helpers; each process feeds its local corpus shard
(`distributed_initialize` below) and psum spans DCN automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np


def _shard_map():
    """The legacy shard_map with check_rep=False: the new jax.shard_map
    enforces varying-axis typing on scan carries (our count accumulator
    starts unvarying and becomes varying after the sharded scatter),
    which the legacy API permits."""
    import functools
    import warnings

    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.experimental.shard_map import shard_map

        return functools.partial(shard_map, check_rep=False)
    except ImportError:
        import jax

        return jax.shard_map


# Compiled sharded fns keyed by (factory, mesh identity, static
# config). The factories are called freshly by encode_corpus_device /
# run_e_step_device on EVERY pass (e.g. each merge round); a fresh
# jax.jit wrapper has an empty cache, so without this every pass
# retraces and recompiles the multi-chip program even though shapes and
# table args are stable.
_FN_CACHE: dict = {}


def _mesh_key(mesh):
    return (tuple(int(d.id) for d in mesh.devices.flat), mesh.axis_names)


def get_mesh(n_devices: Optional[int] = None, axis: str = "data"):
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def distributed_initialize(**kwargs) -> None:
    """Initialize multi-host JAX (no-op if single process)."""
    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def sharded_e_step(dt, mesh, width: int, chunk: int, dtype,
                   dropout: float = 0.0, kernel: str = "xla",
                   probe=None, with_cache: bool = False, nbins=None):
    """Build a jitted, mesh-sharded E-step over packed batch arrays.

    Returns fn(*lj.dt_call_args(dt, dtype, probe), p1, p2, sid,
    is_start, is_end, end_index, rinv1, rinv2[, score, slot]
    [, drop_u]) -> (A, acc) where the table arrays are replicated, the
    batch rows are sharded over the mesh's data axis, A is returned
    sharded (rows stay local), and the expected-count accumulator
    (slot-indexed on the fast path; see ops.lattice_jax.fold_expected)
    is psum-reduced and replicated. Tables are per-call ARGUMENTS so
    one compiled program serves every vocabulary rebind (shapes are
    pinned by TokenTable.rebind). with_cache=True consumes a
    precomputed (score, slot) match cache instead of probing; with
    dropout > 0.0 it also takes a trailing drop_u argument and masks
    the cached scores per chunk inside the scans (no full-width masked
    copy is ever materialized).
    """
    import jax
    from jax.sharding import PartitionSpec as P

    shard_map = _shard_map()

    from ..ops import lattice_jax as lj

    axis = mesh.axis_names[0]
    L = dt.max_len
    mode = probe or lj._probe_mode(dt, dtype)
    meta = lj.dt_static_meta(dt, dtype, probe)
    ck = ("e_step", _mesh_key(mesh), width, chunk, str(dtype),
          float(dropout), kernel, mode, meta, with_cache, nbins)
    if ck in _FN_CACHE:
        return _FN_CACHE[ck]

    def local_step(t1f, t2f, t1e, t2e, sc, tb, c1v, s1v, c2v, s2v,
                   p1, p2, sid, is_start, is_end, end_index, rinv1, rinv2,
                   *rest):
        rest = list(rest)
        tbl = lj._rebuild_dt(
            (t1f, t2f, t1e, t2e, sc, tb, c1v, s1v, c2v, s2v), meta)
        batch = lj.DeviceBatch(
            p1=p1, p2=p2, sid=sid, is_start=is_start, is_end=is_end,
            end_index=end_index, rinv1=rinv1, rinv2=rinv2,
            width=width, pad=L,
        )
        if with_cache:
            cache = (rest.pop(0), rest.pop(0))
            drop_u = rest.pop(0) if rest else None
        else:
            drop_u = rest.pop(0) if rest else None
            # Probe once; forward and backward share the cache.
            cache = lj.match_cache(tbl, batch, C=chunk, dtype=dtype,
                                   drop_u=drop_u, dropout=dropout,
                                   probe=mode)
        A = lj.forward(tbl, batch, C=chunk, dtype=dtype,
                       drop_u=drop_u, dropout=dropout, backend=kernel,
                       probe=mode, cache=cache)
        expected = lj.backward_expected(tbl, batch, A, C=chunk, dtype=dtype,
                                        drop_u=drop_u, dropout=dropout,
                                        backend=kernel, probe=mode,
                                        cache=cache, nbins=nbins)
        expected = jax.lax.psum(expected, axis)
        return A, expected

    base_specs = (P(),) * 10 + (P(axis), P(axis), P(axis), P(axis),
                                P(axis), P(axis), P(), P())
    in_specs = base_specs
    if with_cache:
        in_specs = in_specs + (P(axis), P(axis))
    if dropout > 0.0:
        in_specs = in_specs + (P(axis),)
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis), P()),
    )
    _FN_CACHE[ck] = jax.jit(sharded)
    return _FN_CACHE[ck]


def sharded_match_cache(dt, mesh, width: int, chunk: int, dtype,
                        probe=None):
    """fn(*lj.dt_call_args(dt, dtype, probe), batch arrays)
    -> (score, slot), both row-sharded — the dropout-free probe whose
    slot array a session caches across EM passes and prune rounds."""
    import jax
    from jax.sharding import PartitionSpec as P

    shard_map = _shard_map()

    from ..ops import lattice_jax as lj

    axis = mesh.axis_names[0]
    L = dt.max_len
    mode = probe or lj._probe_mode(dt, dtype)
    meta = lj.dt_static_meta(dt, dtype, probe)
    ck = ("match_cache", _mesh_key(mesh), width, chunk, str(dtype),
          mode, meta)
    if ck in _FN_CACHE:
        return _FN_CACHE[ck]

    def local_step(t1f, t2f, t1e, t2e, sc, tb, c1v, s1v, c2v, s2v,
                   p1, p2, sid, is_start, is_end, end_index, rinv1, rinv2):
        tbl = lj._rebuild_dt(
            (t1f, t2f, t1e, t2e, sc, tb, c1v, s1v, c2v, s2v), meta)
        batch = lj.DeviceBatch(
            p1=p1, p2=p2, sid=sid, is_start=is_start, is_end=is_end,
            end_index=end_index, rinv1=rinv1, rinv2=rinv2,
            width=width, pad=L,
        )
        return lj.match_cache(tbl, batch, C=chunk, dtype=dtype, probe=mode)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(),) * 10 + (P(axis),) * 6 + (P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    _FN_CACHE[ck] = jax.jit(sharded)
    return _FN_CACHE[ck]


def build_seg_struct_sharded(slots, nbins: int, mesh):
    """Per-shard scatter-free EM count structures for a row-sharded
    (B, L, W) slot array (VERDICT r3 item 4: the segsum fast path was
    single-device only). Each shard sorts ITS rows' (pos, len) -> slot
    hits; the compaction capacity is agreed globally (one host sync)
    so one compiled shape serves every group. Returns an
    ops.lattice_jax.SegStruct whose arrays carry a leading shard axis
    (n_shards, ...), row-sharded along the mesh — feed them to
    sharded_e_step(with_seg=True) / sharded_estep_fused as per-call
    args."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    shard_map = _shard_map()

    from ..ops import lattice_jax as lj

    axis = mesh.axis_names[0]
    n_sh = int(mesh.devices.size)
    B, L, W = slots.shape
    BW_loc = (B // n_sh) * W

    ck = ("seg_count", _mesh_key(mesh), slots.shape, nbins)
    if ck not in _FN_CACHE:
        def count_local(sl):
            # (B_loc, L, W) -> (1, L) hit counts, (1, L) occupancy
            # (distinct slots) counts
            hits = jnp.sum((sl < nbins).reshape(sl.shape[0], L, W),
                           axis=(0, 2), dtype=jnp.int32)[None, :]
            occn = []
            for l0 in range(L):
                memb = jnp.zeros((nbins,), jnp.bool_).at[
                    sl[:, l0, :].reshape(-1)].set(True, mode="drop")
                occn.append(jnp.sum(memb, dtype=jnp.int32))
            return hits, jnp.stack(occn)[None, :]

        _FN_CACHE[ck] = jax.jit(shard_map(
            count_local, mesh=mesh, in_specs=(P(axis),),
            out_specs=(P(axis), P(axis))))
    n_hit_sh, n_occ_sh = _FN_CACHE[ck](slots)  # (n_sh, L) each
    # PER-LENGTH capacities (pow2), agreed across shards (the max);
    # one shared occ capacity (pow2 of the max per-length occupancy).
    max_hits = [int(x) for x in
                jax.device_get(jnp.max(n_hit_sh, axis=0))]
    caps = tuple(min(lj.seg_cap(h), BW_loc) for h in max_hits)
    max_occ = max(1, int(jax.device_get(jnp.max(n_occ_sh))))
    OC = max(8, 1 << (max_occ - 1).bit_length())

    bk = ("seg_build", _mesh_key(mesh), slots.shape, nbins, caps, OC)
    if bk not in _FN_CACHE:
        def build_local(sl):
            perms, pres, ends, nh, occs, blks = [], [], [], [], [], []
            for l0 in range(L):
                cap = caps[l0]
                flat = sl[:, l0, :].reshape(-1)
                perm = jnp.argsort(flat).astype(jnp.int32)
                srt = jnp.take(flat, perm)
                ss = jnp.searchsorted(
                    srt, jnp.arange(nbins + 1, dtype=srt.dtype))
                present = ss[1:] > ss[:-1]
                pre = jnp.where(present & (ss[:-1] > 0), ss[:-1] - 1,
                                cap).astype(jnp.int32)
                end = jnp.where(present, ss[1:] - 1, cap).astype(jnp.int32)
                o, b, e = lj._seg_compact_one(pre, end, present,
                                              OC, cap, nbins)
                perms.append(perm[:cap][None])
                pres.append(b)
                ends.append(e)
                nh.append(ss[nbins].astype(jnp.int32))
                occs.append(o)
                blks.append(jnp.minimum(
                    srt[:cap][:: lj.SEG_BLK],
                    jnp.int32(nbins)).astype(jnp.int32)[None])
            return (tuple(perms), jnp.stack(pres)[None],
                    jnp.stack(ends)[None], jnp.stack(nh)[None],
                    jnp.stack(occs)[None], tuple(blks))

        _FN_CACHE[bk] = jax.jit(shard_map(
            build_local, mesh=mesh, in_specs=(P(axis),),
            out_specs=((P(axis),) * L, P(axis), P(axis), P(axis),
                       P(axis), (P(axis),) * L)))
    perm, pre, end, n_hit, occ_slot, blk_slot = _FN_CACHE[bk](slots)
    return lj.SegStruct(perm, pre, end, n_hit, occ_slot, blk_slot)


def seg_call_args(seg):
    """SegStruct -> the flat per-call array tuple of the seg-enabled
    factories: L perm planes, pre, end, n_hit, occ_slot, L blk
    planes."""
    return tuple(seg.perm) + (seg.pre_pos, seg.end_pos, seg.n_hit,
                              seg.occ_slot) + tuple(seg.blk_slot)


def sharded_e_step_seg(dt, mesh, width: int, chunk: int, dtype,
                       dropout: float = 0.0, kernel: str = "xla",
                       probe=None, fused: bool = False):
    """Seg-enabled sharded EM pass: forward + backward BETAS + the
    scatter-free segsum counts per shard, psum-reduced — the fast count
    path pods were missing (single-chip measured ~10%/pass over the
    fused scatter; BASELINE.md round 2).

    fn(*lj.dt_call_args(...), batch arrays[, score, slots], perm, pre,
    end, n_hit, slot_rows[, drop_u]) -> (A row-sharded, counts
    replicated). With fused=True the vocabulary probe runs inside the
    Pallas kernels (vscan tables) and the score/slots args are dropped
    from the signature entirely.
    """
    import jax
    from jax.sharding import PartitionSpec as P

    shard_map = _shard_map()

    from ..ops import lattice_jax as lj

    axis = mesh.axis_names[0]
    L = dt.max_len
    mode = probe or lj._probe_mode(dt, dtype)
    meta = lj.dt_static_meta(dt, dtype, probe)
    ck = ("e_step_seg", _mesh_key(mesh), width, chunk, str(dtype),
          float(dropout), kernel, mode, meta, fused)
    if ck in _FN_CACHE:
        return _FN_CACHE[ck]

    def local_step(t1f, t2f, t1e, t2e, sc, tb, c1v, s1v, c2v, s2v,
                   p1, p2, sid, is_start, is_end, end_index, rinv1, rinv2,
                   *rest):
        rest = list(rest)
        tbl = lj._rebuild_dt(
            (t1f, t2f, t1e, t2e, sc, tb, c1v, s1v, c2v, s2v), meta)
        batch = lj.DeviceBatch(
            p1=p1, p2=p2, sid=sid, is_start=is_start, is_end=is_end,
            end_index=end_index, rinv1=rinv1, rinv2=rinv2,
            width=width, pad=L,
        )
        score = slots = None
        if not fused:
            score, slots = rest.pop(0), rest.pop(0)
        perm = tuple(rest.pop(0)[0] for _ in range(L))
        pre, end, n_hit, occ_sl = (rest.pop(0) for _ in range(4))
        blk_sl = tuple(rest.pop(0)[0] for _ in range(L))
        slot_rows = rest.pop(0)
        seg = lj.SegStruct(perm, pre[0], end[0], n_hit[0],
                           occ_sl[0], blk_sl)
        drop_u = rest.pop(0) if rest else None
        if fused:
            A = lj.forward(tbl, batch, C=chunk, dtype=dtype,
                           drop_u=drop_u, dropout=dropout,
                           backend="fused")
            Bt = lj.backward_betas(tbl, batch, C=chunk, dtype=dtype,
                                   drop_u=drop_u, dropout=dropout,
                                   backend="fused")
        else:
            cache = (score, slots)
            A = lj.forward(tbl, batch, C=chunk, dtype=dtype,
                           drop_u=drop_u, dropout=dropout, backend=kernel,
                           probe=mode, cache=cache)
            Bt = lj.backward_betas(tbl, batch, C=chunk, dtype=dtype,
                                   drop_u=drop_u, dropout=dropout,
                                   probe=mode, cache=cache)
        expected = lj.segsum_expected(tbl, batch, A, Bt, seg, slot_rows,
                                      drop_u=drop_u, dropout=dropout,
                                      dtype=dtype)
        return A, jax.lax.psum(expected, axis)

    in_specs = (P(),) * 10 + (P(axis),) * 6 + (P(), P())
    if not fused:
        in_specs = in_specs + (P(axis), P(axis))
    in_specs = in_specs + (P(axis),) * (2 * L + 4) + (P(),)
    if dropout > 0.0:
        in_specs = in_specs + (P(axis),)
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis), P()),
    )
    _FN_CACHE[ck] = jax.jit(sharded)
    return _FN_CACHE[ck]


def sharded_viterbi(dt, mesh, width: int, chunk: int, dtype,
                    kernel: str = "xla", dropout: float = 0.0,
                    probe=None, chained: bool = False,
                    with_cache: bool = False):
    """Mesh-sharded Viterbi over packed rows: returns
    fn(*lj.dt_call_args(dt, dtype, probe), batch arrays[, mask, hist0]
    [, score, slot][, drop_u]) -> (dp, best_l), all row-sharded.
    dropout > 0 samples segmentations per chip (drop_u row-sharded like
    the batch; reference: src/model.rs:100). chained=True adds the
    long-sample carry arrays; with_cache=True consumes a precomputed
    match cache (see ops.lattice_jax._scan_forward)."""
    import jax
    from jax.sharding import PartitionSpec as P

    shard_map = _shard_map()

    from ..ops import lattice_jax as lj

    axis = mesh.axis_names[0]
    L = dt.max_len
    mode = probe or lj._probe_mode(dt, dtype)
    meta = lj.dt_static_meta(dt, dtype, probe)
    ck = ("viterbi", _mesh_key(mesh), width, chunk, str(dtype),
          float(dropout), kernel, mode, meta, chained, with_cache)
    if ck in _FN_CACHE:
        return _FN_CACHE[ck]

    def local_step(t1f, t2f, t1e, t2e, sc, tb, c1v, s1v, c2v, s2v,
                   p1, p2, sid, is_start, is_end, end_index, rinv1, rinv2,
                   *rest):
        rest = list(rest)
        tbl = lj._rebuild_dt(
            (t1f, t2f, t1e, t2e, sc, tb, c1v, s1v, c2v, s2v), meta)
        carry = None
        cache = None
        if chained:
            carry = (rest.pop(0), rest.pop(0))
        if with_cache:
            cache = (rest.pop(0), rest.pop(0))
        drop_u = rest.pop(0) if rest else None
        batch = lj.DeviceBatch(
            p1=p1, p2=p2, sid=sid, is_start=is_start, is_end=is_end,
            end_index=end_index, rinv1=rinv1, rinv2=rinv2,
            width=width, pad=L,
        )
        return lj.viterbi(tbl, batch, C=chunk, dtype=dtype, backend=kernel,
                          drop_u=drop_u, dropout=dropout, probe=mode,
                          carry=carry, cache=cache)

    in_specs = (P(),) * 10 + (P(axis),) * 6 + (P(), P())
    if chained:
        in_specs = in_specs + (P(axis), P(axis))
    if with_cache:
        in_specs = in_specs + (P(axis), P(axis))
    if dropout > 0.0:
        in_specs = in_specs + (P(axis),)
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis), P(axis)),
    )
    _FN_CACHE[ck] = jax.jit(sharded)
    return _FN_CACHE[ck]


# ---------------------------------------------------------------------------
# Multi-process (multi-host) helpers. Execution model: every process
# holds the same global corpus and packs it identically; each process
# materializes only the row shards its local devices own
# (make_array_from_callback), so host->device transfer is 1/N per host
# while the compiled program is identical everywhere. Reductions
# (psum / host allgather) cross DCN exactly as on a pod.
# ---------------------------------------------------------------------------


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def data_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(mesh.axis_names[0]))


def shard_rows(full: np.ndarray, sharding):
    """Global device array from a host array every process holds in
    full; each process materializes only its addressable shards."""
    import jax

    return jax.make_array_from_callback(
        full.shape, sharding, lambda idx: full[idx]
    )


def shard_rows_local(local_block: np.ndarray, sharding, global_shape):
    """Global row-sharded array where THIS process contributes only its
    own contiguous row block (per-host corpus sharding: no process ever
    materializes the full corpus). Requires the mesh's device order to
    be process-contiguous, which a 1-D mesh over jax.devices() is."""
    import jax

    return jax.make_array_from_process_local_data(
        sharding, local_block, global_shape)


def local_rows(garr) -> tuple:
    """(row_offset, np block) of this process's contiguous row shards of
    a global row-sharded array."""
    shards = sorted(garr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    lo = shards[0].index[0].start or 0
    blocks = []
    expect = lo
    for s in shards:
        start = s.index[0].start or 0
        assert start == expect, "non-contiguous local row shards"
        data = np.asarray(s.data)
        expect = start + data.shape[0]
        blocks.append(data)
    return lo, np.concatenate(blocks, axis=0)


def allgather_max(value: int) -> int:
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray([value], np.int64))
    return int(np.max(arr))


def allgather_sum(x: np.ndarray) -> np.ndarray:
    from jax.experimental import multihost_utils

    out = np.asarray(multihost_utils.process_allgather(np.asarray(x)))
    return out.sum(axis=0)


def allgather_flag(fail: int) -> int:
    """Coordinated failure propagation: every process must learn about a
    local error BEFORE anyone raises, or the survivors hang in the next
    collective. Returns the max across processes (-1 = no failure)."""
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray([fail], np.int64))
    return int(np.max(arr))


def allgather_fail(fail: int, value: float) -> tuple:
    """allgather_flag plus the detecting process's diagnostic payload:
    returns (max fail across processes, the value reported by the
    process holding that max) so the raising processes can show the
    actual offending number (e.g. a NaN z) instead of their local
    default."""
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(
        np.asarray([[float(fail), value]], np.float64))
    arr = np.asarray(arr).reshape(-1, 2)
    k = int(np.argmax(arr[:, 0]))
    return int(arr[k, 0]), float(arr[k, 1])


def allgather_pickled(obj) -> list:
    """Allgather arbitrary (small) host objects across processes."""
    import pickle

    from jax.experimental import multihost_utils

    blob = pickle.dumps(obj)
    n = len(blob)
    nmax = allgather_max(n)
    buf = np.zeros(nmax + 8, np.uint8)
    buf[:8] = np.frombuffer(np.int64(n).tobytes(), np.uint8)
    buf[8 : 8 + n] = np.frombuffer(blob, np.uint8)
    rows = np.asarray(multihost_utils.process_allgather(buf))
    out = []
    for row in rows.reshape(process_count(), -1):
        ln = int(np.frombuffer(row[:8].tobytes(), np.int64)[0])
        out.append(pickle.loads(row[8 : 8 + ln].tobytes()))
    return out


def batch_to_arrays(batch) -> tuple:
    """DeviceBatch -> flat array tuple for the sharded fns."""
    return (batch.p1, batch.p2, batch.sid, batch.is_start, batch.is_end,
            batch.end_index, batch.rinv1, batch.rinv2)


def pad_rows_to(packed, target: int):
    """Pad a PackedBatch with empty rows up to exactly `target` rows
    (works from zero rows, unlike the multiple-rounding variant)."""
    from ..utils.packing import PackedBatch

    rows = packed.rows
    if target == rows:
        return packed
    pad = target - rows
    return PackedBatch(
        bytes_arr=np.pad(packed.bytes_arr, ((0, pad), (0, 0))),
        sample_id=np.pad(packed.sample_id, ((0, pad), (0, 0)),
                         constant_values=-1),
        is_start=np.pad(packed.is_start, ((0, pad), (0, 0))),
        end_index=np.pad(packed.end_index, ((0, pad), (0, 0))),
        spans=packed.spans,
    )


def pad_rows_to_multiple(packed, mult: int):
    """Pad a PackedBatch's rows so they divide evenly over a mesh."""
    return pad_rows_to(packed, -(-packed.rows // mult) * mult)
