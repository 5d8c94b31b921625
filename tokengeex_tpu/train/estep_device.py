"""Device-backed corpus passes for training: EM E-step, Viterbi
frequency counts, and pair counts.

Bridges the host corpus to the packed device kernels
(ops/lattice_jax.py): samples are packed into fixed-shape
(rows x width) byte batches (utils/packing.py), processed in row groups
sized for device memory, and reduced back to host numpy. On a multi-
device mesh the row groups are sharded data-parallel and the per-token
count tensors reduced with psum (parallel/mesh.py).
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.types import NoPathError
from ..models.unigram import Model
from ..ops import lattice_jax as lj
from ..ops.match_table import TokenTable
from ..utils.packing import PackedBatch, pack_samples

log = logging.getLogger(__name__)

# Position-chunk length for the outer scan; width is padded to a multiple.
CHUNK = 512
# Target bytes per device dispatch (rows_per_group * width). Steady
# throughput is flat from 4 MB up (measured round 1: 4 MB == 8 MB per
# dispatch); 4 MB halves the peak HBM of the depth-2 streamed pipeline,
# which at 100k-vocab scale is what bounds corpus size.
GROUP_BYTES = int(os.environ.get("TGX_GROUP_BYTES", 1 << 22))
# Samples longer than this encode via chained fixed-width windows with a
# carried dp tail instead of inflating the pack width (see
# _encode_chained; reference: src/model.rs:59-129 encodes unchunked).
MAX_ENCODE_WIDTH = 1 << 15
# f32 EM snippet cap. The reference chops E-step samples at 81920 bytes
# (src/prune.rs:75) with F64 lattices; in f32 the forward/backward
# log-probs reach ~90k nats at that length and the rounding drift of
# alpha/beta/Z random-walks to ~+-0.8 nats — marginals scale by
# e^(noise), measured 3x total counts on a real 40 MB corpus slice
# (round 4). Drift_std ~ eps_f32 * (c*n) * sqrt(n/3) for per-byte cost
# c (nats): 1024 bounds it to ~1% even at c ~ 10 (an untrained
# byte-fallback-heavy vocabulary); the f64 conformance paths keep the
# reference's 81920 semantics. PARITY.md "known deviations".
DEVICE_EM_SNIPPET = int(os.environ.get("TGX_DEVICE_SNIPPET", 1024))


def _em_snippet_cap(max_snippet, dtype) -> int:
    import jax.numpy as jnp

    if dtype == jnp.float64 or max_snippet is None:
        return max_snippet
    return min(max_snippet, DEVICE_EM_SNIPPET)


def _pick_width(samples: Sequence[bytes], max_snippet: Optional[int]) -> int:
    longest = max((len(s) for s in samples), default=1)
    if max_snippet is not None:
        longest = min(longest, max_snippet)
    width = max(CHUNK, -(-longest // CHUNK) * CHUNK)
    return width


def _row_groups(packed: PackedBatch, width: int):
    rows = packed.rows
    group = max(1, GROUP_BYTES // width)
    for start in range(0, rows, group):
        yield start, min(rows, start + group)


def _padded_groups(packed: PackedBatch, width: int, pad_mult: int):
    """Row groups padded (a) to pad_mult for the mesh/pallas layouts
    and (b) the TRAILING group up to the leading groups' row count —
    a second row-count shape would otherwise compile a second
    executable for every pass variant (minutes apiece through a
    remote-compile relay)."""
    from ..parallel import mesh as pmesh

    target = None
    for gi, (r0, r1) in enumerate(_row_groups(packed, width)):
        sub = _slice_packed(packed, r0, r1)
        if pad_mult > 1:
            sub = pmesh.pad_rows_to_multiple(sub, pad_mult)
        if target is None:
            target = sub.rows
        elif sub.rows < target:
            sub = pmesh.pad_rows_to_multiple(sub, target)
        yield gi, sub


def _slice_packed(packed: PackedBatch, r0: int, r1: int) -> PackedBatch:
    spans = [
        (r - r0, s, e, si, ci) for (r, s, e, si, ci) in packed.spans
        if r0 <= r < r1
    ]
    return PackedBatch(
        bytes_arr=packed.bytes_arr[r0:r1],
        sample_id=packed.sample_id[r0:r1],
        is_start=packed.is_start[r0:r1],
        end_index=packed.end_index[r0:r1],
        spans=spans,
    )


def _default_backend() -> str:
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _eff_backend(dt, kernel: str, dtype, probe) -> str:
    """Upgrade 'pallas' to the fused-probe kernels when the table
    carries the in-VMEM vscan layout (small vocabularies; the fused
    path computes fingerprints in-kernel and probes VMEM tables —
    measured 3.1x single-chip Viterbi over the XLA bucket gather)."""
    import jax.numpy as jnp

    if (kernel == "pallas" and dtype == jnp.float32
            and probe in (None, "fast", "bucket", "em")
            and lj.has_vscan(dt)):
        return "fused"
    return kernel


def run_e_step_device(
    model: Model,
    samples: Sequence[bytes],
    dropout: float,
    max_snippet: int,
    task=None,
    dtype=None,
    seed: int = 0,
    kernel: Optional[str] = None,
    probe: Optional[str] = None,
    table_hints: Optional[Tuple[int, int]] = None,  # (min_bits, min_len)
) -> np.ndarray:
    """Expected token counts over the corpus (reference: src/prune.rs:64-120).

    Row groups are sharded over all local devices (1-D data mesh) with
    the per-token expected counts psum-reduced — the TPU-native
    equivalent of the reference's rayon + RwLock merge
    (reference: src/prune.rs:65-112).
    """
    import jax
    import jax.numpy as jnp

    from ..parallel import mesh as pmesh

    if dtype is None:
        dtype = jnp.float32
    kernel = kernel or _default_backend()
    # probe=None resolves per table: the single-probe bucket layout on
    # the f32 path (exact scores, one row gather per probe point), the
    # exact path for f64.
    hb, hl = table_hints or (None, None)
    tbl = TokenTable.build(model.vocab, min_bits=hb, min_len=hl)
    dt = lj.DeviceTables.from_table(tbl, dtype=dtype)
    L = dt.max_len
    max_snippet = _em_snippet_cap(max_snippet, dtype)
    width = _pick_width(samples, max_snippet)
    packed = pack_samples(samples, width=width, max_snippet=max_snippet)

    n_dev = len(jax.devices())
    n_proc = jax.process_count()
    use_mesh = n_dev > 1
    row_mult = n_dev * 128 if kernel == "pallas" else n_dev
    if use_mesh:
        mesh = pmesh.get_mesh()
        step = pmesh.sharded_e_step(dt, mesh, width=width, chunk=CHUNK,
                                    dtype=dtype, dropout=dropout,
                                    kernel=kernel, probe=probe)
        sharding = pmesh.data_sharding(mesh) if n_proc > 1 else None

    expected = np.zeros(tbl.vocab_size, dtype=np.float64)
    key = jax.random.PRNGKey(seed)
    acc = None
    z_checks = []  # deferred (z device array or host block, spans)

    for gi, sub in _padded_groups(
            packed, width,
            row_mult if (use_mesh or kernel == "pallas") else 1):
        if n_proc > 1:
            # Every process holds the same global packing; each feeds
            # its addressable row shards into the global program.
            batch = lj.prepare_batch_sharded(sub, L, sharding)
        else:
            batch = lj.prepare_batch(sub, L)
        drop_u = None
        if dropout > 0.0:
            key, sub_key = jax.random.split(key)
            if n_proc > 1:
                # Host RNG (identical on every process), sharded in.
                rng = np.random.default_rng([seed, gi])
                du = rng.integers(-(2**31), 2**31 - 1,
                                  (sub.rows, batch.sid.shape[1]),
                                  dtype=np.int64).astype(np.int32)
                drop_u = pmesh.shard_rows(du, sharding)
            else:
                drop_u = jax.random.randint(
                    sub_key, (batch.p1.shape[0], batch.sid.shape[1]),
                    minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32,
                )
        if use_mesh:
            args = lj.dt_call_args(dt, dtype, probe) \
                + pmesh.batch_to_arrays(batch)
            if dropout > 0.0:
                args = args + (drop_u,)
            A, exp_g = step(*args)
        else:
            # Probe once per group; forward/backward share the cache
            # unless it would not fit comfortably in HBM.
            cache = None
            cache_bytes = batch.p1.shape[0] * width * L * 8
            if cache_bytes <= (1 << 31):
                cache = lj.match_cache(dt, batch, C=CHUNK, dtype=dtype,
                                       drop_u=drop_u, dropout=dropout,
                                       probe=probe)
            A = lj.forward(dt, batch, C=CHUNK, dtype=dtype,
                           drop_u=drop_u, dropout=dropout, backend=kernel,
                           probe=probe, cache=cache)
            exp_g = lj.backward_expected(dt, batch, A, C=CHUNK, dtype=dtype,
                                         drop_u=drop_u, dropout=dropout,
                                         backend=kernel, probe=probe,
                                         cache=cache)
        # Keep counts and z-checks on device; sync every other group so
        # at most ~2 groups of intermediates are in flight (prep of the
        # next group still overlaps) — unbounded streaming OOMs.
        acc = exp_g if acc is None else acc + exp_g
        if gi % 2 == 1:
            # device_get forces real completion (block_until_ready does
            # not round-trip through the axon relay).
            jax.device_get(acc[:1])
        if n_proc > 1:
            lo, A_local = pmesh.local_rows(A)
            spans_here = [sp for sp in sub.spans
                          if lo <= sp[0] < lo + A_local.shape[0]]
            if spans_here:
                rows_idx = np.asarray([r for (r, _, _, _, _) in spans_here])
                ends_idx = np.asarray([e for (_, _, e, _, _) in spans_here])
                z_checks.append((lj.pick_span_values_device(
                    A_local, rows_idx - lo, ends_idx), spans_here))
        else:
            spans_here = sub.spans
            if spans_here:
                rows_idx = np.asarray([r for (r, _, _, _, _) in spans_here])
                ends_idx = np.asarray([e for (_, _, e, _, _) in spans_here])
                z_checks.append((lj.pick_span_values_device(
                    A, rows_idx, ends_idx), spans_here))
        if task is not None:
            nbytes = sum(e - s for (_, s, e, _, _) in spans_here)
            task.record(nbytes, len({si for (_, _, _, si, _) in spans_here}))

    if acc is not None:
        expected += lj.fold_expected(dt, np.asarray(jax.device_get(acc)))
    # Per-snippet normalizer check (reference: src/prune.rs:90-96),
    # deferred to a single sync. Multi-process: failures allgathered
    # BEFORE raising so no process hangs in a collective.
    fail_si = -1
    fail_z = 0.0
    for z_dev, spans_here in z_checks:
        z_vals = np.asarray(z_dev)[: len(spans_here)]
        bad = ~np.isfinite(z_vals)
        if bad.any():
            k = int(np.nonzero(bad)[0][0])
            fail_si = spans_here[k][3]
            fail_z = float(z_vals[k])
            break
    if n_proc > 1:
        fail_si, fail_z = pmesh.allgather_fail(fail_si, fail_z)
    if fail_si >= 0:
        raise ValueError(
            f"normalization constant is not finite "
            f"(z={fail_z}, sample={fail_si}, "
            f"len={len(samples[fail_si])})"
        )
    return expected


def encode_corpus_device(
    model: Model,
    samples: Sequence[bytes],
    task=None,
    dtype=None,
    kernel: Optional[str] = None,
    dropout: float = 0.0,
    seed: int = 0,
    table_hints: Optional[Tuple[int, int]] = None,
    probe: Optional[str] = None,
    max_width: Optional[int] = None,
    table: Optional[TokenTable] = None,
    corpus: Optional["DeviceCorpus"] = None,
    force_local: bool = False,
) -> List[List[int]]:
    """Viterbi-encode all samples on device; exact reference semantics
    including NoPath (reference: src/model.rs:59-129). Rows shard over
    all local devices when more than one is present. dropout > 0 samples
    segmentations by skipping multi-byte candidates with probability
    dropout (reference: src/model.rs:100).

    Samples up to `max_width` (default MAX_ENCODE_WIDTH) pack into rows
    sized to the longest sample; longer samples chain fixed-width
    windows with a carried dp tail (byte-exact vs the unchunked
    reference encode — the dp depends only on the last L positions).

    probe selects the match-table layout ("bucket"/"fast"/"exact");
    None resolves the default for the table/dtype. "em" survives as an
    alias of "fast" for callers of the historical quantized probe —
    since the row layout made the exact probe equally cheap, every f32
    mode now gathers exact f32 scores (near-ties can still differ from
    the f64 reference by f32 rounding alone)."""
    import jax
    import jax.numpy as jnp

    from ..parallel import mesh as pmesh

    if dtype is None:
        dtype = jnp.float32
    kernel = kernel or _default_backend()
    if table is None:
        hb, hl = table_hints or (None, None)
        table = TokenTable.build(model.vocab, min_bits=hb, min_len=hl)
    tbl = table  # caller-supplied tables (e.g. a session's rebound
    # table) skip the per-call build and keep compile shapes pinned
    dt = lj.DeviceTables.from_table(tbl, dtype=dtype)
    L = dt.max_len

    n_dev = len(jax.devices())
    n_proc = jax.process_count()
    if force_local:
        # Per-host corpus-shard callers encode DIFFERENT samples per
        # process; a global program would deadlock on mismatched
        # shapes. Run a purely process-local single-device program.
        n_dev = 1
        n_proc = 1
    use_mesh = n_dev > 1
    row_mult = n_dev * 128 if kernel == "pallas" else n_dev

    if corpus is not None and (
            corpus.samples is not samples
            or corpus.kernel != kernel
            or corpus.req_max_width != max_width
            or (corpus.sharding is not None) != (n_proc > 1)):
        # Built for different samples / layout: silently falling back
        # to a fresh pack is correct; reusing would misassign spans.
        corpus = None
    if corpus is not None:
        cap = corpus.cap
        long_idx = corpus.long_idx
        width = corpus.width
        groups = corpus.groups
    else:
        cap = max_width or MAX_ENCODE_WIDTH
        cap = max(CHUNK, -(-cap // CHUNK) * CHUNK)
        long_idx = [si for si, s in enumerate(samples) if len(s) > cap]
        short = [s if len(s) <= cap else b"" for s in samples]
        width = _pick_width(short, None)
        packed = pack_samples(short, width=width, max_snippet=None)
        groups = _padded_groups(
            packed, width,
            row_mult if (use_mesh or kernel == "pallas") else 1)
        corpus = None

    if use_mesh:
        mesh = pmesh.get_mesh()
        vit = pmesh.sharded_viterbi(dt, mesh, width=width, chunk=CHUNK,
                                    dtype=dtype, kernel=kernel,
                                    dropout=dropout, probe=probe)
        sharding = pmesh.data_sharding(mesh) if n_proc > 1 else None
    key = jax.random.PRNGKey(seed)

    per_span_all: List[Tuple[Tuple, Optional[List[int]]]] = []
    for gi, sub in groups:
        if corpus is not None:
            batch = corpus.batch(gi, sub, L)
        elif n_proc > 1:
            batch = lj.prepare_batch_sharded(sub, L, sharding)
        else:
            batch = lj.prepare_batch(sub, L)
        drop_u = None
        if dropout > 0.0:
            key, sub_key = jax.random.split(key)
            if n_proc > 1:
                rng = np.random.default_rng([seed, 7, gi])
                du = rng.integers(-(2**31), 2**31 - 1,
                                  (sub.rows, batch.sid.shape[1]),
                                  dtype=np.int64).astype(np.int32)
                drop_u = pmesh.shard_rows(du, sharding)
            else:
                drop_u = jax.random.randint(
                    sub_key, (batch.p1.shape[0], batch.sid.shape[1]),
                    minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32,
                )
        if use_mesh:
            args = lj.dt_call_args(dt, dtype, probe) \
                + pmesh.batch_to_arrays(batch)
            if dropout > 0.0:
                args = args + (drop_u,)
            dp, best_l = vit(*args)
        else:
            dp, best_l = lj.viterbi(
                dt, batch, C=CHUNK, dtype=dtype,
                backend=_eff_backend(dt, kernel, dtype, probe),
                drop_u=drop_u, dropout=dropout, probe=probe)
        # Fetch backpointers as int8 and only the span-end dp values —
        # the full f32 dp matrix would dominate on slow host links.
        import jax.numpy as _jnp

        if n_proc > 1:
            # Each process backtracks the spans its rows own; ids are
            # allgathered afterwards and failures coordinated first.
            lo, bl_local = pmesh.local_rows(best_l.astype(_jnp.int8))
            _, dp_local = pmesh.local_rows(dp)
            spans_here = [sp for sp in sub.spans
                          if lo <= sp[0] < lo + bl_local.shape[0]]
            best_l_host = np.zeros((sub.rows, width), dtype=np.int8)
            best_l_host[lo : lo + bl_local.shape[0]] = bl_local
            if spans_here:
                rows_idx = np.asarray([r for (r, _, _, _, _) in spans_here])
                ends_idx = np.asarray(
                    [e - 1 for (_, _, e, _, _) in spans_here])
                dp_ends = lj.pick_span_values(
                    dp_local, rows_idx - lo, np.maximum(ends_idx, 0))
            else:
                dp_ends = np.zeros(0, dtype=np.float32)
            view = PackedBatch(sub.bytes_arr, sub.sample_id, sub.is_start,
                               sub.end_index, spans_here)
            spans_ids = lj.backtrack(view, dp_ends, best_l_host,
                                     model.oracle.token_to_ids,
                                     raise_no_path=False,
                                     native_model=model.native())
            fail_si = -1
            for sp, ids in zip(spans_here, spans_ids):
                if ids is None:
                    fail_si = sp[3]
                    break
            fail_si = pmesh.allgather_flag(fail_si)
            if fail_si >= 0:
                n = len(samples[fail_si])
                raise NoPathError(n, n)
            gathered = pmesh.allgather_pickled(
                list(zip(spans_here, spans_ids)))
            for proc_spans in gathered:
                per_span_all.extend(proc_spans)
        else:
            spans_here = sub.spans
            best_l_host = np.asarray(best_l.astype(_jnp.int8))
            if sub.spans:
                rows_idx = np.asarray([r for (r, _, _, _, _) in sub.spans])
                ends_idx = np.asarray([e - 1 for (_, _, e, _, _) in sub.spans])
                dp_ends = lj.pick_span_values(
                    dp, rows_idx, np.maximum(ends_idx, 0))
            else:
                dp_ends = np.zeros(0, dtype=np.float32)
            spans = lj.backtrack(sub, dp_ends, best_l_host,
                                 model.oracle.token_to_ids,
                                 native_model=model.native())
            for (r, s, e, si, ci), ids in zip(sub.spans, spans):
                per_span_all.append(((r, s, e, si, ci), ids))
        if task is not None:
            nbytes = sum(e - s for (_, s, e, _, _) in spans_here)
            task.record(nbytes, len({si for (_, _, _, si, _) in spans_here}))

    out: List[Optional[List[int]]] = [None] * len(samples)
    for (r, s, e, si, ci), ids in per_span_all:
        assert ci == 0, "encode packing must not chop samples"
        out[si] = ids

    if long_idx:
        chained = _encode_chained(
            model, dt, [(si, samples[si]) for si in long_idx], cap,
            kernel=kernel, dropout=dropout, seed=seed + 0x5151,
            probe=probe, dtype=dtype, task=task,
        )
        for si, ids in zip(long_idx, chained):
            out[si] = ids

    # Zero-length samples produce no packed span; they encode to [].
    for si, ids in enumerate(out):
        if ids is None:
            out[si] = []
    return out  # type: ignore[return-value]


def _encode_chained(
    model: Model,
    dt,
    long_samples: List[Tuple[int, bytes]],
    width: int,
    kernel: str,
    dropout: float,
    seed: int,
    probe: Optional[str],
    dtype,
    task=None,
) -> List[Optional[List[int]]]:
    """Encode samples longer than the pack width by chaining fixed-width
    windows. Window k covers bytes [k*W, (k+1)*W); its device row is
    [last L bytes of window k-1 | body] with an origin-shifted hash
    stream (lj.prepare_chained_batch) so boundary-crossing tokens match,
    and the scan starts from the previous window's last L dp values
    passed through bit-exactly as the initial history. Host backtrack
    walks windows in reverse, jumping from non-positive positions into
    the previous window. Byte-exact vs the reference's unchunked encode
    (src/model.rs:59-129): the dp depends only on the last L positions.
    Windows dispatch sequentially (the dp chain is inherently serial per
    sample) but all long samples advance in parallel rows."""
    import jax
    import jax.numpy as jnp

    from ..parallel import mesh as pmesh

    L = dt.max_len
    W = width
    R = len(long_samples)
    n_dev = len(jax.devices())
    # Multi-process: every process runs the chain replicated on one
    # local device (long samples are rare; the dp chain is serial
    # anyway) — results are identical everywhere, no gather needed.
    if jax.process_count() > 1:
        n_dev = 1
    use_mesh = n_dev > 1
    row_mult = n_dev * 128 if kernel == "pallas" else n_dev
    # Bound the row batch: every chained row costs ~13 B/byte of HBM
    # transients (hash streams + match scores); an UNBOUNDED batch of
    # long samples OOMed the 1.1 GB recipe's frequency pass (round 4).
    max_rows = max(row_mult, ((4 * GROUP_BYTES) // W // row_mult)
                   * row_mult)
    if R > max_rows:
        out_parts: List[Optional[List[int]]] = []
        for g0 in range(0, R, max_rows):
            out_parts.extend(_encode_chained(
                model, dt, long_samples[g0 : g0 + max_rows], width,
                kernel=kernel, dropout=dropout, seed=seed + g0,
                probe=probe, dtype=dtype, task=task))
        return out_parts
    Rp = -(-R // row_mult) * row_mult

    nchunks = max(-(-len(s) // W) for _, s in long_samples)

    if use_mesh:
        mesh = pmesh.get_mesh()
        vit = pmesh.sharded_viterbi(dt, mesh, width=W, chunk=CHUNK,
                                    dtype=dtype, kernel=kernel,
                                    dropout=dropout, probe=probe,
                                    chained=True)
    key = jax.random.PRNGKey(seed)

    # Per sample, per window: host backpointers + end info.
    best_l_store: List[dict] = [dict() for _ in range(R)]
    end_info: List[Tuple[int, int, float]] = [(0, 0, 0.0)] * R  # (k, n, dp)

    np_dtype = np.float64 if dtype == jnp.float64 else np.float32
    carry_hist = np.full((Rp, L), lj.NEG_INF, dtype=np_dtype)
    mask = np.zeros(Rp, dtype=bool)

    for k in range(nchunks):
        rows = np.zeros((Rp, L + W), dtype=np.uint8)
        n_valid = np.zeros(Rp, dtype=np.int32)
        has_tail = np.zeros(Rp, dtype=bool)
        active = []
        for r, (si, s) in enumerate(long_samples):
            a = k * W
            if a >= len(s):
                continue
            b = min(a + W, len(s))
            if k > 0:
                rows[r, :L] = np.frombuffer(s[a - L : a], dtype=np.uint8)
                has_tail[r] = True
            rows[r, L : L + (b - a)] = np.frombuffer(s[a:b], dtype=np.uint8)
            n_valid[r] = b - a
            active.append((r, b - a))
        batch = lj.prepare_chained_batch(rows, n_valid, has_tail, L, W)

        drop_u = None
        if dropout > 0.0:
            key, sub_key = jax.random.split(key)
            drop_u = jax.random.randint(
                sub_key, (batch.p1.shape[0], batch.sid.shape[1]),
                minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32,
            )
        carry = (jnp.asarray(mask), jnp.asarray(carry_hist))
        if use_mesh:
            args = lj.dt_call_args(dt, dtype, probe) \
                + pmesh.batch_to_arrays(batch) + carry
            if dropout > 0.0:
                args = args + (drop_u,)
            dp, best_l = vit(*args)
        else:
            dp, best_l = lj.viterbi(dt, batch, C=CHUNK, dtype=dtype,
                                    backend=_eff_backend(
                                        dt, kernel, dtype, probe),
                                    drop_u=drop_u,
                                    dropout=dropout, probe=probe,
                                    carry=carry)
        best_l_host = np.asarray(best_l.astype(jnp.int8))
        # Next carry: hist0[:, j] = dp[W - j] — the reversed dp tail,
        # bit-exact (dp[:, p-1] holds dp index p).
        D_rev = np.asarray(dp[:, W - L : W])[:, ::-1]
        mask[:] = False
        carry_hist[:] = lj.NEG_INF
        for r, n in active:
            best_l_store[r][k] = best_l_host[r].copy()
            end_info[r] = (k, n, float(np.asarray(dp[r, n - 1])))
            if (k + 1) * W < len(long_samples[r][1]):
                carry_hist[r] = D_rev[r]
                mask[r] = True
        if task is not None:
            task.record(sum(n for _, n in active), 0)

    # Chained backtrack: positions <= 0 jump into the previous window.
    token_to_id = model.oracle.token_to_ids
    out: List[Optional[List[int]]] = []
    for r, (si, s) in enumerate(long_samples):
        k, n, dp_e = end_info[r]
        if not np.isfinite(dp_e):
            raise NoPathError(len(s), len(s))
        ids_rev: List[int] = []
        pos = n
        while True:
            bl = best_l_store[r][k]
            base = k * W
            while pos > 0:
                length = int(bl[pos - 1])
                a = base + pos
                ids_rev.append(token_to_id[s[a - length : a]])
                pos -= length
            if k == 0:
                break
            pos += W
            k -= 1
        ids_rev.reverse()
        out.append(ids_rev)
        if task is not None:
            task.record(0, 1)
    return out


def count_frequencies_device(model: Model, samples: Sequence[bytes],
                             task=None,
                             table_hints: Optional[Tuple[int, int]] = None,
                             ) -> np.ndarray:
    """Viterbi token frequencies (reference: src/prune.rs:205-246)."""
    encoded = encode_corpus_device(model, samples, task,
                                   table_hints=table_hints)
    freqs = np.zeros(model.vocab_size(), dtype=np.int64)
    for ids in encoded:
        if ids:
            np.add.at(freqs, np.asarray(ids, dtype=np.int64), 1)
    return freqs


class DeviceCorpus:
    """Packed corpus + device-cached compact encode inputs, reusable
    across encode passes over the same samples. The merge loop
    re-encodes the corpus after every vocabulary batch; re-packing on
    host and re-uploading (~3 B per corpus byte) costs more than the
    device pass itself on slow host links. The cached inputs are
    independent of the vocabulary/table (prepare_batch_inputs carries
    bytes + boundary flags only), so one corpus serves every model.

    Single-process only (the sharded multi-process path builds global
    arrays per pass)."""

    def __init__(self, samples: Sequence[bytes],
                 max_width: Optional[int] = None,
                 kernel: Optional[str] = None):
        import jax

        kernel = kernel or _default_backend()
        self.kernel = kernel
        self.req_max_width = max_width
        cap = max_width or MAX_ENCODE_WIDTH
        self.cap = max(CHUNK, -(-cap // CHUNK) * CHUNK)
        self.samples = samples
        self.long_idx = [si for si, s in enumerate(samples)
                         if len(s) > self.cap]
        short = [s if len(s) <= self.cap else b"" for s in samples]
        self.width = _pick_width(short, None)
        self.packed = pack_samples(short, width=self.width,
                                   max_snippet=None)
        n_dev = len(jax.devices())
        self.n_proc = jax.process_count()
        self.sharding = None
        if self.n_proc > 1:
            from ..parallel import mesh as pmesh

            # Replicated-corpus multi-process: identical global packing
            # everywhere; cache GLOBAL row-sharded inputs so a pod merge
            # loop also uploads the corpus once per process shard.
            self.sharding = pmesh.data_sharding(pmesh.get_mesh())
        row_mult = n_dev * 128 if kernel == "pallas" else n_dev
        self.pad_mult = row_mult if (n_dev > 1 or kernel == "pallas") \
            else 1
        self.groups = list(_padded_groups(self.packed, self.width,
                                          self.pad_mult))
        self._inputs: dict = {}
        # Same device-byte budget as DeviceTrainSession._batch_for:
        # ~3 B of HBM per corpus byte, so an unbounded cache OOMs a
        # merge loop over a corpus larger than HBM (ADVICE r2 low).
        self._budget = int(os.environ.get("TGX_INPUT_CACHE_BYTES",
                                          2 << 30))
        self._used = 0

    def batch(self, gi: int, sub: PackedBatch, L: int):
        if gi in self._inputs:
            gbytes, gflags = self._inputs[gi]
        else:
            if self.sharding is not None:
                gbytes, gflags = lj.sharded_inputs(sub, self.sharding)
            else:
                gbytes, gflags = lj.prepare_batch_inputs(sub)
            size = (int(np.prod(gbytes.shape))
                    + int(np.prod(gflags.shape))) // self.n_proc
            if self._used + size <= self._budget:
                self._inputs[gi] = (gbytes, gflags)
                self._used += size
        if self.sharding is not None:
            return lj.prepare_batch_from_global_inputs(gbytes, gflags, L)
        return lj.prepare_batch_from_inputs(gbytes, gflags, L)


def count_pairs_device(model: Model, samples: Sequence[bytes], task=None,
                       table_hints: Optional[Tuple[int, int]] = None,
                       corpus: Optional[DeviceCorpus] = None):
    """Adjacent pair counts from device Viterbi encodes
    (reference: src/merge.rs:53-84). table_hints (min_bits, min_len)
    pins the table shapes across the merge loop's growing vocabulary —
    without it every merge batch recompiles the whole encode pipeline."""
    encoded = encode_corpus_device(model, samples, task,
                                   table_hints=table_hints,
                                   corpus=corpus)
    # One global vectorized pair count: concatenate all id streams,
    # mask the pairs that straddle sample boundaries, unique once (a
    # per-sample Counter loop costs O(tokens) of Python dict work).
    seqs = [np.asarray(ids, dtype=np.int64)
            for ids in encoded if ids and len(ids) > 1]
    if not seqs:
        return []
    big = np.concatenate(seqs)
    ends = np.cumsum(
        np.fromiter((len(a) for a in seqs), np.int64, len(seqs)))
    keys = (big[:-1] << 32) | big[1:]
    mask = np.ones(len(big) - 1, dtype=bool)
    mask[ends[:-1] - 1] = False  # last id of a sample pairs with nothing
    uniq, cnt = np.unique(keys[mask], return_counts=True)
    order = np.argsort(-cnt, kind="stable")
    return [((int(k) >> 32, int(k) & 0xFFFFFFFF), int(c))
            for k, c in zip(uniq[order], cnt[order])]
