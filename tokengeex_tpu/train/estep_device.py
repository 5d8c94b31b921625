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
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..models.unigram import Model
from ..ops import lattice_jax as lj
from ..ops.match_table import TokenTable
from ..utils.packing import PackedBatch, pack_samples

log = logging.getLogger(__name__)

# Position-chunk length for the outer scan; width is padded to a multiple.
CHUNK = 512
# Target bytes per device dispatch (rows_per_group * width).
GROUP_BYTES = 1 << 23


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
    if probe is None:
        # The single-word EM probe (1 gather per table) is the default
        # on the f32 fast path; see DeviceTables docs for the accuracy
        # trade-off.
        probe = "em" if dtype == jnp.float32 else None
    hb, hl = table_hints or (None, None)
    tbl = TokenTable.build(model.vocab, min_bits=hb, min_len=hl)
    dt = lj.DeviceTables.from_table(tbl, dtype=dtype)
    L = dt.max_len
    width = _pick_width(samples, max_snippet)
    packed = pack_samples(samples, width=width, max_snippet=max_snippet)

    n_dev = len(jax.devices())
    use_mesh = n_dev > 1
    row_mult = n_dev * 128 if kernel == "pallas" else n_dev
    if use_mesh:
        mesh = pmesh.get_mesh()
        step = pmesh.sharded_e_step(dt, mesh, width=width, chunk=CHUNK,
                                    dtype=dtype, dropout=dropout,
                                    kernel=kernel, probe=probe)

    expected = np.zeros(tbl.vocab_size, dtype=np.float64)
    key = jax.random.PRNGKey(seed)

    for gi, (r0, r1) in enumerate(_row_groups(packed, width)):
        sub = _slice_packed(packed, r0, r1)
        if use_mesh or kernel == "pallas":
            sub = pmesh.pad_rows_to_multiple(sub, row_mult)
        batch = lj.prepare_batch(sub, L)
        drop_u = None
        if dropout > 0.0:
            key, sub_key = jax.random.split(key)
            drop_u = jax.random.randint(
                sub_key, (batch.p1.shape[0], batch.sid.shape[1]),
                minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32,
            )
        if use_mesh:
            args = pmesh.batch_to_arrays(batch)
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
        exp_g = lj.fold_expected(dt, exp_g)
        # Per-snippet normalizer check (reference: src/prune.rs:90-96).
        # Gather z on device: pulling all of A to host would dominate on
        # slow host links.
        if sub.spans:
            rows_idx = np.asarray([r for (r, _, _, _, _) in sub.spans])
            ends_idx = np.asarray([e for (_, _, e, _, _) in sub.spans])
            z_vals = np.asarray(A[rows_idx, ends_idx])
            bad = ~np.isfinite(z_vals)
            if bad.any():
                k = int(np.nonzero(bad)[0][0])
                si = sub.spans[k][3]
                raise ValueError(
                    f"normalization constant is not finite "
                    f"(z={z_vals[k]}, sample={si}, "
                    f"len={len(samples[si])})"
                )
        expected += exp_g
        if task is not None:
            nbytes = sum(e - s for (_, s, e, _, _) in sub.spans)
            task.record(nbytes, len({si for (_, _, _, si, _) in sub.spans}))
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
) -> List[List[int]]:
    """Viterbi-encode all samples on device; exact reference semantics
    including NoPath (reference: src/model.rs:59-129). Rows shard over
    all local devices when more than one is present. dropout > 0 samples
    segmentations by skipping multi-byte candidates with probability
    dropout (reference: src/model.rs:100).

    probe="em" is the 2x-throughput turbo mode: scores quantized to
    ~1e-3 logprob, so segmentations can differ from the reference on
    near-ties (see DeviceTables docs); default is the parity-grade
    probe."""
    import jax
    import jax.numpy as jnp

    from ..parallel import mesh as pmesh

    if dtype is None:
        dtype = jnp.float32
    kernel = kernel or _default_backend()
    hb, hl = table_hints or (None, None)
    tbl = TokenTable.build(model.vocab, min_bits=hb, min_len=hl)
    dt = lj.DeviceTables.from_table(tbl, dtype=dtype)
    L = dt.max_len
    width = _pick_width(samples, None)
    packed = pack_samples(samples, width=width, max_snippet=None)

    n_dev = len(jax.devices())
    use_mesh = n_dev > 1
    row_mult = n_dev * 128 if kernel == "pallas" else n_dev
    if use_mesh:
        mesh = pmesh.get_mesh()
        vit = pmesh.sharded_viterbi(dt, mesh, width=width, chunk=CHUNK,
                                    dtype=dtype, kernel=kernel,
                                    dropout=dropout, probe=probe)
    key = jax.random.PRNGKey(seed)

    per_span_all: List[Tuple[Tuple, Optional[List[int]]]] = []
    for r0, r1 in _row_groups(packed, width):
        sub = _slice_packed(packed, r0, r1)
        if use_mesh or kernel == "pallas":
            sub = pmesh.pad_rows_to_multiple(sub, row_mult)
        batch = lj.prepare_batch(sub, L)
        drop_u = None
        if dropout > 0.0:
            key, sub_key = jax.random.split(key)
            drop_u = jax.random.randint(
                sub_key, (batch.p1.shape[0], batch.sid.shape[1]),
                minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32,
            )
        if use_mesh:
            args = pmesh.batch_to_arrays(batch)
            if dropout > 0.0:
                args = args + (drop_u,)
            dp, best_l = vit(*args)
        else:
            dp, best_l = lj.viterbi(dt, batch, C=CHUNK, dtype=dtype,
                                    backend=kernel, drop_u=drop_u,
                                    dropout=dropout, probe=probe)
        # Fetch backpointers as int8 and only the span-end dp values —
        # the full f32 dp matrix would dominate on slow host links.
        import jax.numpy as _jnp

        best_l_host = np.asarray(best_l.astype(_jnp.int8))
        if sub.spans:
            rows_idx = np.asarray([r for (r, _, _, _, _) in sub.spans])
            ends_idx = np.asarray([e - 1 for (_, _, e, _, _) in sub.spans])
            dp_ends = np.asarray(dp[rows_idx, np.maximum(ends_idx, 0)])
        else:
            dp_ends = np.zeros(0, dtype=np.float32)
        spans = lj.backtrack(sub, dp_ends, best_l_host,
                             model.oracle.token_to_ids)
        for (r, s, e, si, ci), ids in zip(sub.spans, spans):
            per_span_all.append(((r, s, e, si, ci), ids))
        if task is not None:
            nbytes = sum(e - s for (_, s, e, _, _) in sub.spans)
            task.record(nbytes, len({si for (_, _, _, si, _) in sub.spans}))

    out: List[Optional[List[int]]] = [None] * len(samples)
    for (r, s, e, si, ci), ids in per_span_all:
        assert ci == 0, "encode packing must not chop samples"
        out[si] = ids
    # Zero-length samples produce no packed span; they encode to [].
    for si, ids in enumerate(out):
        if ids is None:
            out[si] = []
    return out  # type: ignore[return-value]


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


def count_pairs_device(model: Model, samples: Sequence[bytes], task=None):
    """Adjacent pair counts from device Viterbi encodes
    (reference: src/merge.rs:53-84)."""
    encoded = encode_corpus_device(model, samples, task)
    from collections import Counter

    counts: Counter = Counter()
    for ids in encoded:
        if ids and len(ids) > 1:
            arr = np.asarray(ids, dtype=np.int64)
            keys = arr[:-1] << 32 | arr[1:]
            uniq, cnt = np.unique(keys, return_counts=True)
            for k, c in zip(uniq.tolist(), cnt.tolist()):
                counts[(k >> 32, k & 0xFFFFFFFF)] += c
    return sorted(counts.items(), key=lambda kv: -kv[1])
