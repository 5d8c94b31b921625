"""Device training session: probe the corpus once, train many passes.

The vocabulary probe (row gathers against the cuckoo tables) dominates
every corpus pass. During pruning the vocabulary only SHRINKS and gets
rescored (reference: src/prune.rs:23-57), so with a stable-slot table
(ops.match_table.TokenTable.rebind) the (pos, len) -> slot matching of
the whole corpus never changes across EM sub-iterations, the Viterbi
frequency pass, and prune rounds. This session:

  - builds the token table ONCE from the initial vocabulary and rebinds
    ids/scores per model (slots never move);
  - probes each row group ONCE (dropout-free) and caches the slot
    arrays in device memory under a budget (TGX_SLOT_CACHE_BYTES,
    default 4 GiB);
  - later passes re-gather only the current score per cached slot (one
    row gather per probe point instead of a full two-table probe) and
    apply fresh dropout masks per pass.

The reference rebuilds its trie + lattices from scratch every pass;
probing once per session is the single biggest device-throughput lever
for the flagship prune loop.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.types import NoPathError
from ..models.unigram import Model
from ..ops import lattice_jax as lj
from ..ops.match_table import TokenTable
from ..utils.packing import pack_samples

log = logging.getLogger(__name__)


class DeviceTrainSession:
    def __init__(self, model: Model, samples: Sequence[bytes],
                 max_snippet: int, kernel: Optional[str] = None,
                 dtype=None, probe: Optional[str] = None,
                 cache_budget: Optional[int] = None,
                 local_shard: bool = False):
        """`samples` is the global corpus (every process holds it and
        feeds only its addressable row shards), or, with
        local_shard=True under multi-process JAX, THIS process's corpus
        shard only — per-host corpus sharding (SURVEY section 2.4): each
        process packs and uploads only its own samples, contributing a
        contiguous row block of every global dispatch group."""
        import jax
        import jax.numpy as jnp

        from ..parallel import mesh as pmesh
        from . import estep_device as ed

        self.samples = samples
        self.dtype = dtype or jnp.float32
        # f32 EM snippet cap (see estep_device.DEVICE_EM_SNIPPET):
        # 81920-byte snippets are numerically unsound in f32.
        self.max_snippet = ed._em_snippet_cap(max_snippet, self.dtype)
        self.kernel = kernel or ed._default_backend()
        self.probe = probe
        self.chunk = ed.CHUNK
        self.base_tbl = TokenTable.build(model.vocab)
        self.L = self.base_tbl.max_token_len
        # Dense rank space (lattice_jax.RankSpace): cached slot arrays
        # are remapped once per group from the sparse bucket slot space
        # (~16x vocab) to [0, n_occupied) so every later pass's score
        # regather reads a vocabulary-sized table and count bins stay
        # vocabulary-sized — at a 32k vocab that is 256 KB instead of
        # 4 MB (small-table gather rates, BASELINE.md round 2), the
        # difference between ~8 and ~13+ MB/s per EM pass.
        self.use_rank = (self.dtype != jnp.float64
                         and os.environ.get("TGX_RANK", "1") != "0"
                         and self.base_tbl.bk is not None)
        self.rank = lj.build_rank_space(self.base_tbl) \
            if self.use_rank else None
        self._lut_dev = None
        self.n_proc = jax.process_count()
        self.proc = jax.process_index()
        self.local_shard = bool(local_shard) and self.n_proc > 1
        if self.local_shard:
            # The pack width is a compile-shape: agree on the max
            # across the disjoint per-process shards.
            self.width = pmesh.allgather_max(
                ed._pick_width(samples, self.max_snippet))
        else:
            self.width = ed._pick_width(samples, self.max_snippet)
        # Pack WIDE even when snippets are short: every kernel in this
        # file was tuned and bench-validated at W=8192 row shapes
        # (BASELINE.md rounds 2-5); the narrow W=1024 pack the f32
        # snippet cap would produce runs the same corpus 5-7x slower
        # per E-step (measured at the 1 GB-recipe shapes, round 5:
        # 1.7 vs 11.4 MB/s dropout-free) and compiled a 16 GB regather
        # temp. Multiple snippets pack per row (pack_samples best-fit),
        # so the floor costs nothing but row-boundary padding; applied
        # only when the corpus actually fills such rows.
        target = int(os.environ.get("TGX_PACK_WIDTH", 8192))
        if target > self.width:
            nbytes = sum(len(s) for s in samples)
            if self.local_shard:
                nbytes = pmesh.allgather_max(nbytes)
            if nbytes >= target * 128:
                self.width = target
        self.packed = pack_samples(samples, width=self.width,
                                   max_snippet=self.max_snippet)
        self.n_dev = len(jax.devices())
        self.use_mesh = self.n_dev > 1
        self.sharding = None
        if self.n_proc > 1:
            self.mesh = pmesh.get_mesh()
            self.sharding = pmesh.data_sharding(self.mesh)
        self.row_mult = self.n_dev * 128 if self.kernel == "pallas" \
            else self.n_dev
        if cache_budget is None:
            # ~half of a v5e's 16 GB HBM: a 100 MB corpus at L=15 needs
            # ~6.2 GB of slot arrays to cache every group (4 GiB left
            # 40% of groups re-probing each pass); transient per-group
            # buffers stay under ~1.5 GB on top.
            cache_budget = int(os.environ.get(
                "TGX_SLOT_CACHE_BYTES", 6 << 30))
        self.cache_budget = cache_budget
        # Device frequency counts: padded id space pinned to the
        # session's INITIAL vocabulary so shrinking prune rounds reuse
        # one compiled executable (lj.viterbi_freq).
        self._vpad = -(-max(1, self.base_tbl.vocab_size) // 4096) * 4096
        self.cache_used = 0
        self.slot_cache: Dict[int, object] = {}
        # Scatter-free EM count structures (ops.lattice_jax.SegStruct),
        # one per slot-cached group; shares the slot-cache budget.
        self.seg_cache: Dict[int, object] = {}
        self.use_segsum = os.environ.get("TGX_SEGSUM", "1") != "0"
        # Compact batch inputs (~3 B per corpus byte) cached on device:
        # host->device corpus transfer happens once per session.
        self.input_cache: Dict[int, tuple] = {}
        self.input_budget = int(os.environ.get(
            "TGX_INPUT_CACHE_BYTES", 4 << 30))
        self.input_used = 0
        self._model: Optional[Model] = None
        self._estep_calls = 0
        self._fns: Dict[str, object] = {}
        self._rebind(model)
        # The session's count structures (slot_rows, SegStruct bins,
        # backward accumulators) are all sized for the probe mode the
        # table resolves by default; a different per-probe slot space
        # would silently misattribute EM counts.
        default_mode = lj._probe_mode(self.dt, self.dtype)
        requested = {"em": "fast"}.get(self.probe, self.probe)
        if requested is not None and requested != default_mode:
            raise ValueError(
                f"DeviceTrainSession count structures are sized for the "
                f"'{default_mode}' probe this table/dtype resolves to; "
                f"probe={self.probe!r} would use a different slot space. "
                f"Pass probe=None (per-probe overrides are supported by "
                f"encode_corpus_device only).")

    def close(self) -> None:
        """Release the session's device memory. The slot/seg/input
        caches hold up to their budgets (8 GiB default) of HBM for the
        whole prune loop; dropping the references here lets the backend
        free them for the NEXT stage — a 100 MB-corpus pipeline OOMed
        in merge's encode precisely because the prune session's caches
        were still resident. The session is unusable afterwards."""
        self.slot_cache.clear()
        self.seg_cache.clear()
        self.input_cache.clear()
        self._fns.clear()
        self.dt = None
        self.tbl = None
        self.slot_rows = None
        self._lut_dev = None
        self._model = None
        self.cache_used = 0
        self.input_used = 0

    # -- Model binding ------------------------------------------------------

    def _rebind(self, model: Model) -> None:
        if model is self._model:
            return
        tbl = self.base_tbl.rebind(model.vocab)
        self.tbl = tbl
        self.dt = lj.DeviceTables.from_table(tbl, self.dtype)
        if self.use_rank:
            # Rank-indexed score rows + the current rank -> id map
            # (both per-binding; the rank space itself is session-fixed).
            self.slot_rows = lj.rank_score_rows(self.rank, tbl)
            self.rank_ids = lj.rank_to_ids(self.rank, tbl)
        else:
            self.slot_rows = lj.slot_score_rows(self.dt)
        if getattr(self, "n_proc", 1) > 1:
            # Host numpy (uncommitted -> replicated): a committed
            # single-device array cannot mix with the global sharded
            # slot arrays in the cached-score regather.
            self.slot_rows = np.asarray(self.slot_rows)
        elif self.use_rank:
            import jax.numpy as _jnp

            self.slot_rows = _jnp.asarray(self.slot_rows)
        self._model = model
        # The mesh-sharded fns take the table arrays as per-call args
        # (lj.dt_call_args), so f32 rebinds reuse them as-is; only the
        # exact (f64) mode keys on the real vocab size and must rebuild.
        import jax.numpy as jnp

        if self.dtype == jnp.float64:
            self._fns.clear()

    def _dt_call(self):
        return lj.dt_call_args(self.dt, self.dtype, self.probe)

    def _nbins(self) -> int:
        """Count-bin space of this session's cached aux arrays: the
        dense rank space when enabled, else the raw probe slot space."""
        if self.use_rank:
            return self.rank.n_pad
        return lj.seg_nbins(self.dt, self.dtype)

    def _rank_lut(self):
        """slot -> rank lut in the layout the remap call needs:
        device-resident for single-process runs, host numpy
        (uncommitted -> replicated) under a multi-process mesh."""
        if self.n_proc > 1:
            return self.rank.lut
        if self._lut_dev is None:
            import jax.numpy as jnp

            self._lut_dev = jnp.asarray(self.rank.lut)
        return self._lut_dev

    def _remap(self, slots):
        """Sparse probe slots -> dense ranks (once per session-cached
        group; all downstream consumers — score regathers, SegStructs,
        count accumulators — live in rank space)."""
        if not self.use_rank:
            return slots
        return lj.remap_slots(self._rank_lut(), slots)

    def _fold(self, acc) -> np.ndarray:
        """Count accumulator -> per-token expected counts (V,)."""
        if acc is None:
            return np.zeros(self.dt.vocab_size, dtype=np.float64)
        if self.use_rank:
            return lj.fold_expected_rank(np.asarray(acc), self.rank_ids,
                                         self.dt.vocab_size)
        return lj.fold_expected(self.dt, acc)

    def _mesh_fns(self, dropout: float = 0.0):
        import jax  # noqa: F401

        from ..parallel import mesh as pmesh

        if "mesh" not in self._fns:
            mesh = self.mesh if self.sharding is not None \
                else pmesh.get_mesh()
            self._fns["mesh"] = mesh
            self._fns["probe"] = pmesh.sharded_match_cache(
                self.dt, mesh, width=self.width, chunk=self.chunk,
                dtype=self.dtype, probe=self.probe)
            self._fns["viterbi"] = pmesh.sharded_viterbi(
                self.dt, mesh, width=self.width, chunk=self.chunk,
                dtype=self.dtype, kernel=self.kernel, with_cache=True)
        # The e-step closure bakes the dropout probability (the mask
        # threshold is a compile-time constant); one jitted fn per
        # distinct dropout value used with this binding.
        ekey = f"estep:{dropout}"
        if ekey not in self._fns:
            self._fns[ekey] = pmesh.sharded_e_step(
                self.dt, self._fns["mesh"], width=self.width,
                chunk=self.chunk, dtype=self.dtype, kernel=self.kernel,
                dropout=dropout, with_cache=True,
                nbins=self._nbins() if self.use_rank else None)
        self._fns["estep"] = self._fns[ekey]
        return self._fns

    # -- Group machinery ----------------------------------------------------

    def _groups(self):
        # Materialized once: re-slicing the span list per group per
        # pass is O(groups x spans) of Python per E-step at corpus
        # scale. The padded subs are deterministic for the session.
        if getattr(self, "_group_list", None) is None:
            from . import estep_device as ed

            if self.local_shard:
                self._group_list = self._local_group_list()
            else:
                self._group_list = list(ed._padded_groups(
                    self.packed, self.width,
                    self.row_mult
                    if (self.use_mesh or self.kernel == "pallas") else 1))
            self._span_idx: Dict[int, tuple] = {}
        return self._group_list

    def _local_group_list(self):
        """Per-host corpus sharding: split THIS process's local packing
        into groups of exactly `r_loc` rows (padded), with the group
        COUNT agreed across processes, so group gi's global batch is the
        concatenation of every process's gi-th local block."""
        import jax

        from ..parallel import mesh as pmesh
        from . import estep_device as ed

        loc_dev = jax.local_device_count()
        mult = loc_dev * 128 if self.kernel == "pallas" else loc_dev
        g_rows_global = max(1, ed.GROUP_BYTES // self.width)
        r_loc = max(1, g_rows_global // self.n_proc)
        r_loc = -(-r_loc // mult) * mult
        rows = self.packed.rows
        n_groups = max(1, pmesh.allgather_max(-(-rows // r_loc)))
        self._r_loc = r_loc
        self._r_glob = r_loc * self.n_proc
        out = []
        for gi in range(n_groups):
            sub = ed._slice_packed(self.packed, min(gi * r_loc, rows),
                                   min((gi + 1) * r_loc, rows))
            out.append((gi, pmesh.pad_rows_to(sub, r_loc)))
        return out

    def _local_row_range(self, nrows_global: int):
        """(lo, n) of this process's contiguous global row block — row
        shards follow device order, which is process-contiguous for a
        1-D mesh over jax.devices()."""
        n = nrows_global // self.n_proc
        return self.proc * n, n

    def _span_arrays(self, gi: int, sub, cache=None, long_set=None):
        """Cached per-group span bookkeeping: z-check indices, byte and
        sample tallies, and the short-sample ("whole") subset used by
        the frequency pass — all O(spans) Python work that would
        otherwise repeat every pass.

        Multi-process: restricted to THIS process's rows, with row
        indices relative to its local block (the device results are
        only fetched shard-locally; under local_shard every span is
        local by construction)."""
        if not hasattr(self, "_long_set"):
            # Once per session, NOT per group: a full corpus scan
            # per group is O(groups x samples).
            self._long_set = {si for si, s in enumerate(self.samples)
                              if len(s) > self.max_snippet}
        if cache is None:
            cache = self._span_idx
        if long_set is None:
            long_set = self._long_set
        if gi not in cache:
            if self.n_proc > 1 and not self.local_shard:
                lo, n = self._local_row_range(sub.rows)
                spans = [(r - lo, s, e, si, ci)
                         for (r, s, e, si, ci) in sub.spans
                         if lo <= r < lo + n]
            else:
                spans = sub.spans
            rows_idx = np.asarray([r for (r, _, _, _, _) in spans])
            ends_idx = np.asarray([e for (_, _, e, _, _) in spans])
            whole = [sp for sp in spans if sp[3] not in long_set]
            countable = [sp for sp in spans
                         if sp[3] not in long_set and sp[2] > sp[1]]
            cache[gi] = {
                "count_ends": (
                    np.asarray([r for (r, _, _, _, _) in countable],
                               dtype=np.int32),
                    np.asarray([e for (_, _, e, _, _) in countable],
                               dtype=np.int32),
                ),
                "spans": spans,
                "z": (rows_idx, ends_idx),
                "nbytes": sum(e - s for (_, s, e, _, _) in spans),
                "nsamples": len({si for (_, _, _, si, _) in spans}),
                "whole": whole,
                "whole_rows": np.asarray([r for (r, _, _, _, _) in whole]),
                "whole_ends": np.asarray(
                    [max(e - 1, 0) for (_, _, e, _, _) in whole]),
            }
        return cache[gi]

    def _freq_groups(self):
        """Row groups for the DEVICE frequency pass, packed at the
        ENCODE width (MAX_ENCODE_WIDTH) rather than the f32 EM snippet
        cap: Viterbi is max-plus (near-tie flips only, no marginal
        drift), so whole samples up to 32 KiB count in-graph and only
        genuinely long ones take the chained re-encode — with the EM
        packing the "long" set was most of a real corpus and the
        chained batch OOMed (round 4)."""
        from . import estep_device as ed

        if getattr(self, "_freq_group_list", None) is None:
            longest = max((len(s) for s in self.samples), default=1)
            if longest <= self.max_snippet:
                # EM packing already holds every sample whole.
                self._freq_group_list = self._groups()
                self._freq_cap = self.max_snippet
                self._freq_span_idx = self._span_idx
                self._freq_long = self._long_set if hasattr(
                    self, "_long_set") else set()
                self._freq_shared = True
                return self._freq_group_list
            cap = ed.MAX_ENCODE_WIDTH
            width = ed._pick_width(self.samples, cap)
            packed = pack_samples(self.samples, width=width,
                                  max_snippet=cap)
            self._freq_group_list = list(ed._padded_groups(
                packed, width,
                self.row_mult if self.kernel == "pallas" else 1))
            self._freq_cap = cap
            self._freq_span_idx = {}
            self._freq_long = {si for si, s in enumerate(self.samples)
                               if len(s) > cap}
            self._freq_shared = False
        return self._freq_group_list

    def _freq_info(self, gi: int, sub):
        if getattr(self, "_freq_shared", False):
            return self._span_arrays(gi, sub)
        return self._span_arrays(gi, sub, cache=self._freq_span_idx,
                                 long_set=self._freq_long)

    def _freq_batch(self, gi: int, sub):
        """Like _batch_for but under distinct input-cache keys (the
        freq packing differs from the EM packing)."""
        if getattr(self, "_freq_shared", False):
            return self._batch_for(gi, sub)
        key = ("freq", gi)
        if key in self.input_cache:
            gbytes, gflags = self.input_cache[key]
        else:
            gbytes, gflags = lj.prepare_batch_inputs(sub)
            size = (int(np.prod(gbytes.shape))
                    + int(np.prod(gflags.shape)))
            if self.input_used + size <= self.input_budget:
                self.input_cache[key] = (gbytes, gflags)
                self.input_used += size
        return lj.prepare_batch_from_inputs(gbytes, gflags, self.L)

    def _countable_ends(self, gi: int, batch, info):
        """(B, W+1) bool with True ONLY at the ends of this group's
        whole non-empty spans: long samples re-encode via the exact
        chained path (add_long), empty spans contribute nothing, and
        padding rows never open a backpointer walk."""
        import jax.numpy as jnp

        r, e = info["count_ends"]
        n = len(r)
        B, Wp1 = batch.is_end.shape
        zeros = jnp.zeros((B, Wp1), bool)
        if n == 0:
            return zeros
        # Pow2-padded scatter indices so the group-varying span count
        # never re-keys the jit; pads target (0, 0), whose dp index is
        # never visited by the descending walk (it starts at q = 1).
        m = 1024
        while m < n:
            m *= 2
        ri = np.zeros(m, np.int32)
        ei = np.zeros(m, np.int32)
        vals = np.zeros(m, bool)
        ri[:n] = r
        ei[:n] = e
        vals[:n] = True
        return zeros.at[jnp.asarray(ri), jnp.asarray(ei)].max(
            jnp.asarray(vals))

    def _batch_for(self, gi: int, sub):
        if gi in self.input_cache:
            gbytes, gflags = self.input_cache[gi]
        else:
            if self.local_shard:
                gbytes, gflags = lj.sharded_inputs_local(
                    sub, self.sharding, self._r_glob)
            elif self.n_proc > 1:
                gbytes, gflags = lj.sharded_inputs(sub, self.sharding)
            else:
                gbytes, gflags = lj.prepare_batch_inputs(sub)
            # Budget accounting uses this process's resident share.
            size = (int(np.prod(gbytes.shape))
                    + int(np.prod(gflags.shape))) // self.n_proc
            if self.input_used + size <= self.input_budget:
                self.input_cache[gi] = (gbytes, gflags)
                self.input_used += size
        if self.n_proc > 1:
            return lj.prepare_batch_from_global_inputs(gbytes, gflags,
                                                       self.L)
        return lj.prepare_batch_from_inputs(gbytes, gflags, self.L)

    def _probe_group(self, gi: int, batch):
        """(score, slot) for a group: cached slots + fresh score gather,
        or a full dropout-free probe (cached under budget)."""
        import jax.numpy as jnp

        if gi in self.slot_cache:
            slots = self.slot_cache[gi]
            score = lj.score_from_slots(self.slot_rows, slots, self.dtype)
            return score, slots
        if self.dtype == jnp.float64:
            # Exact (f64) mode caches ids, which change on every rebind
            # — probe fresh each pass (conformance mode only).
            if self.use_mesh:
                from ..parallel import mesh as pmesh

                fns = self._mesh_fns()
                return fns["probe"](*(self._dt_call()
                                      + pmesh.batch_to_arrays(batch)))
            return lj.match_cache(self.dt, batch, C=self.chunk,
                                  dtype=self.dtype, probe=self.probe)
        if self.use_mesh:
            from ..parallel import mesh as pmesh

            fns = self._mesh_fns()
            score, slots = fns["probe"](
                *(self._dt_call() + pmesh.batch_to_arrays(batch)))
        else:
            score, slots = lj.match_cache(self.dt, batch, C=self.chunk,
                                          dtype=self.dtype,
                                          probe=self.probe)
        slots = self._remap(slots)
        size = int(np.prod(slots.shape)) * 4
        if self.cache_used + size <= self.cache_budget:
            self.slot_cache[gi] = slots
            self.cache_used += size
        return score, slots

    def _vscan_ok(self) -> bool:
        """Whether the in-VMEM fused-probe kernels apply to this
        session's binding (small vocabulary; see lattice_jax.has_vscan)."""
        import jax.numpy as jnp

        return (self.kernel == "pallas"
                and self.dtype == jnp.float32
                and self.probe in (None, "fast", "bucket", "em")
                and lj.has_vscan(self.dt))

    def _fused(self) -> bool:
        """Single-device fused routing (mesh runs route through the
        sharded seg/fused factories in e_step instead)."""
        return self._vscan_ok() and not self.use_mesh

    def _fused_seg(self, gi: int, batch):
        """SegStruct for the fused E-step (probing the group once to
        build it, cached for the session); None when over budget."""
        if gi in self.seg_cache:
            return self.seg_cache[gi]
        _score, slots = self._probe_group(gi, batch)
        if gi not in self.slot_cache:
            # Slots fell out of budget: segsum would be rebuilt every
            # pass; let the caller fall through to the probing path.
            return None
        seg = self._seg_for(gi, slots)
        if seg is not None:
            # The fused kernels re-probe in-kernel; once the seg
            # structure exists the slot array has no further reader —
            # release its HBM (VERDICT r3: seg memory is the session's
            # footprint wall).
            del self.slot_cache[gi]
            self.cache_used -= int(np.prod(slots.shape)) * 4
        return seg

    def _seg_for(self, gi: int, slots):
        """SegStruct for a slot-cached group (built once, reused by
        every E-step pass; slots are static across rebinds). Mesh runs
        build PER-SHARD structures (parallel/mesh.py
        build_seg_struct_sharded) threaded into the sharded fns as
        per-call args, so pods get the scatter-free count path too
        (round-3 VERDICT item 4)."""
        import jax.numpy as jnp

        from ..parallel import mesh as pmesh

        if gi in self.seg_cache:
            return self.seg_cache[gi]
        if (not self.use_segsum
                or self.dtype == jnp.float64
                or gi not in self.slot_cache):
            return None
        B, L, W = slots.shape
        nbins = self._nbins()
        # Optimistic pre-check (compaction typically shrinks the hit
        # lists >= 4x); the ACTUAL size gates caching after the build.
        est = lj.SegStruct.est_bytes(B, L, W) // 4 // self.n_proc
        if self.cache_used + est > self.cache_budget:
            return None
        if self.use_mesh:
            seg = pmesh.build_seg_struct_sharded(
                slots, nbins, self._fns.get("mesh") or self._mesh_fns()["mesh"])
        else:
            seg = lj.build_seg_struct(slots, nbins)
        if self.cache_used + seg.nbytes() // self.n_proc > self.cache_budget:
            # Memoize the failure: rebuilding (L device argsorts + a
            # host sync) and re-discarding every pass would be pure
            # waste. seg_cache[gi] = None short-circuits future calls.
            self.seg_cache[gi] = None
            return None
        self.seg_cache[gi] = seg
        self.cache_used += seg.nbytes() // self.n_proc
        return seg

    # -- Passes -------------------------------------------------------------

    def e_step(self, model: Model, dropout: float, seed: int,
               task=None) -> np.ndarray:
        """Expected token counts (reference: src/prune.rs:64-120),
        reusing cached slots across calls."""
        import jax
        import jax.numpy as jnp

        from ..parallel import mesh as pmesh

        self._rebind(model)
        key = jax.random.PRNGKey(seed)
        acc = None
        z_checks = []  # (device z array or host values, spans)
        for gi, sub in self._groups():
            batch = self._batch_for(gi, sub)
            drop_u = None
            if dropout > 0.0:
                key, sub_key = jax.random.split(key)
                if self.local_shard:
                    # Each process draws ITS block's rows (host RNG
                    # keyed by process) and contributes them to the
                    # global row-sharded array.
                    rng = np.random.default_rng([seed, gi, self.proc])
                    du = rng.integers(-(2**31), 2**31 - 1,
                                      (self._r_loc, batch.sid.shape[1]),
                                      dtype=np.int64).astype(np.int32)
                    drop_u = pmesh.shard_rows_local(
                        du, self.sharding,
                        (self._r_glob, batch.sid.shape[1]))
                elif self.n_proc > 1:
                    # Identical host RNG on every process, sharded in.
                    rng = np.random.default_rng([seed, gi])
                    du = rng.integers(-(2**31), 2**31 - 1,
                                      (sub.rows, batch.sid.shape[1]),
                                      dtype=np.int64).astype(np.int32)
                    drop_u = pmesh.shard_rows(du, self.sharding)
                elif self.use_mesh:
                    # The sharded fns take a row-sharded random array.
                    drop_u = jax.random.randint(
                        sub_key, (batch.p1.shape[0], batch.sid.shape[1]),
                        minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32,
                    )
                else:
                    # Single-device fused ops expand the KEY inside the
                    # graph (same bits, one less dispatch per group).
                    drop_u = sub_key
            if self.use_mesh:
                # The sharded fns mask the cached scores per chunk from
                # drop_u inside the scans — a full-width masked copy
                # would double the group's cache footprint.
                score, slots = self._probe_group(gi, batch)
                seg = self._seg_for(gi, slots) \
                    if gi in self.slot_cache else None
                fns = self._mesh_fns(dropout)
                if seg is not None:
                    # Scatter-free per-shard segsum counts (round-3
                    # VERDICT item 4); in-kernel fused probe when the
                    # table carries the vscan layout.
                    fused = self._vscan_ok()
                    # The factory memoizes compiled fns module-wide
                    # (pmesh._FN_CACHE keys on mesh/shape/dropout/...).
                    step_fn = pmesh.sharded_e_step_seg(
                        self.dt, self._fns["mesh"], width=self.width,
                        chunk=self.chunk, dtype=self.dtype,
                        dropout=dropout, kernel=self.kernel,
                        probe=self.probe, fused=fused)
                    args = self._dt_call() + pmesh.batch_to_arrays(batch)
                    if not fused:
                        args = args + (score, slots)
                    args = args + pmesh.seg_call_args(seg) \
                        + (self.slot_rows,)
                    if dropout > 0.0:
                        args = args + (drop_u,)
                    A, exp_g = step_fn(*args)
                else:
                    args = self._dt_call() + pmesh.batch_to_arrays(batch) \
                        + (score, slots)
                    if dropout > 0.0:
                        args = args + (drop_u,)
                    A, exp_g = fns["estep"](*args)
            elif self.dtype != jnp.float64 and self._fused() \
                    and (seg := self._fused_seg(gi, batch)) is not None:
                # Fused-probe steady state: forward + backward betas
                # re-probe the VMEM tables in-kernel (no slot-cache
                # score regather at all); segsum turns betas into
                # counts via the session's static sorted-hit structure.
                A, exp_g = lj.estep_fused(
                    self.dt, batch, seg, self.slot_rows, drop_u=drop_u,
                    dropout=dropout, C=self.chunk, dtype=self.dtype)
            elif self.dtype != jnp.float64 and gi in self.slot_cache:
                # Steady state: ONE fused dispatch per group (score
                # regather + forward + backward + counts).
                slots = self.slot_cache[gi]
                seg = self._seg_for(gi, slots)
                A, exp_g = lj.estep_cached(
                    self.dt, batch, slots, self.slot_rows, seg=seg,
                    drop_u=drop_u, dropout=dropout, C=self.chunk,
                    dtype=self.dtype, backend=self.kernel)
            else:
                score, slots = self._probe_group(gi, batch)
                A = lj.forward(self.dt, batch, C=self.chunk,
                               dtype=self.dtype, backend=self.kernel,
                               cache=(score, slots), drop_u=drop_u,
                               dropout=dropout)
                seg = self._seg_for(gi, slots)
                if seg is not None:
                    Bt = lj.backward_betas(
                        self.dt, batch, C=self.chunk, dtype=self.dtype,
                        cache=(score, slots), drop_u=drop_u,
                        dropout=dropout)
                    exp_g = lj.segsum_expected(
                        self.dt, batch, A, Bt, seg, self.slot_rows,
                        drop_u=drop_u, dropout=dropout, dtype=self.dtype)
                else:
                    exp_g = lj.backward_expected(
                        self.dt, batch, A, C=self.chunk, dtype=self.dtype,
                        backend=self.kernel, cache=(score, slots),
                        drop_u=drop_u, dropout=dropout,
                        nbins=self._nbins() if self.use_rank else None)
            # Keep everything on device; sync every other group so at
            # most ~2 groups of intermediates are in flight (the host
            # still preps group g+1 while group g computes) — unbounded
            # streaming OOMs large corpora.
            acc = exp_g if acc is None else acc + exp_g
            if gi % 2 == 1:
                # device_get forces real completion (block_until_ready
                # does not round-trip through the axon relay).
                jax.device_get(acc[:1])
            info = self._span_arrays(gi, sub)
            spans = info["spans"]
            if spans:
                rows_idx, ends_idx = info["z"]
                if self.n_proc > 1:
                    # Fetch only this process's row block and pick the
                    # span ends on host (the indices are block-local).
                    _, A_local = pmesh.local_rows(A)
                    z_checks.append((A_local[rows_idx, ends_idx], spans))
                else:
                    z_checks.append((lj.pick_span_values_device(
                        A, rows_idx, ends_idx), spans))
                if task is not None:
                    task.record(info["nbytes"], info["nsamples"])
        expected = self._fold(acc)
        # Per-snippet normalizer check (reference: src/prune.rs:90-96).
        # Multi-process: failures allgathered BEFORE raising so no
        # process hangs in a later collective.
        fail_si, fail_z = -1, 0.0
        for z_dev, spans in z_checks:
            z_vals = np.asarray(z_dev)[: len(spans)]
            bad = ~np.isfinite(z_vals)
            if bad.any():
                k = int(np.nonzero(bad)[0][0])
                fail_si, fail_z = spans[k][3], float(z_vals[k])
                break
        if self.n_proc > 1:
            fail_si, fail_z = pmesh.allgather_fail(fail_si, fail_z)
        if fail_si >= 0:
            where = "process-local sample" if self.local_shard else "sample"
            raise ValueError(
                f"normalization constant is not finite "
                f"(z={fail_z}, {where}={fail_si})"
            )
        return expected

    def count_frequencies(self, model: Model, task=None) -> np.ndarray:
        """Viterbi token frequencies (reference: src/prune.rs:205-246).

        Samples that fit one snippet count through the cached-slot
        Viterbi over the session packing; longer samples (chopped for
        EM) fall back to the exact unchunked encode."""
        import jax.numpy as jnp

        from ..parallel import mesh as pmesh
        from . import estep_device as ed

        self._rebind(model)
        V = model.vocab_size()
        freqs = np.zeros(V, dtype=np.int64)
        token_to_id = model.oracle.token_to_ids
        nm = model.native()  # threaded backtrack when available
        long_idx = [si for si, s in enumerate(self.samples)
                    if len(s) > self.max_snippet]
        long_set = set(long_idx)

        from ..utils.packing import PackedBatch

        def drain(pending):
            sub, dp_ends_dev, best_l_dev, spans_whole = pending
            best_l_host = np.asarray(best_l_dev)
            dp_ends = np.asarray(dp_ends_dev)[: len(spans_whole)] \
                if spans_whole else np.zeros(0, dtype=np.float32)
            view = PackedBatch(sub.bytes_arr, sub.sample_id, sub.is_start,
                               sub.end_index, spans_whole)
            freqs[:] += lj.backtrack_freq_counts(
                view, dp_ends, best_l_host, V, token_to_id,
                native_model=nm)
            if task is not None:
                nbytes = sum(e - s for (_, s, e, _, _) in spans_whole)
                task.record(nbytes,
                            len({si for (_, _, _, si, _) in spans_whole}))

        pending = None
        device_counts = self.dtype != jnp.float64 and not self.use_mesh \
            and os.environ.get("TGX_DEVICE_FREQ", "1") != "0"
        count_acc = None
        nopath_checks = []  # (dp_ends device array, spans)
        if device_counts:
            # Freq groups are packed at the ENCODE width (samples up to
            # 32 KiB count whole in-graph; see _freq_groups).
            groups = self._freq_groups()
            long_idx = [si for si, smp in enumerate(self.samples)
                        if len(smp) > self._freq_cap]
            long_set = set(long_idx)
        else:
            groups = self._groups()
        for gi, sub in groups:
            batch = self._freq_batch(gi, sub) if device_counts \
                else self._batch_for(gi, sub)
            if device_counts:
                # When the freq packing IS the EM packing
                # (_freq_shared: every sample fits one EM snippet), the
                # group indices coincide and the session's cached rank
                # arrays apply — the frequency pass then pays a cheap
                # rank-table score regather instead of a full bucket
                # probe (the dominant cost at >16k vocab, where the
                # fused in-VMEM probe does not apply). A DIFFERENT freq
                # packing must never consult the EM caches: a gi
                # collision fed EM-shaped caches to freq-shaped batches
                # and crashed the 1.1 GB run (round 4).
                if getattr(self, "_freq_shared", False) \
                        and not self._vscan_ok() \
                        and gi in self.slot_cache:
                    dp, best_l = lj.viterbi_cached(
                        self.dt, batch, self.slot_cache[gi],
                        self.slot_rows, C=self.chunk, dtype=self.dtype,
                        backend=self.kernel)
                else:
                    dp, best_l = lj.viterbi(
                        self.dt, batch, C=self.chunk, dtype=self.dtype,
                        backend="fused" if self._vscan_ok()
                        else self.kernel,
                        probe=self.probe)
            elif self.use_mesh:
                score, slots = self._probe_group(gi, batch)
                fns = self._mesh_fns()
                dp, best_l = fns["viterbi"](
                    *(self._dt_call() + pmesh.batch_to_arrays(batch)
                      + (score, slots)))
            elif self._fused():
                # Fused probe: no slot cache or score regather needed.
                dp, best_l = lj.viterbi(self.dt, batch, C=self.chunk,
                                        dtype=self.dtype, backend="fused")
            elif self.dtype != jnp.float64 and gi in self.slot_cache:
                dp, best_l = lj.viterbi_cached(
                    self.dt, batch, self.slot_cache[gi], self.slot_rows,
                    C=self.chunk, dtype=self.dtype, backend=self.kernel)
            else:
                score, slots = self._probe_group(gi, batch)
                dp, best_l = lj.viterbi(self.dt, batch, C=self.chunk,
                                        dtype=self.dtype,
                                        backend=self.kernel,
                                        cache=(score, slots))
            info = self._freq_info(gi, sub) if device_counts \
                else self._span_arrays(gi, sub)
            spans_whole = info["whole"]
            if device_counts:
                # In-graph backtrack + id probe + int scatter: only the
                # (V,) count vector leaves the device (the host-fetch
                # of best_l was ~1 B/corpus byte per pass, the wall of
                # this pass at >= 1 GB through the relay).
                ends_cnt = self._countable_ends(gi, batch, info)
                cnt_g = lj.viterbi_freq(self.dt, batch, dp, best_l,
                                        ends_cnt, vpad=self._vpad,
                                        C=self.chunk, dtype=self.dtype)
                count_acc = cnt_g if count_acc is None \
                    else count_acc + cnt_g
                if spans_whole:
                    nopath_checks.append((lj.pick_span_values_device(
                        dp, info["whole_rows"], info["whole_ends"]),
                        spans_whole))
                if gi % 2 == 1:
                    import jax as _jax

                    _jax.device_get(count_acc[:1])
                if task is not None:
                    task.record(info["nbytes"], info["nsamples"])
                continue
            if self.n_proc > 1:
                # Backtrack only this process's row block (the spans in
                # `info` are block-local; see _span_arrays).
                lo, bl_local = pmesh.local_rows(best_l.astype(jnp.int8))
                if spans_whole:
                    _, dp_local = pmesh.local_rows(dp)
                    dp_ends_dev = dp_local[info["whole_rows"],
                                           info["whole_ends"]]
                else:
                    dp_ends_dev = None
                n = bl_local.shape[0]
                view_src = sub if self.local_shard else ed._slice_packed(
                    sub, lo, lo + n)
                view_sub = PackedBatch(
                    view_src.bytes_arr, view_src.sample_id,
                    view_src.is_start, view_src.end_index, spans_whole)
                nxt = (view_sub, dp_ends_dev, bl_local, spans_whole)
            else:
                if spans_whole:
                    dp_ends_dev = lj.pick_span_values_device(
                        dp, info["whole_rows"], info["whole_ends"])
                else:
                    dp_ends_dev = None
                nxt = (sub, dp_ends_dev, best_l.astype(jnp.int8),
                       spans_whole)
            # 1-deep prefetch: backtrack the previous group on host
            # while this group computes on device.
            if pending is not None:
                drain(pending)
            pending = nxt
        if pending is not None:
            drain(pending)
        if count_acc is not None:
            # NoPath check BEFORE trusting the device counts: an
            # unreachable sample end walks a garbage backpointer chain
            # (reference raises, src/model.rs:119).
            for dp_ends, spans in nopath_checks:
                vals = np.asarray(dp_ends)[: len(spans)]
                bad = ~np.isfinite(vals)
                if bad.any():
                    k = int(np.nonzero(bad)[0][0])
                    n = spans[k][2] - spans[k][1]
                    raise NoPathError(n, n)
            freqs[:] += np.asarray(count_acc)[:V].astype(np.int64)

        def add_long(indices, force_local: bool):
            # Same dtype/kernel and the session's rebound table: the
            # fallback must count at the session's conformance grade
            # (f64 sessions stay f64) and keep compile shapes pinned
            # across prune rounds instead of rebuilding per call.
            encoded = ed.encode_corpus_device(
                model, [self.samples[si] for si in indices], task=task,
                dtype=self.dtype, kernel=self.kernel, probe=self.probe,
                table=self.tbl, force_local=force_local)
            for ids in encoded:
                if ids:
                    np.add.at(freqs, np.asarray(ids, dtype=np.int64), 1)

        if self.local_shard:
            # Per-host corpus shards: each process encodes its own long
            # samples as a LOCAL program (shapes differ per process, so
            # a global program would deadlock), then one allgather sums
            # short + long counts.
            if long_idx:
                add_long(long_idx, force_local=True)
            freqs = pmesh.allgather_sum(freqs).astype(np.int64)
        elif self.n_proc > 1:
            # Replicated corpus: short-span counts are per-process
            # partials; the long-sample encode is a global program whose
            # ids every process sees in full — add those ONCE, after
            # the allgather.
            freqs = pmesh.allgather_sum(freqs).astype(np.int64)
            if long_idx:
                add_long(long_idx, force_local=False)
        elif long_idx:
            add_long(long_idx, force_local=False)
        return freqs
