"""Fused Pallas TPU kernels: vocabulary probe + lattice DP in one pass.

The round-1..3 device path probed the vocabulary with XLA gathers
against HBM-resident hash tables (one x16-row gather per (pos, len)),
which is issue-rate-bound at ~0.39 G rows/s on v5e — the measured
roofline of the whole Viterbi/EM pipeline (BASELINE.md). These kernels
move the probe INSIDE the Mosaic kernel:

  - the two cuckoo tables live in VMEM in a "vscan" layout — each
    128-entry table row pre-broadcast across 8 sublanes — so a probe
    point resolves by a linear scan of table rows, each step one
    dim-1 `tpu.dynamic_gather` (lane shuffle) + compare + select at
    ~1 step/cycle for 1024 probe points (experiments/probe_gather_r4d);
  - substring fingerprints are computed in-kernel from streamed prefix
    hashes with rolling (L, 128) histories — the only HBM traffic is
    ~16 B per corpus byte of row streams instead of 64 B of random row
    gathers per (pos, len);
  - the Viterbi / forward / backward relaxations consume the score
    tile straight from VMEM (ops/lattice_pallas.py kernels kept the
    same DP math; tie-breaking identical: largest token length wins
    equal scores, reference src/model.rs:83-110).

Cost is linear in table size (the scan visits every table row per
(8, 128) probe tile), so this path is gated to tables of at most
2^VSCAN_MAX_BITS entries per cuckoo side (ops/match_table builds the
layout only then); larger vocabularies keep the XLA bucket-gather path.

Semantics match ops/lattice_jax._match_slab exactly: same hash family
(ops/hashing.py), same cuckoo probe (t1 priority on double match), same
empty-slot guard (score sentinel), same dropout coin stream (keyed on
the token's start position), same sample-boundary validity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import hashing as H
from .lattice_pallas import NEG, _roll_insert

# Empty-slot score sentinel (f32 -3.0e38) as int32 bits: the T1 scan
# must not let an empty-slot pseudo-hit (check 0 == fp2 0) overwrite a
# true T2 match (mirrors _match_slab's `s1 > -1.0e38` guard).
NEG_BITS = int(np.array([-3.0e38], np.float32).view(np.int32)[0])

_ODD = 2654435761  # dropout per-length mixer (lattice_jax._match_slab)


def _i32(u: int) -> int:
    return int(np.uint32(u % (1 << 32)).view(np.int32))


def _tile_consts(L: int, bits: int, dropout: float):
    """Per-length constant tiles for each 8-length probe sub-tile.

    Built IN-TRACE from iota (pallas_call rejects captured array
    constants); loop-invariant, so Mosaic hoists them out of the
    position loop."""
    Lp = -(-L // 8) * 8
    out = []
    for t in range(Lp // 8):
        lens = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) \
            + jnp.int32(8 * t + 1)
        out.append({
            "a1": lens * jnp.int32(_i32(int(H.IDX_A1))),
            "a2": lens * jnp.int32(_i32(int(H.IDX_A2))),
            "odd": lens * jnp.int32(_i32(_ODD)),
            "lens": lens,
            "len_ok": (lens <= jnp.int32(L)).astype(jnp.int32),
        })
    return out


def _probe_tiles(refs, q, consts, L, bits, R1, R2, dropout, carry):
    """Score tile (Lp, 128) f32 for dp step q: in-kernel fingerprints +
    cuckoo scan. `carry` holds the rolling histories; returns the score
    tile (start-or-end-indexed depending on the caller's stream wiring).
    """
    ph1, ph2, rh1, rh2, rl, dh = carry
    pe1 = refs["pe1"][q]  # (1, 128) P1[end]
    pe2 = refs["pe2"][q]
    m1 = jnp.int32(_i32(int(H.IDX_M1)))
    m2 = jnp.int32(_i32(int(H.IDX_M2)))
    shift = jnp.int32(32 - bits)
    use_drop = dropout > 0.0
    if use_drop:
        tt_val = np.int32(np.uint32(
            min(int(dropout * (1 << 32)), (1 << 32) - 1)).view(np.int32))
        tt = jax.lax.shift_right_logical(
            jnp.full((8, 128), tt_val, jnp.int32), jnp.int32(1))

    tiles = []
    for t, cc in enumerate(consts):
        ph1_t = ph1[8 * t : 8 * t + 8, :]
        ph2_t = ph2[8 * t : 8 * t + 8, :]
        rh1_t = rh1[8 * t : 8 * t + 8, :]
        rh2_t = rh2[8 * t : 8 * t + 8, :]
        pe1_b = jnp.broadcast_to(pe1, (8, 128))
        pe2_b = jnp.broadcast_to(pe2, (8, 128))
        fp1 = (pe1_b - ph1_t) * rh1_t
        fp2 = (pe2_b - ph2_t) * rh2_t
        idx1 = jax.lax.shift_right_logical((fp1 ^ cc["a1"]) * m1, shift)
        idx2 = jax.lax.shift_right_logical((fp2 ^ cc["a2"]) * m2, shift)
        lane1 = idx1 & jnp.int32(127)
        row1 = jax.lax.shift_right_logical(idx1, jnp.int32(7))
        lane2 = idx2 & jnp.int32(127)
        row2 = jax.lax.shift_right_logical(idx2, jnp.int32(7))

        score = jnp.full((8, 128), jnp.int32(NEG_BITS), jnp.int32)
        # T2 first, T1 second: a later T1 write wins double matches
        # (t1 priority, lattice_jax._match_slab "fast").
        for r in range(R2):
            gc = jnp.take_along_axis(refs["c2"][8 * r : 8 * r + 8, :],
                                     lane2, axis=1)
            gs = jnp.take_along_axis(refs["s2"][8 * r : 8 * r + 8, :],
                                     lane2, axis=1)
            hit = (gc == fp2) & (row2 == jnp.int32(r))
            score = jnp.where(hit, gs, score)
        for r in range(R1):
            gc = jnp.take_along_axis(refs["c1"][8 * r : 8 * r + 8, :],
                                     lane1, axis=1)
            gs = jnp.take_along_axis(refs["s1"][8 * r : 8 * r + 8, :],
                                     lane1, axis=1)
            # Empty-slot guard: score sentinel never overwrites a true
            # T2 match on a (check==0, fp2==0) pseudo-hit.
            hit = (gc == fp2) & (row1 == jnp.int32(r)) & (gs != jnp.int32(NEG_BITS))
            score = jnp.where(hit, gs, score)

        valid = (cc["lens"] <= jnp.broadcast_to(rl, (8, 128))) \
            & (cc["len_ok"] > 0)
        if use_drop:
            dh_t = dh[8 * t : 8 * t + 8, :]
            u = jax.lax.shift_right_logical(dh_t * cc["odd"], jnp.int32(1))
            valid = valid & ~((u < tt) & (cc["lens"] > 1))
        s_f = jax.lax.bitcast_convert_type(score, jnp.float32)
        tiles.append(jnp.where(valid & (s_f > NEG * 0.5), s_f, NEG))
    return jnp.concatenate(tiles, axis=0) if len(tiles) > 1 else tiles[0]


def _make_fused_fwd_kernel(kind: str, C: int, L: int, bits: int,
                           R1: int, R2: int, dropout: float):
    """kind: 'viterbi' | 'logsumexp'. End-indexed probe fused with the
    forward DP (same relaxation as lattice_pallas._viterbi_kernel /
    _forward_kernel)."""
    Lp = -(-L // 8) * 8
    use_drop = dropout > 0.0

    def kernel(c1_ref, s1_ref, c2_ref, s2_ref,   # tables (R*8, 128)
               pe1_ref, pe2_ref,                  # (C, 1, 128) P[q+1]
               rv1_ref, rv2_ref,                  # (C, 1, 128) rinv[q]
               ph01_ref, ph02_ref,                # (Lp, 128) init P hist
               rh01_ref, rh02_ref,                # (Lp, 128) init rinv hist
               inb_ref, stb_ref, std_ref,         # (C, 1, 128) byte flags
               du_ref, dh0_ref,                   # dropout stream/init
               hist_in_ref, rl_in_ref,            # (Lp, 128), (1, 128)
               out0_ref, out1_ref,                # dp/bestl or a/unused
               hist_out_ref, rl_out_ref):
        refs = {"pe1": pe1_ref, "pe2": pe2_ref,
                "c1": c1_ref, "s1": s1_ref, "c2": c2_ref, "s2": s2_ref}
        consts = _tile_consts(L, bits, dropout)
        jrow = jax.lax.broadcasted_iota(jnp.int32, (Lp, 128), 0)

        def body(q, carry):
            hist, ph1, ph2, rh1, rh2, rl, dh = carry
            # Histories advance at step START: rh[0] must be rinv[q]
            # and dh[0] the dropout word at the token start q (l=1).
            rh1 = _roll_insert(rh1, rv1_ref[q])
            rh2 = _roll_insert(rh2, rv2_ref[q])
            if use_drop:
                dh = _roll_insert(dh, du_ref[q])
            inb = inb_ref[q]  # (1, 128) int32
            stb = stb_ref[q]
            rl = jnp.where(inb > 0,
               jnp.where(stb > 0, jnp.int32(1),
                         rl + jnp.int32(1)), jnp.int32(0))

            s = _probe_tiles(refs, q, consts, L, bits, R1, R2, dropout,
                             (ph1, ph2, rh1, rh2, rl, dh))
            cand = hist + s
            if kind == "viterbi":
                m = jnp.max(cand, axis=0, keepdims=True)
                is_max = (cand >= m) & (s > NEG)
                jbest = jnp.max(jnp.where(is_max, jrow, -1), axis=0,
                                keepdims=True)
                ok = jbest >= 0
                m = jnp.where(ok, m, NEG)
                out0_ref[q] = m
                out1_ref[q] = jnp.where(ok, jbest + 1, 1)
                dp_p = m
            else:
                m = jnp.max(cand, axis=0, keepdims=True)
                has = m > NEG * 0.5
                safe = jnp.where(has, m, 0.0)
                tsum = jnp.sum(jnp.exp(cand - safe), axis=0, keepdims=True)
                dp_p = jnp.where(has, safe + jnp.log(tsum), NEG)
                out0_ref[q] = dp_p
            st = std_ref[q]  # (1, 128) f32: dp reset at p = q+1
            carry_val = jnp.where(st > 0.5, jnp.zeros_like(dp_p), dp_p)
            hist = _roll_insert(hist, carry_val)
            ph1 = _roll_insert(ph1, pe1_ref[q])
            ph2 = _roll_insert(ph2, pe2_ref[q])
            return (hist, ph1, ph2, rh1, rh2, rl, dh)

        init = (hist_in_ref[:], ph01_ref[:], ph02_ref[:],
                rh01_ref[:], rh02_ref[:], rl_in_ref[:], dh0_ref[:])
        hist, ph1, ph2, rh1, rh2, rl, dh = jax.lax.fori_loop(
            0, C, body, init)
        hist_out_ref[:] = hist
        rl_out_ref[:] = rl

    return kernel


def _make_fused_bwd_kernel(C: int, L: int, bits: int, R1: int, R2: int,
                           dropout: float):
    """Backward log-beta recurrence with the probe fused, positions
    descending (start-indexed scores: fp(q, l) = (P[q+l] - P[q]) *
    rinv[q]). Emits b[q] per step; segsum_expected consumes the betas
    (reference: src/lattice.rs:245-312 backward_scores)."""
    Lp = -(-L // 8) * 8
    use_drop = dropout > 0.0

    def kernel(c1_ref, s1_ref, c2_ref, s2_ref,
               ps1_ref, ps2_ref,                  # (C, 1, 128) P[q]
               rv1_ref, rv2_ref,                  # (C, 1, 128) rinv[q]
               phf01_ref, phf02_ref,              # (Lp, 128) P[q+1+j] init
               inb_ref, stb_ref, ends_ref,        # (C, 1, 128)
               du_ref,                            # dropout stream
               hist_in_ref, fr_in_ref, sn_in_ref,  # beta hist, fwd-run, stb
               out_ref, hist_out_ref, fr_out_ref, sn_out_ref):
        refs = {"c1": c1_ref, "s1": s1_ref, "c2": c2_ref, "s2": s2_ref}
        consts = _tile_consts(L, bits, dropout)
        m1 = jnp.int32(_i32(int(H.IDX_M1)))
        m2 = jnp.int32(_i32(int(H.IDX_M2)))
        shift = jnp.int32(32 - bits)
        if use_drop:
            tt_val = np.int32(np.uint32(
                min(int(dropout * (1 << 32)), (1 << 32) - 1)).view(np.int32))
            tt = jax.lax.shift_right_logical(
                jnp.full((8, 128), tt_val, jnp.int32), jnp.int32(1))

        def body(i, carry):
            hist, phf1, phf2, fr, sn = carry
            q = C - 1 - i
            inb = inb_ref[q]
            # fr = in-sample run length STARTING at byte q (no internal
            # sample start): fr[q] = inb ? 1 + (sn ? 0 : fr_next) : 0.
            fr = jnp.where(
                inb > 0,
                jnp.int32(1) + jnp.where(sn > 0, jnp.int32(0), fr),
                jnp.int32(0))
            ps1 = ps1_ref[q]
            ps2 = ps2_ref[q]
            rv1 = jnp.broadcast_to(rv1_ref[q], (8, 128))
            rv2 = jnp.broadcast_to(rv2_ref[q], (8, 128))
            if use_drop:
                du = jnp.broadcast_to(du_ref[q], (8, 128))

            tiles = []
            for t, cc in enumerate(consts):
                fp1 = (phf1[8 * t : 8 * t + 8, :]
                       - jnp.broadcast_to(ps1, (8, 128))) * rv1
                fp2 = (phf2[8 * t : 8 * t + 8, :]
                       - jnp.broadcast_to(ps2, (8, 128))) * rv2
                idx1 = jax.lax.shift_right_logical(
                    (fp1 ^ cc["a1"]) * m1, shift)
                idx2 = jax.lax.shift_right_logical(
                    (fp2 ^ cc["a2"]) * m2, shift)
                lane1 = idx1 & jnp.int32(127)
                row1 = jax.lax.shift_right_logical(idx1, jnp.int32(7))
                lane2 = idx2 & jnp.int32(127)
                row2 = jax.lax.shift_right_logical(idx2, jnp.int32(7))
                score = jnp.full((8, 128), jnp.int32(NEG_BITS), jnp.int32)
                for r in range(R2):
                    gc = jnp.take_along_axis(
                        refs["c2"][8 * r : 8 * r + 8, :], lane2, axis=1)
                    gs = jnp.take_along_axis(
                        refs["s2"][8 * r : 8 * r + 8, :], lane2, axis=1)
                    hit = (gc == fp2) & (row2 == jnp.int32(r))
                    score = jnp.where(hit, gs, score)
                for r in range(R1):
                    gc = jnp.take_along_axis(
                        refs["c1"][8 * r : 8 * r + 8, :], lane1, axis=1)
                    gs = jnp.take_along_axis(
                        refs["s1"][8 * r : 8 * r + 8, :], lane1, axis=1)
                    hit = (gc == fp2) & (row1 == jnp.int32(r)) & (gs != jnp.int32(NEG_BITS))
                    score = jnp.where(hit, gs, score)
                valid = (cc["lens"] <= jnp.broadcast_to(fr, (8, 128))) \
                    & (cc["len_ok"] > 0)
                if use_drop:
                    u = jax.lax.shift_right_logical(du * cc["odd"],
                                                    jnp.int32(1))
                    valid = valid & ~((u < tt) & (cc["lens"] > 1))
                s_f = jax.lax.bitcast_convert_type(score, jnp.float32)
                tiles.append(jnp.where(valid & (s_f > NEG * 0.5), s_f, NEG))
            s = jnp.concatenate(tiles, axis=0) if len(tiles) > 1 \
                else tiles[0]

            cand = s + hist
            m = jnp.max(cand, axis=0, keepdims=True)
            has = m > NEG * 0.5
            safe = jnp.where(has, m, 0.0)
            tsum = jnp.sum(jnp.exp(cand - safe), axis=0, keepdims=True)
            lse = jnp.where(has, safe + jnp.log(tsum), NEG)
            e = ends_ref[q]
            b_post = jnp.where(e > 0.5, jnp.zeros_like(lse), lse)
            out_ref[q] = b_post
            hist = _roll_insert(hist, b_post)
            phf1 = _roll_insert(phf1, ps1)
            phf2 = _roll_insert(phf2, ps2)
            sn = stb_ref[q]
            return (hist, phf1, phf2, fr, sn)

        init = (hist_in_ref[:], phf01_ref[:], phf02_ref[:],
                fr_in_ref[:], sn_in_ref[:])
        hist, phf1, phf2, fr, sn = jax.lax.fori_loop(0, C, body, init)
        hist_out_ref[:] = hist
        fr_out_ref[:] = fr
        sn_out_ref[:] = sn

    return kernel


def _squeeze_g(kernel, nin):
    """Adapt to blocks with a leading grid dim of size 1 on the
    PER-GROUP refs; table blocks and shared streams come through
    unchanged (their block shapes already drop the grid dim)."""

    @functools.wraps(kernel)
    def wrapped(*refs):
        return kernel(*refs)

    del nin
    return wrapped


class _Squeeze:
    """View of a (1, ...) block ref without the leading unit dim."""

    def __init__(self, ref):
        self._ref = ref

    @property
    def shape(self):
        return self._ref.shape[1:]

    def __getitem__(self, idx):
        if idx is Ellipsis or (isinstance(idx, slice) and idx == slice(None)):
            return self._ref[0]
        return self._ref[0, idx]

    def __setitem__(self, idx, val):
        if idx is Ellipsis or (isinstance(idx, slice) and idx == slice(None)):
            self._ref[0] = val
        else:
            self._ref[0, idx] = val


def _wrap_forward(kernel, per_group: tuple):
    """Squeeze the leading grid dim of per-group refs (mask by index)."""

    @functools.wraps(kernel)
    def wrapped(*refs):
        adj = [(_Squeeze(r) if i in per_group else r)
               for i, r in enumerate(refs)]
        return kernel(*adj)

    return wrapped


def fused_forward_chunk(kind, tabs, pe1, pe2, rv1, rv2, ph01, ph02,
                        rh01, rh02, inb, stb, std, du, dh0, hist0, rl0,
                        *, L, bits, dropout=0.0, interpret=False):
    """One chunk of fused probe + forward DP over 128-row lane groups.

    tabs: (c1, s1, c2, s2) vscan tables (R*8, 128) int32
    pe1..std: (G, C, 1, 128) streams (P[q+1], rinv[q], flags)
    rv1/rv2: (1, C, 1, 128) group-independent rinv streams
    ph0*/dh0: (G, Lp, 128) per-group history inits
    rh0*: (1, Lp, 128) group-independent rinv history init
    hist0: (G, Lp, 128) DP carry, rl0: (G, 1, 128) run-length carry

    Returns (out0, out1, hist, rl): dp+bestl for 'viterbi', a+zeros for
    'logsumexp'.
    """
    c1, s1, c2, s2 = tabs
    G, C = pe1.shape[0], pe1.shape[1]
    Lp = hist0.shape[1]
    R1 = c1.shape[0] // 8
    R2 = c2.shape[0] // 8
    kern = _make_fused_fwd_kernel(kind, C, L, bits, R1, R2, dropout)

    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    strm = pl.BlockSpec((1, C, 1, 128), lambda g: (g, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    strm_shared = pl.BlockSpec((1, C, 1, 128), lambda g: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    hist_spec = pl.BlockSpec((1, Lp, 128), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    hist_shared = pl.BlockSpec((1, Lp, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    rl_spec = pl.BlockSpec((1, 1, 128), lambda g: (g, 0, 0),
                           memory_space=pltpu.VMEM)

    per_group = (4, 5, 8, 9, 13, 14, 15, 16, 17, 18)  # indices to squeeze
    # ref order: c1 s1 c2 s2 | pe1 pe2 rv1 rv2 ph01 ph02 rh01 rh02
    #            inb stb std du dh0 hist rl | outs...
    sq = {"pe1": 4, "pe2": 5, "rv1": 6, "rv2": 7, "ph01": 8, "ph02": 9,
          "rh01": 10, "rh02": 11, "inb": 12, "stb": 13, "std": 14,
          "du": 15, "dh0": 16, "hist": 17, "rl": 18,
          "out0": 19, "out1": 20, "hist_out": 21, "rl_out": 22}
    squeeze_idx = tuple(sq.values())
    del per_group

    out = pl.pallas_call(
        _wrap_forward(kern, squeeze_idx),
        grid=(G,),
        in_specs=[
            tab_spec, tab_spec, tab_spec, tab_spec,
            strm, strm, strm_shared, strm_shared,
            hist_spec, hist_spec, hist_shared, hist_shared,
            strm, strm, strm, strm, hist_spec,
            hist_spec, rl_spec,
        ],
        out_specs=[strm, strm, hist_spec, rl_spec],
        out_shape=[
            jax.ShapeDtypeStruct((G, C, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, C, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, Lp, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(c1, s1, c2, s2, pe1, pe2, rv1, rv2, ph01, ph02, rh01, rh02,
      inb, stb, std, du, dh0, hist0, rl0)
    return tuple(out)


def fused_backward_chunk(tabs, ps1, ps2, rv1, rv2, phf01, phf02,
                         inb, stb, ends, du, hist0, fr0, sn0,
                         *, L, bits, dropout=0.0, interpret=False):
    """One chunk of fused probe + backward beta recurrence (positions
    descending inside the chunk). Returns (betas, hist, fr, sn)."""
    c1, s1, c2, s2 = tabs
    G, C = ps1.shape[0], ps1.shape[1]
    Lp = hist0.shape[1]
    R1 = c1.shape[0] // 8
    R2 = c2.shape[0] // 8
    kern = _make_fused_bwd_kernel(C, L, bits, R1, R2, dropout)

    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    strm = pl.BlockSpec((1, C, 1, 128), lambda g: (g, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    strm_shared = pl.BlockSpec((1, C, 1, 128), lambda g: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    hist_spec = pl.BlockSpec((1, Lp, 128), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    rl_spec = pl.BlockSpec((1, 1, 128), lambda g: (g, 0, 0),
                           memory_space=pltpu.VMEM)

    sq = {"ps1": 4, "ps2": 5, "rv1": 6, "rv2": 7, "phf01": 8, "phf02": 9,
          "inb": 10, "stb": 11, "ends": 12, "du": 13, "hist": 14,
          "fr": 15, "sn": 16, "out": 17, "hist_out": 18, "fr_out": 19,
          "sn_out": 20}
    squeeze_idx = tuple(sq.values())

    out = pl.pallas_call(
        _wrap_forward(kern, squeeze_idx),
        grid=(G,),
        in_specs=[
            tab_spec, tab_spec, tab_spec, tab_spec,
            strm, strm, strm_shared, strm_shared,
            hist_spec, hist_spec,
            strm, strm, strm, strm,
            hist_spec, rl_spec, rl_spec,
        ],
        out_specs=[strm, hist_spec, rl_spec, rl_spec],
        out_shape=[
            jax.ShapeDtypeStruct((G, C, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, Lp, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(c1, s1, c2, s2, ps1, ps2, rv1, rv2, phf01, phf02,
      inb, stb, ends, du, hist0, fr0, sn0)
    return tuple(out)


# ---------------------------------------------------------------------------
# Segsum interval kernel: exp + miss-mask + in-block lane cumsums
# ---------------------------------------------------------------------------

SEG_TILE = 64  # seg-blocks (sublane rows) per grid step


def _lane_cumsum(x):
    """Inclusive prefix sum along lanes of a (R, 128) tile: log-steps of
    circular roll + lane-masked add (the wrap-around lanes are masked)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for k in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.where(lanes >= k, pltpu.roll(x, k, axis=1), 0.0)
    return x


def _seg_weights_kernel(r0_ref, r1_ref, d2_ref, nh_ref, cf_ref, t_ref):
    """One grid step = R seg-blocks (rows of 128 sorted hits).

    ss = in-block cumsum of the score-diff stream (anchors embedded at
    lane 0 by the caller), w = exp(r0 + r1 + ss) masked past n_hit,
    cf = in-block cumsum of w, t = per-block totals.
    """
    i = pl.program_id(0)
    R = d2_ref.shape[1]
    ss = _lane_cumsum(d2_ref[0])
    w = jnp.exp(r0_ref[0] + r1_ref[0] + ss)
    base = i * (R * 128)
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) \
        * 128 + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    w = jnp.where(idx < nh_ref[0], w, 0.0)
    cf = _lane_cumsum(w)
    cf_ref[0] = cf
    t_ref[0] = cf[:, 127:128]


def seg_weights(r0, r1, d2, n_hit, interpret=False):
    """r0/r1: (ntiles, SEG_TILE, 128) gathered [alpha-Z] / [beta] planes
    in sorted-hit order; d2: score-diff stream with per-block anchors at
    lane 0; n_hit: () int32. Returns cf (ntiles, SEG_TILE, 128)
    in-block inclusive cumsums of the true marginals and t
    (ntiles, SEG_TILE, 1) block totals."""
    ntiles, R = d2.shape[0], d2.shape[1]
    nh = jnp.reshape(n_hit.astype(jnp.int32), (1,))
    tile = pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _seg_weights_kernel,
        grid=(ntiles,),
        in_specs=[
            tile, tile, tile,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            tile,
            pl.BlockSpec((1, R, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ntiles, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, R, 1), jnp.float32),
        ],
        interpret=interpret,
    )(r0, r1, d2, nh)
    return tuple(out)
