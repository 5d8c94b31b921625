"""Pallas TPU kernels for the lattice DP inner loops.

The chunked scans in ops/lattice_jax.py spend their time in the
sequential per-position relaxation; as XLA while-loops each position
step pays dispatch/sync overhead. These kernels run the whole
C-position chunk inside one Mosaic kernel: state (the last-L DP values)
lives in VMEM scratch, each step is a handful of VPU ops on (L, 128)
tiles, and the only HBM traffic is the streamed match-score chunk.

Layout: lanes = 128 packed rows, sublanes = L (the max token length).
The kernel grid iterates over 128-row lane groups; TPU grid steps are
sequential per core, so the VMEM scratch carry is private per group.

Tie-breaking matches the reference: on equal candidate scores the
LARGEST token length wins (reference: src/model.rs:83-110, candidates
relaxed in ascending start position with strict >). Implemented as
max-index-of-max via iota masking rather than argmax (which would pick
the first/smallest index).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(np.float32(-3.0e38))  # sentinel "-inf" that survives f32 math


def _roll_insert(hist, row):
    """hist[j] <- hist[j-1], hist[0] <- row. hist: (L, 128), row: (1, 128)."""
    L = hist.shape[0]
    return jnp.concatenate([row, hist[: L - 1, :]], axis=0)


# ---------------------------------------------------------------------------
# Viterbi chunk kernel
# ---------------------------------------------------------------------------


def _viterbi_kernel(score_ref, start_ref, hist_in_ref,
                    dp_ref, bestl_ref, hist_out_ref, hist):
    C = score_ref.shape[0]
    L = score_ref.shape[1]
    hist[:] = hist_in_ref[:]
    jrow = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 0)

    def body(q, _):
        s = score_ref[q]  # (L, 128)
        cand = hist[:] + s
        m = jnp.max(cand, axis=0, keepdims=True)  # (1, 128)
        is_max = (cand >= m) & (s > NEG)
        # Largest l on ties; -1 when nothing matched.
        jbest = jnp.max(jnp.where(is_max, jrow, -1), axis=0, keepdims=True)
        valid = jbest >= 0
        m = jnp.where(valid, m, NEG)
        dp_ref[q] = m
        bestl_ref[q] = jnp.where(valid, jbest + 1, 1)
        st = start_ref[q]  # (1, 128) float: 1.0 at sample starts
        carry = jnp.where(st > 0.5, jnp.zeros_like(m), m)
        hist[:] = _roll_insert(hist[:], carry)
        return 0

    jax.lax.fori_loop(0, C, body, 0)
    hist_out_ref[:] = hist[:]


def viterbi_chunk(score_e, starts, hist0, interpret=False):
    """One chunk of Viterbi DP.

    score_e: (G, C, L, 128) f32 end-indexed scores (NEG for no match)
    starts:  (G, C, 1, 128) f32 (1.0 where dp index q+1 starts a sample)
    hist0:   (G, L, 128) f32

    Returns dp (G, C, 1, 128), best_l, hist (G, L, 128). Token ids are
    resolved host-side from (position, best_l) byte spans.
    """
    G, C, L, lanes = score_e.shape
    assert lanes == 128
    out = pl.pallas_call(
        _squeeze_g(_viterbi_kernel),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, C, L, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, 1, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, C, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, C, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, L, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((L, 128), jnp.float32)],
        interpret=interpret,
    )(score_e, starts, hist0)
    return tuple(out)


def _squeeze_g(kernel):
    """Adapt a kernel written for unbatched blocks to blocks with a
    leading grid dim of size 1."""

    @functools.wraps(kernel)
    def wrapped(*refs):
        squeezed = [_SqueezeRef(r) for r in refs[:-1]] + [refs[-1]]
        return kernel(*squeezed)

    return wrapped


class _SqueezeRef:
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


# ---------------------------------------------------------------------------
# Log-sum-exp forward chunk kernel
# ---------------------------------------------------------------------------


def _forward_kernel(score_ref, start_ref, hist_in_ref, a_ref, hist_out_ref,
                    hist):
    C = score_ref.shape[0]
    hist[:] = hist_in_ref[:]

    def body(q, _):
        s = score_ref[q]
        cand = hist[:] + s
        m = jnp.max(cand, axis=0, keepdims=True)
        has = m > NEG * 0.5
        safe = jnp.where(has, m, 0.0)
        t = jnp.sum(jnp.exp(cand - safe), axis=0, keepdims=True)
        lse = jnp.where(has, safe + jnp.log(t), NEG)
        a_ref[q] = lse
        st = start_ref[q]
        carry = jnp.where(st > 0.5, jnp.zeros_like(lse), lse)
        hist[:] = _roll_insert(hist[:], carry)
        return 0

    jax.lax.fori_loop(0, C, body, 0)
    hist_out_ref[:] = hist[:]


def forward_chunk(score_e, starts, hist0, interpret=False):
    """(G, C, L, 128) scores -> A values (G, C, 1, 128) + carried hist."""
    G, C, L, lanes = score_e.shape
    out = pl.pallas_call(
        _squeeze_g(_forward_kernel),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, C, L, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, 1, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, C, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, L, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((L, 128), jnp.float32)],
        interpret=interpret,
    )(score_e, starts, hist0)
    return tuple(out)


# ---------------------------------------------------------------------------
# Backward + marginal chunk kernel
# ---------------------------------------------------------------------------


def _backward_kernel(score_ref, a_ref, z_ref, end_ref, hist_in_ref,
                     marg_ref, hist_out_ref, hist):
    C = score_ref.shape[0]
    hist[:] = hist_in_ref[:]

    def body(i, _):
        q = C - 1 - i
        s = score_ref[q]  # (L, 128) start-indexed
        h = hist[:]
        marg_ref[q] = jnp.exp(
            jnp.maximum(a_ref[q] + s + h - z_ref[q], NEG)
        )
        cand = s + h
        m = jnp.max(cand, axis=0, keepdims=True)
        has = m > NEG * 0.5
        safe = jnp.where(has, m, 0.0)
        t = jnp.sum(jnp.exp(cand - safe), axis=0, keepdims=True)
        lse = jnp.where(has, safe + jnp.log(t), NEG)
        e = end_ref[q]
        b_post = jnp.where(e > 0.5, jnp.zeros_like(lse), lse)
        hist[:] = _roll_insert(hist[:], b_post)
        return 0

    jax.lax.fori_loop(0, C, body, 0)
    hist_out_ref[:] = hist[:]


def backward_chunk(score_s, a_vals, z_vals, ends, hist0, interpret=False):
    """Backward LSE + marginals for one chunk (positions descending).

    score_s: (G, C, L, 128) start-indexed scores
    a_vals:  (G, C, 1, 128) forward values at token starts (post-reset)
    z_vals:  (G, C, 1, 128) per-position normalizers
    ends:    (G, C, 1, 128) 1.0 where position is a sample end
    hist0:   (G, L, 128) B values for positions [chunk_end, chunk_end+L)

    Returns marg (G, C, L, 128), hist (G, L, 128).
    """
    G, C, L, lanes = score_s.shape
    out = pl.pallas_call(
        _squeeze_g(_backward_kernel),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, C, L, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, L, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, C, L, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, L, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((L, 128), jnp.float32)],
        interpret=interpret,
    )(score_s, a_vals, z_vals, ends, hist0)
    return tuple(out)
