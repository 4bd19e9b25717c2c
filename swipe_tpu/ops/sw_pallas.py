"""Pallas TPU kernel: inter-sequence Smith-Waterman database scoring.

TPU-native re-design of the reference's inter-sequence SIMD DP kernels
(/root/reference/search7.cc, search16.cc, search63.cc).  Key mapping:

* SWIPE packs 16 database sequences into the byte lanes of one SSE register
  and streams 4 db symbols per block; here a *segment* of ``NSEQS``
  length-sorted database sequences occupies the lane axis and the whole
  query occupies the sublane axis, so one VPU op updates ``QLEN x NSEQS``
  DP cells.  Many segments are concatenated along the db axis into one
  kernel launch; a scalar-prefetched block->segment map drives per-segment
  score dump and state reset (the static-shape equivalent of SWIPE's
  in-register lane-refill channel machine, search7.cc:830-957).
* SWIPE's score-profile builders (dprofile_fill7/shuffle7, ~458-976
  instructions per 64 db symbols) become a one-hot matmul on the MXU:
  P_j[qpos, seq] = QPT[qpos, sym] @ onehot(D_j)[sym, seq], where
  QPT[q, s] = matrix[query[q], s] is the transposed query profile.
* The per-column gap chain along the query axis (SWIPE's F) is resolved
  exactly in O(log QLEN) vector steps with a weighted prefix max:
      F[q] = max_{k<q}(Hnof[k] - Q - (q-1-k) R)
           = prefixmax(Hnof[k] + k R)[q-1] - Q - (q-1) R,
  exact because opening a gap from inside a gap never beats extending
  (the same domination SWIPE's ONESTEP relies on).

Arithmetic is int32: on the TPU VPU (32-bit lanes) a narrow tier is no
faster, so the 7->16->63-bit escalation cascade is unnecessary for speed;
a single exact pass replaces it.  ``clamp`` reproduces the saturating
7/16-bit tiers; tier accounting lives in pipeline._count_tiers.

Grid: (n_queries, n_db_blocks), block-minor — the H/E/S state for one query
persists in VMEM scratch while db blocks stream through (double-buffered by
the pallas pipeline); queries revisit the db chunk from HBM, which costs
one byte of HBM traffic per ``qlen`` DP cells and is therefore free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sw_scores_segmented", "sw_scores_lax", "build_qpt",
           "PAD_SYMBOL", "NEG_INF", "SEG_BLK"]

PAD_SYMBOL = 31       # db/query padding symbol; profile row/col forced -128
NEG_INF = -(1 << 30)  # -inf stand-in that survives adds without overflow
SEG_BLK = 32          # db columns per grid block; segment length granularity


def build_qpt(queries: list[np.ndarray], matrix: np.ndarray,
              qlen_pad: int, dtype=np.int8) -> np.ndarray:
    """Transposed query profiles [NQ, qlen_pad, 32].

    QPT[n, q, s] = matrix[query_n[q], s]; rows beyond a query's length and
    the PAD_SYMBOL column are strongly negative so padded cells decay
    instead of scoring.  dtype=int8 (default) feeds the Pallas kernels;
    pass np.int32 for matrices outside int8 range (lax fallback only).
    """
    m = np.asarray(matrix, dtype=np.int64)
    info = np.iinfo(dtype)
    if m.min() < info.min or m.max() > info.max:
        raise ValueError(
            f"score matrix must fit {np.dtype(dtype).name} for this kernel")
    pad = max(int(info.min), -(1 << 20))
    nq = len(queries)
    qpt = np.full((nq, qlen_pad, 32), pad, dtype=dtype)
    for n, q in enumerate(queries):
        L = len(q)
        if L > qlen_pad:
            raise ValueError(f"query {n} longer than qlen_pad ({L} > {qlen_pad})")
        qpt[n, :L, :] = m[np.asarray(q, dtype=np.int64), :].astype(dtype)
        qpt[n, :, PAD_SYMBOL] = pad
    return qpt


def _scan_steps(qlen: int) -> list[int]:
    steps = []
    d = 1
    while d < qlen:
        steps.append(d)
        d *= 2
    return steps


def _sw_kernel(seg_ref, qpt_ref, db_ref, out_ref, h_ref, e_ref, s_ref,
               oh_ref, *,
               Q: int, R: int, qlen: int, nblocks: int, clamp: int | None):
    """One (query, db-block) grid step of the segmented SW kernel.

    seg_ref: [nblocks+1] int32 scalar-prefetch block->segment map
    qpt_ref: [1, QLEN, 32] int8 — this query's transposed profile
    db_ref:  [SEG_BLK, NSEQS] int8 — this block's db symbols
    out_ref: [1, 1, NSEQS] int32 — this segment's scores
    h/e/s_ref: [QLEN, NSEQS] int32 scratch persisting across blocks
    """
    b = pl.program_id(1)
    seg = seg_ref[b]
    prev_seg = seg_ref[jnp.maximum(b - 1, 0)]
    is_start = jnp.logical_or(b == 0, seg != prev_seg)
    is_end = jnp.logical_or(b == nblocks - 1, seg_ref[b + 1] != seg)

    @pl.when(is_start)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        e_ref[...] = jnp.full_like(e_ref, NEG_INF)
        s_ref[...] = jnp.zeros_like(s_ref)

    nseqs = db_ref.shape[1]
    qpt = qpt_ref[0]  # [QLEN, 32] int8

    iota_q = jax.lax.broadcasted_iota(jnp.int32, (qlen, 1), 0)
    sym_iota = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    qr_vec = iota_q * R                          # q * R
    f_off = Q + jnp.maximum(iota_q - 1, 0) * R   # Q + (q-1) R

    # one-hot the whole block up front into VMEM scratch
    # [SEG_BLK, 32, NSEQS] int8.  The column loop then indexes the *leading*
    # (untiled) axis of the ref, which Mosaic supports dynamically, unlike
    # sublane-axis dynamic loads.
    dblk = db_ref[...].astype(jnp.int32)                     # [SEG_BLK, NSEQS]
    oh_ref[...] = (dblk[:, None, :] == sym_iota[None, :, :1]).astype(jnp.int8)

    def column(j, state):
        h, e, s = state
        onehot = oh_ref[j]                                   # [32, NSEQS]
        p = jax.lax.dot_general(
            qpt, onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                    # [QLEN, NSEQS]

        e = jnp.maximum(e - R, h - Q)
        hd = pltpu.roll(h, 1, axis=0)
        hd = jnp.where(iota_q == 0, 0, hd)
        hnof = jnp.maximum(jnp.maximum(hd + p, e), 0)
        if clamp is not None:
            hnof = jnp.minimum(hnof, clamp)

        # exact F via log-step weighted prefix max along the query axis
        t = hnof + qr_vec
        for d in _scan_steps(qlen):
            td = pltpu.roll(t, d, axis=0)
            t = jnp.maximum(t, jnp.where(iota_q >= d, td, NEG_INF))
        f = pltpu.roll(t, 1, axis=0)
        f = jnp.where(iota_q == 0, NEG_INF, f) - f_off

        h = jnp.maximum(hnof, f)
        if clamp is not None:
            h = jnp.minimum(h, clamp)
        s = jnp.maximum(s, h)
        return h, e, s

    h, e, s = jax.lax.fori_loop(
        0, SEG_BLK, column, (h_ref[...], e_ref[...], s_ref[...]))
    h_ref[...] = h
    e_ref[...] = e
    s_ref[...] = s

    @pl.when(is_end)
    def _finish():
        # out block is [1, 1, 8, NSEQS]: the 8-row axis only exists to
        # satisfy the TPU block-shape tiling rule; row 0 carries the data
        out_ref[0, 0, 0, :] = jnp.max(s, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("nsegs", "gapopenextend", "gapextend", "clamp",
                     "interpret"),
)
def sw_scores_segmented(qpt: jax.Array, db: jax.Array, seg_ids: jax.Array,
                        *, nsegs: int, gapopenextend: int, gapextend: int,
                        clamp: int | None = None,
                        interpret: bool = False) -> jax.Array:
    """Score queries against a segment-packed db chunk.

    qpt:     [NQ, QLEN, 32] int8 transposed query profiles (build_qpt)
    db:      [L, NSEQS] int8 packed chunk; L multiple of SEG_BLK; column
             ranges belong to segments per seg_ids; PAD_SYMBOL padding
    seg_ids: [L // SEG_BLK + 1] int32 nondecreasing block->segment map
             (last entry duplicates the final segment)
    Returns [NQ, nsegs, NSEQS] int32 local alignment scores (exact when
    clamp is None, saturating at ``clamp`` otherwise).
    """
    nq, qlen, _ = qpt.shape
    L, nseqs = db.shape
    if L % SEG_BLK:
        raise ValueError(f"db length {L} not a multiple of {SEG_BLK}")
    nblocks = L // SEG_BLK

    kernel = functools.partial(
        _sw_kernel, Q=gapopenextend, R=gapextend, qlen=qlen,
        nblocks=nblocks, clamp=clamp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nq, nblocks),
        in_specs=[
            pl.BlockSpec((1, qlen, 32), lambda q, b, seg: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEG_BLK, nseqs), lambda q, b, seg: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, nseqs),
                               lambda q, b, seg: (q, seg[b], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((qlen, nseqs), jnp.int32),
            pltpu.VMEM((qlen, nseqs), jnp.int32),
            pltpu.VMEM((qlen, nseqs), jnp.int32),
            pltpu.VMEM((SEG_BLK, 32, nseqs), jnp.int8),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, nsegs, 8, nseqs), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(seg_ids, qpt, db)
    scores = out[:, :, 0, :]
    # the grid only writes the segments seg_ids names; trailing padded
    # segments (pack_database rounds nsegs up) would otherwise read back
    # uninitialized HBM — zero them so the contract matches the lax twin
    used = jnp.zeros((nsegs,), bool).at[seg_ids[:nblocks]].set(True)
    return jnp.where(used[None, :, None], scores, 0)


@functools.partial(
    jax.jit,
    static_argnames=("nsegs", "gapopenextend", "gapextend", "clamp"),
)
def sw_scores_lax(qpt: jax.Array, db: jax.Array, seg_ids: jax.Array, *,
                  nsegs: int, gapopenextend: int, gapextend: int,
                  clamp: int | None = None) -> jax.Array:
    """Pure-JAX (lax.scan) implementation of the same segmented scoring.

    Works on any backend; the cross-check oracle for the Pallas kernel and
    the fallback scoring path on CPU.  Same contract as
    sw_scores_segmented.
    """
    nq, qlen, _ = qpt.shape
    L, nseqs = db.shape
    if L % SEG_BLK:
        raise ValueError(f"db length {L} not a multiple of {SEG_BLK}")
    Q, R = gapopenextend, gapextend
    nblocks = L // SEG_BLK
    iota_q = jnp.arange(qlen, dtype=jnp.int32)[:, None]
    qr_vec = iota_q * R
    f_off = Q + jnp.maximum(iota_q - 1, 0) * R
    # per-column segment id and segment-start flag
    col_seg = jnp.repeat(seg_ids[:nblocks], SEG_BLK)
    col_start = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), col_seg[1:] != col_seg[:-1]])

    def one_query(qp):
        qp32 = qp.astype(jnp.int32)  # [QLEN, 32]

        def column(state, xs):
            h, e, s, out = state
            dj, seg, start = xs

            def reset(args):
                h, e, s = args
                return (jnp.zeros_like(h), jnp.full_like(e, NEG_INF),
                        jnp.zeros_like(s))

            h, e, s = jax.lax.cond(start, reset, lambda a: a, (h, e, s))
            p = qp32[:, dj]  # [QLEN, NSEQS]
            e = jnp.maximum(e - R, h - Q)
            hd = jnp.concatenate(
                [jnp.zeros((1, nseqs), jnp.int32), h[:-1, :]], axis=0)
            hnof = jnp.maximum(jnp.maximum(hd + p, e), 0)
            if clamp is not None:
                hnof = jnp.minimum(hnof, clamp)
            t = jax.lax.cummax(hnof + qr_vec, axis=0)
            f = jnp.concatenate(
                [jnp.full((1, nseqs), NEG_INF, jnp.int32), t[:-1, :]],
                axis=0) - f_off
            h = jnp.maximum(hnof, f)
            if clamp is not None:
                h = jnp.minimum(h, clamp)
            s = jnp.maximum(s, h)
            out = out.at[seg].max(jnp.max(s, axis=0))
            return (h, e, s, out), None

        # derive the init carry from db and the query profile so its
        # varying-axes metadata matches the scan body under shard_map
        # (zero-valued, free after fusion)
        zvar = (db[0, 0].astype(jnp.int32) * 0
                + qp32[0, 0] * 0)
        init = (jnp.zeros((qlen, nseqs), jnp.int32) + zvar,
                jnp.full((qlen, nseqs), NEG_INF, jnp.int32) + zvar,
                jnp.zeros((qlen, nseqs), jnp.int32) + zvar,
                jnp.zeros((nsegs, nseqs), jnp.int32) + zvar)
        (_, _, _, out), _ = jax.lax.scan(
            column, init, (db.astype(jnp.int32), col_seg, col_start))
        return out

    return jax.vmap(one_query)(qpt)
