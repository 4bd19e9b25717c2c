"""Tiled Pallas SW kernel: query-axis register blocking (the fast path).

The first-generation kernel (sw_pallas._sw_kernel) carries the full
[QLEN, NSEQS] H/E/S state through a fori_loop, which round-trips ~24 bytes
of VMEM traffic per DP cell and caps a v5e chip at ~0.03 Tcell/s (measured).
This kernel restructures the same math the way SWIPE's CDEPTH blocking does
(/root/reference/search7.cc:30-31), but along the query axis:

* the query is split into tiles of TQ rows; the per-tile H/E/S state is
  loaded ONCE per (tile, db-block), updated across all SEG_BLK db columns
  in registers (python-unrolled loop), and stored once — cutting state
  traffic from O(columns) to O(1) per tile per block;
* the inter-tile dependencies per column are tiny [1, NSEQS] boundary rows:
  bH[j] (the tile's last H row after column j, the next tile's diagonal)
  and bF[j] (the query-gap chain value crossing the tile boundary), living
  in [SEG_BLK, NSEQS] scratch;
* within a tile the gap chain is resolved exactly with the same weighted
  prefix max as before (log2(TQ) steps) plus one candidate for the carried
  boundary chain:
      F[r] = max(prefixmax(Hnof + kR)[r-1] - Q - (r-1)R,  carry_in - rR)
      carry_out = max(prefixmax[TQ-1] - Q - (TQ-1)R, carry_in - TQ R).

State arrays are stored as [NT, TQ, NSEQS] so the tile loop (fori) can
index the leading axis dynamically.  Segment bookkeeping (scalar-prefetch
block->segment map, per-segment reset/dump) matches sw_pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw_pallas import NEG_INF, SEG_BLK, _scan_steps

__all__ = ["sw_scores_tiled"]

TQ = 64  # query rows per tile


def _tiled_kernel(seg_ref, qpt_ref, db_ref, out_ref,
                  h_ref, e_ref, s_ref, oh_ref, bh_ref, bf_ref, *,
                  Q: int, R: int, qlen: int, nblocks: int,
                  clamp: int | None):
    """One (query, db-block) grid step.

    h/e/s_ref: [NT, TQ, NSEQS] int32 persistent state
    oh_ref:    [SEG_BLK, 32, NSEQS] int8 block one-hots
    bh_ref/bf_ref: [SEG_BLK, 8, NSEQS] int32 tile-boundary rows (row 0 used;
                   8 rows only to satisfy tiling)
    """
    b = pl.program_id(1)
    seg = seg_ref[b]
    prev_seg = seg_ref[jnp.maximum(b - 1, 0)]
    is_start = jnp.logical_or(b == 0, seg != prev_seg)
    is_end = jnp.logical_or(b == nblocks - 1, seg_ref[b + 1] != seg)

    nt = qlen // TQ
    nseqs = db_ref.shape[1]

    @pl.when(is_start)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        e_ref[...] = jnp.full_like(e_ref, NEG_INF)
        s_ref[...] = jnp.zeros_like(s_ref)

    sym_iota = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (TQ, 1), 0)
    qr_vec = iota_r * R                          # local r * R
    f_off = Q + jnp.maximum(iota_r - 1, 0) * R   # Q + (r-1) R

    dblk = db_ref[...].astype(jnp.int32)
    oh_ref[...] = (dblk[:, None, :] == sym_iota[None, :, :1]).astype(jnp.int8)

    def tile_body(t, old_last):
        qpt_t = qpt_ref[0, t]                    # [TQ, 32] int8
        h = h_ref[t]
        e = e_ref[t]
        s = s_ref[t]
        # the next tile's j=0 diagonal needs this tile's pre-update last row
        new_old_last = h[TQ - 1:, :]

        first_tile = t == 0
        # bh_ref[j-1] must be the PREVIOUS tile's boundary, but this tile
        # overwrites bh_ref[j] as it goes — so read bh_ref[j] before the
        # overwrite and lag it one column in a register
        last_read = old_last
        for j in range(SEG_BLK):
            p = jax.lax.dot_general(
                qpt_t, oh_ref[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

            cur_bh = bh_ref[j, :1, :]
            diag0 = jnp.where(first_tile, 0, last_read)
            carry = jnp.where(first_tile, NEG_INF, bf_ref[j, :1, :])

            e = jnp.maximum(e - R, h - Q)
            hd = pltpu.roll(h, 1, axis=0)
            hd = jnp.where(iota_r == 0, diag0, hd)
            hnof = jnp.maximum(jnp.maximum(hd + p, e), 0)
            if clamp is not None:
                hnof = jnp.minimum(hnof, clamp)

            tacc = hnof + qr_vec
            for d in _scan_steps(TQ):
                td = pltpu.roll(tacc, d, axis=0)
                tacc = jnp.maximum(tacc, jnp.where(iota_r >= d, td, NEG_INF))
            f = pltpu.roll(tacc, 1, axis=0)
            f = jnp.where(iota_r == 0, NEG_INF, f) - f_off
            f = jnp.maximum(f, carry - qr_vec)

            h = jnp.maximum(hnof, f)
            if clamp is not None:
                h = jnp.minimum(h, clamp)
            s = jnp.maximum(s, h)

            # boundary rows for the next tile
            bh_ref[j, 0:1, :] = h[TQ - 1:, :]
            bf_ref[j, 0:1, :] = jnp.maximum(
                tacc[TQ - 1:, :] - (Q + (TQ - 1) * R), carry - TQ * R)
            last_read = cur_bh

        h_ref[t] = h
        e_ref[t] = e
        s_ref[t] = s
        return new_old_last

    jax.lax.fori_loop(0, nt, tile_body,
                      jnp.zeros((1, nseqs), jnp.int32))

    @pl.when(is_end)
    def _finish():
        smax = jnp.max(s_ref[...], axis=(0, 1))
        out_ref[0, 0, 0, :] = smax


@functools.partial(
    jax.jit,
    static_argnames=("nsegs", "gapopenextend", "gapextend", "clamp",
                     "interpret"),
)
def sw_scores_tiled(qpt: jax.Array, db: jax.Array, seg_ids: jax.Array,
                    *, nsegs: int, gapopenextend: int, gapextend: int,
                    clamp: int | None = None,
                    interpret: bool = False) -> jax.Array:
    """Same contract as sw_pallas.sw_scores_segmented (QLEN must be a
    multiple of TQ)."""
    nq, qlen, _ = qpt.shape
    L, nseqs = db.shape
    if L % SEG_BLK:
        raise ValueError(f"db length {L} not a multiple of {SEG_BLK}")
    if qlen % TQ:
        raise ValueError(f"qlen {qlen} not a multiple of TQ={TQ}")
    nblocks = L // SEG_BLK
    nt = qlen // TQ

    kernel = functools.partial(
        _tiled_kernel, Q=gapopenextend, R=gapextend, qlen=qlen,
        nblocks=nblocks, clamp=clamp)

    qpt_tiled = qpt.reshape(nq, nt, TQ, 32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nq, nblocks),
        in_specs=[
            pl.BlockSpec((1, nt, TQ, 32), lambda q, b, seg: (q, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEG_BLK, nseqs), lambda q, b, seg: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, nseqs),
                               lambda q, b, seg: (q, seg[b], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nt, TQ, nseqs), jnp.int32),
            pltpu.VMEM((nt, TQ, nseqs), jnp.int32),
            pltpu.VMEM((nt, TQ, nseqs), jnp.int32),
            pltpu.VMEM((SEG_BLK, 32, nseqs), jnp.int8),
            pltpu.VMEM((SEG_BLK, 8, nseqs), jnp.int32),
            pltpu.VMEM((SEG_BLK, 8, nseqs), jnp.int32),
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
    )(seg_ids, qpt_tiled, db)
    return out[:, :, 0, :]
