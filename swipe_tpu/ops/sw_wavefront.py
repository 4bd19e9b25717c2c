"""Anti-diagonal wavefront SW kernel: one query x ONE giant db sequence.

The stream kernel's parallel axis is the database-sequence lane — the
TPU translation of SWIPE's inter-sequence SIMD (README:1-2,
/root/reference/search7.cc) — so a single chromosome-scale sequence
occupies one lane of 1024 and runs at ~1/1024 of peak (the reference's
SSE lanes share this degeneracy: one sequence fills 1 of 16 channels).
This kernel instead parallelizes WITHIN the pair, something the
reference never does:

* the sequence is cut into strips of 1024 columns = 8 blocks of 128;
  block ``s`` of a strip lives in sublane ``s``, its 128 columns in the
  lane axis;
* rows advance as a wavefront: at macro step ``m``, sublane ``s``
  computes row ``m - s`` of its block — all 8 blocks run concurrently,
  one row apart, so every step updates 1024 DP cells with full-width
  VPU ops;
* the only cross-column recurrence inside a row (the db-gap chain E)
  is resolved with an in-lane prefix max (the lazy-E formulation — a
  gap opened from a gap-derived H in the same direction is never
  optimal, since gapopen >= 0 makes gapopenextend >= gapextend), seeded
  from the left block's boundary;
* inter-block boundaries (H/E of a block's column 127) ride one step
  behind in rolled export registers; the strip boundary (block 7 ->
  next strip's block 0) flows through a VMEM edge ring whose writes
  trail its reads by 7 rows, so one buffer serves consecutive strips;
* the per-block score profile is built once per (query, strip) as one
  [qlen, 32] x [32, 1024] int8 matmul on the MXU, then copied into a
  row-staggered layout so step ``m`` reads every block's correct row
  with a single dynamic-row access.

The edge ring and the running max are the ONLY cross-strip state, so
they thread through HBM between calls (like the carry kernels): callers
stream a chromosome as fixed-width segments under a handful of compiled
shapes (sw_wavefront_scores).  Exactness: same int32 recurrence as
ops.sw_stream, oracle-tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw_pallas import NEG_INF, PAD_SYMBOL

__all__ = ["sw_wavefront", "sw_wavefront_scores", "build_mq",
           "make_wavefront_state", "STRIP", "SEG_STRIPS"]

SUB = 8
BLK = 128
STRIP = SUB * BLK   # db columns in flight per strip
# segment width for sw_wavefront_scores: long sequences stream through
# equal segments (one compiled shape) plus a power-of-two-bucketed tail
SEG_STRIPS = 256


def build_mq(qcodes: np.ndarray, matrix8: np.ndarray) -> np.ndarray:
    """[NQ, QLEN, 32] int8 per-row score columns: mq[n, i] =
    matrix8[q_i].  PAD query rows pick matrix8[PAD] = all -128, so rows
    beyond a query's true length decay and never raise S."""
    return np.asarray(matrix8, dtype=np.int8)[np.asarray(qcodes)]


# edge-ring slot for row i is i + RING_OFF: the offset keeps every
# (possibly batched) ring write at a non-negative slot with no clamping
RING_OFF = 8
RING_PAD = 24


def make_wavefront_state(nq: int, qlen_pad: int):
    """Fresh cross-segment state (eh, ee, s): the strip-boundary edge
    ring (H and E of the rightmost column, by row) and the running max."""
    return (jnp.zeros((nq, qlen_pad + RING_PAD, BLK), jnp.int32),
            jnp.full((nq, qlen_pad + RING_PAD, BLK), NEG_INF, jnp.int32),
            jnp.zeros((nq, SUB, BLK), jnp.int32))


def _wavefront_kernel(mq_ref, db_ref, ehin_ref, eein_ref, sin_ref,
                      ehout_ref, eeout_ref, sout_ref,
                      qp_ref, qprofs_ref, eh_ref, ee_ref, s_ref, sub_ref,
                      z_ref, mask_ref, oh_ref, dma_sem, *, Q: int, R: int,
                      qlen_pad: int):
    qi = pl.program_id(0)
    strip = pl.program_id(1)
    nsteps = qlen_pad + SUB - 1
    T = 8                       # substeps per loop iteration (batched IO)

    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, BLK), 1)
    # the sublane iota round-trips through scratch: as a constant it is
    # lane-replicated, and Mosaic cannot relayout the select operands it
    # later meets ("invalid relayout {0,0} -> {0,*}"); a memory load
    # comes back in the concrete layout
    sub_ref[...] = jax.lax.broadcasted_iota(jnp.int32, (SUB, BLK), 0)
    sub = sub_ref[...]
    idxR = lane * R
    # prefix masks (0 where the rolled-in value is real, -inf where it
    # wrapped): stored then reloaded so the loop sees concrete layouts,
    # turning the prefix's select into a plain add
    KS = (1, 2, 4, 8, 16, 32, 64)
    for i, k in enumerate(KS):
        mask_ref[i] = jnp.where(lane >= k, 0, NEG_INF)

    @pl.when(strip == 0)
    def _load():
        cps = [pltpu.make_async_copy(ehin_ref.at[qi], eh_ref,
                                     dma_sem.at[0]),
               pltpu.make_async_copy(eein_ref.at[qi], ee_ref,
                                     dma_sem.at[1]),
               pltpu.make_async_copy(sin_ref.at[qi], s_ref,
                                     dma_sem.at[2])]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    # ---- per-strip profile: one MXU matmul + row-staggered copy -------------
    sym_iota = jax.lax.broadcasted_iota(jnp.int32, (32, 1, 1), 0)
    dblk = db_ref[0].astype(jnp.int32)                       # [SUB, BLK]
    oh_ref[...] = (dblk[None] == sym_iota).astype(jnp.int8)  # [32, SUB, BLK]
    qp_ref[...] = jax.lax.dot_general(
        mq_ref[0], oh_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                # [QLEN, SUB, BLK]
    for s in range(SUB):
        # block s's profile row i sits at staggered row i + s, so step m
        # reads rows (m - s) of every block as one [SUB, BLK] access
        qprofs_ref[s: s + qlen_pad, s, :] = qp_ref[:, s, :]

    mk = [mask_ref[i] for i in range(len(KS))]
    is0 = mk[0] < 0                         # lane-0 predicate, concrete

    def step(it, carry):
        h1, f1, ex1h, ex1e, ex2h, prev_eh, s = carry
        m0 = it * T
        # batched ring/profile IO: one dynamic-offset read per T substeps
        # (per-substep dynamic indexing dominated the unbatched kernel)
        ehrows = eh_ref[pl.ds(m0 + RING_OFF, T)]             # [T, BLK]
        eerows = ee_ref[pl.ds(m0 + RING_OFF, T)]
        Ps = qprofs_ref[pl.ds(m0, T)]                        # [T, SUB, BLK]
        weh, wee = [], []
        for t in range(T):
            eh = ehrows[t: t + 1]                            # [1, BLK]
            ee = eerows[t: t + 1]
            # left boundaries: blocks 1-7 from the neighbor's exports
            # (H/E one step back, H two steps back for the diagonal);
            # block 0 from the previous strip through the edge ring
            lbH = jnp.concatenate([eh, ex1h[: SUB - 1]], axis=0)
            lbE = jnp.concatenate([ee, ex1e[: SUB - 1]], axis=0)
            dinj = jnp.concatenate([prev_eh, ex2h[: SUB - 1]], axis=0)

            P = Ps[t]                                        # [SUB, BLK]
            diag = jnp.where(is0, dinj, pltpu.roll(h1, 1, 1))
            F = jnp.maximum(f1 - R, h1 - Q)
            hnoE = jnp.maximum(jnp.maximum(diag + P, F), 0)
            # lazy E via in-lane prefix max (rolled-in wraps are killed
            # by the -inf mask ADD), seeded by the left boundary
            lbv = jnp.maximum(lbE - R, lbH - Q)              # E at col 0
            B = hnoE + idxR
            for i, k in enumerate(KS):
                B = jnp.maximum(B, pltpu.roll(B, k, 1) + mk[i])
            Bs = pltpu.roll(B, 1, 1) + mk[0]
            E = jnp.maximum(Bs - (Q - R), lbv) - idxR
            H = jnp.maximum(hnoE, E)

            tloc = m0 + t - sub                              # [SUB, BLK]
            active = (tloc >= 0) & (tloc < qlen_pad)
            s = jnp.maximum(s, jnp.where(active, H, 0))
            # pre-active override: until its first row, a block's state
            # is the virtual row above the matrix (H = 0, E/F = -inf) so
            # the exports consumed at activation are exact boundaries
            live = tloc >= 0
            h1 = jnp.where(live, H, 0)
            En = jnp.where(live, E, NEG_INF)
            f1 = jnp.where(live, F, NEG_INF)

            weh.append(jnp.broadcast_to(h1[SUB - 1:SUB, BLK - 1:BLK],
                                        (1, BLK)))
            wee.append(jnp.broadcast_to(En[SUB - 1:SUB, BLK - 1:BLK],
                                        (1, BLK)))
            ex2h = ex1h
            ex1h = jnp.broadcast_to(h1[:, BLK - 1:BLK], (SUB, BLK))
            ex1e = jnp.broadcast_to(En[:, BLK - 1:BLK], (SUB, BLK))
            prev_eh = eh
        # strip-boundary ring: block 7's column-127 values by row; row i
        # lands at slot i + RING_OFF, written T at a time.  Substep t
        # writes row m0+t-7 -> slot m0+t+1, so the batch touches
        # [m0+1, m0+T] — at or below this iteration's read base m0+8,
        # and the one shared slot was read (previous strip) first
        eh_ref[pl.ds(m0 + 1, T)] = jnp.concatenate(weh, axis=0)
        ee_ref[pl.ds(m0 + 1, T)] = jnp.concatenate(wee, axis=0)
        return h1, f1, ex1h, ex1e, ex2h, prev_eh, s

    # loop-carry inits derive from a memory load so they enter the scan
    # in the concrete vector layout: splat-constant inits (even x*0,
    # which canonicalizes back to a splat) make Mosaic try to relayout
    # the loop body's values back INTO replicated form
    z_ref[...] = jnp.zeros_like(z_ref)
    z = z_ref[...]
    negc = z + NEG_INF
    carry = (z, negc, z, negc, z, z[0:1], s_ref[...])
    carry = jax.lax.fori_loop(0, -(-nsteps // T), step, carry)
    s_ref[...] = carry[-1]

    @pl.when(strip == pl.num_programs(1) - 1)
    def _store():
        cps = [pltpu.make_async_copy(eh_ref, ehout_ref.at[qi],
                                     dma_sem.at[0]),
               pltpu.make_async_copy(ee_ref, eeout_ref.at[qi],
                                     dma_sem.at[1]),
               pltpu.make_async_copy(s_ref, sout_ref.at[qi],
                                     dma_sem.at[2])]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("gapopenextend", "gapextend", "interpret"),
)
def sw_wavefront(mq: jax.Array, db: jax.Array, eh: jax.Array,
                 ee: jax.Array, s: jax.Array, *,
                 gapopenextend: int, gapextend: int,
                 interpret: bool = False):
    """Wavefront-score NQ queries against one segment of a db sequence.

    mq: [NQ, QLEN, 32] int8 (build_mq; QLEN a multiple of 8, <= 1024)
    db: [L] int8 segment, PAD_SYMBOL-padded to a 1024 multiple
    eh/ee/s: cross-segment state from make_wavefront_state (thread the
    returned state into the next segment of the same sequence)
    Returns (eh', ee', s'); the running scores are s'.max(axis=(1, 2)).
    """
    nq, qlen_pad, _ = mq.shape
    L, = db.shape
    if L % STRIP:
        raise ValueError(f"db length {L} not a multiple of {STRIP}")
    if qlen_pad % SUB or qlen_pad > 1024:
        raise ValueError(f"qlen_pad {qlen_pad} must be a multiple of "
                         f"{SUB} and <= 1024")
    nstrips = L // STRIP
    # column c of a strip -> (sublane c // 128, lane c % 128)
    dbs = db.reshape(nstrips, SUB, BLK)

    kernel = functools.partial(_wavefront_kernel, Q=gapopenextend,
                               R=gapextend, qlen_pad=qlen_pad)
    eh2, ee2, s2 = pl.pallas_call(
        kernel,
        grid=(nq, nstrips),
        in_specs=[
            pl.BlockSpec((1, qlen_pad, 32), lambda q, st: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, BLK), lambda q, st: (st, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, qlen_pad + RING_PAD, BLK),
                                 jnp.int32),
            jax.ShapeDtypeStruct((nq, qlen_pad + RING_PAD, BLK),
                                 jnp.int32),
            jax.ShapeDtypeStruct((nq, SUB, BLK), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qlen_pad, SUB, BLK), jnp.int32),
            pltpu.VMEM((qlen_pad + SUB, SUB, BLK), jnp.int32),
            pltpu.VMEM((qlen_pad + RING_PAD, BLK), jnp.int32),
            pltpu.VMEM((qlen_pad + RING_PAD, BLK), jnp.int32),
            pltpu.VMEM((SUB, BLK), jnp.int32),
            pltpu.VMEM((SUB, BLK), jnp.int32),
            pltpu.VMEM((SUB, BLK), jnp.int32),
            pltpu.VMEM((7, SUB, BLK), jnp.int32),
            pltpu.VMEM((32, SUB, BLK), jnp.int8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(mq, dbs, eh, ee, s)
    return eh2, ee2, s2


def sw_wavefront_scores(mq, seq: np.ndarray, *, gapopenextend: int,
                        gapextend: int, interpret: bool = False
                        ) -> jax.Array:
    """[NQ] int32 scores of NQ queries vs one unbounded-length sequence.

    Streams the sequence through SEG_STRIPS-wide segments (one compiled
    shape) with the edge-ring state threaded between them; the tail
    segment is bucketed to power-of-two strips, so arbitrary chromosome
    lengths reuse a handful of compiled programs.
    """
    nq, qlen_pad, _ = mq.shape
    seq = np.asarray(seq, dtype=np.int8)
    eh, ee, s = make_wavefront_state(nq, qlen_pad)
    segw = SEG_STRIPS * STRIP
    pos = 0
    while pos < len(seq):
        piece = seq[pos: pos + segw]
        pos += len(piece)
        if len(piece) == segw:
            L = segw
        else:
            nst = 1
            while nst * STRIP < len(piece):
                nst *= 2
            L = nst * STRIP
        db = np.full(L, PAD_SYMBOL, np.int8)
        db[: len(piece)] = piece
        eh, ee, s = sw_wavefront(mq, jnp.asarray(db), eh, ee, s,
                                 gapopenextend=gapopenextend,
                                 gapextend=gapextend, interpret=interpret)
    return s.max(axis=(1, 2))
