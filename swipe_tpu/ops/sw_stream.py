"""Row-streamed Pallas SW kernel with lane-level sequence refill.

This is the closest TPU analog of the reference's inner loop and channel
machine (/root/reference/search7.cc:585-645, lane refill :830-957):
database columns stream through the kernel and query rows are walked
*sequentially*, so the query-gap chain F resolves by iteration order — no
prefix-max scan.  Where SWIPE packs 16 database sequences into one SSE
register and refills a lane the moment its sequence ends, this kernel
packs 8x128xG sequences into the (sublane, lane) axes of the VPU and
refills lanes at db-block granularity: the packer (batching.pack_stream)
concatenates sequences per lane, and a per-(block, lane) start mask resets
that lane's H/E/S state in-kernel — SWIPE's ``domasked`` trick
(search7.cc:671-753) with the mask streamed instead of computed.

One vector op updates 1024*G DP cells with the same ~11-op recurrence the
reference's ONESTEP runs:

    F = max(F_up - R, H_up - Q)        (query-gap chain, along rows)
    E = max(E_left - R, H_left - Q)    (db-gap chain, along columns)
    H = max(diag + profile, E, F, 0)
    S = max(S, H)

The per-block score profile ("dprofile", search7.cc:36-174) is built once
per (query, block) with one one-hot matmul on the MXU:
    dprof[sym, j, g, l] = matrix[sym, db[j, g, l]]
and each row step r loads dprof[q[r], j] — a [8, 128] vector — by scalar
index, mirroring SWIPE's qtable indirection (swipe.cc:1259-1266).

Per-query state: H/E of the last processed column for every query row
([QLEN, 8, NL] each — the ``hearray`` of swipe.cc:1240) plus the previous
row's H/F per in-flight column.  After every block the kernel dumps the
running per-lane maxima S; a lane's sequence score is S at its final
block, recovered with one device-side gather (gather_scores).

Arithmetic is exact int32 by default; ``clamp`` reproduces the saturating
lower tiers of the reference's 7->16->63-bit cascade.

Why there is no narrow-precision tier (the reference's core speed trick,
search7.cc/search16.cc): the TPU v5 VPU exposes no sub-32-bit vector
compare — Mosaic fails to legalize both int16 ``maximum`` ('arith.maxsi')
and int16 compare+select ("Target does not support this comparison", both
measured on a v5e chip) — so an int8/int16 DP tier cannot run at packed
density and a single exact int32 pass is the fastest formulation.  The
cascade survives only as tier *accounting* (pipeline._count_tiers) and the
optional ``clamp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw_pallas import NEG_INF, PAD_SYMBOL

__all__ = ["sw_scores_stream", "sw_scores_stream_lax", "gather_scores",
           "build_matrix8", "build_qcodes", "KSEG", "SUB",
           "sw_scores_stream_carry", "sw_scores_stream_lax_carry",
           "make_stream_state", "make_stream_state_lax", "is_megacore",
           "sw_hint_stream", "sw_scores_stream_carry_long",
           "make_stream_state_long", "permute_stream_state",
           "build_dprofile_series"]

KSEG = 16   # db columns per grid block = lane-refill granularity
SUB = 8     # sublane fold: packed lane i -> (sublane i // NL, lane i % NL)
RU = 4      # query rows per inner step (amortizes row-state VMEM traffic)
# dprofile element type.  int32 loads full-tile; int16 halves the
# profile's VMEM (the largest scratch at 2048 lanes) at the cost of a
# half-tile (16-sublane tiling) row load + a widen per cell — a knob for
# VMEM-starved variants (e.g. KSEG=32), measured via tools/mfu_stream.py.
DPROF_DTYPE = jnp.int32
# measurement-only (tools/mfu_stream.py --nodprof): skip the per-block
# dprofile build to attribute the fixed per-block cost between profile
# construction and grid/loop overhead.  Results are WRONG when set.
_SKIP_DPROF = False


def build_matrix8(matrix: np.ndarray) -> np.ndarray:
    """[32, 32] int8 score matrix with the PAD row/column forced to -128."""
    m = np.asarray(matrix, dtype=np.int64)
    if m.min() < -128 or m.max() > 127:
        raise ValueError("score matrix must fit int8 for the TPU kernel")
    m8 = m.astype(np.int8).copy()
    m8[PAD_SYMBOL, :] = -128
    m8[:, PAD_SYMBOL] = -128
    return m8


def build_matrix_wide(matrix: np.ndarray) -> np.ndarray:
    """[32, 32] int32 matrix for the lax twins when scores exceed int8:
    the PAD row/column only needs to be strictly negative (padding can
    then never raise the running max; see _stream_lax_core)."""
    m = np.asarray(matrix, dtype=np.int64).reshape(32, 32)
    m32 = m.astype(np.int32).copy()
    pad = int(min(m.min(), -1))
    m32[PAD_SYMBOL, :] = pad
    m32[:, PAD_SYMBOL] = pad
    return m32


def build_qcodes(queries: list[np.ndarray], qlen_pad: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """([NQ, qlen_pad] int32 codes, [NQ] int32 lengths) for the kernel."""
    nq = len(queries)
    qc = np.full((nq, qlen_pad), PAD_SYMBOL, dtype=np.int32)
    ql = np.zeros((nq,), dtype=np.int32)
    for n, q in enumerate(queries):
        L = len(q)
        if L > qlen_pad:
            raise ValueError(f"query {n} longer than qlen_pad ({L})")
        qc[n, :L] = np.asarray(q, dtype=np.int32)
        ql[n] = L
    return qc, ql


def _build_dprofile(m8_ref, db_ref, dprof_ref):
    """Block score profile via a one-hot int8 MXU matmul — the TPU
    equivalent of the reference's dprofile_fill7/shuffle7 builders
    (search7.cc:50-51, 185-186).  The one-hot feeds dot_general
    directly: staging it through an int8 VMEM scratch was slightly
    faster per block, but the scratch's 1 MB is what lets PAIRED
    members at qlen_pad 256 (the config-4 shape) fit the 16 MB budget
    — worth far more (+28% measured from pairing).

    dprof_ref keeps the matmul's own [32, KSEG*SUB, NL] shape — column
    j's (SUB, NL) plane is the static sublane slice j*SUB:(j+1)*SUB —
    because reshaping to [32, KSEG, SUB, NL] forced Mosaic to relayout
    the multi-MB result every block (measured: the dominant per-block
    fixed cost for short queries).

    The profile stays int32: an int8 profile was measured ~18% SLOWER —
    the row loop's (SUB, NL) loads are quarter-tile for int8 (32-sublane
    tiling) and the per-cell widening adds an op — so its 4x VMEM saving
    is not worth it."""
    if _SKIP_DPROF:                       # timing probe only (see flag)
        return
    sym_iota = jax.lax.broadcasted_iota(jnp.int32, (32, 1, 1), 0)
    dblk = db_ref[...].astype(jnp.int32)                # [KSEG*SUB, NL]
    oh = (dblk[None, :, :] == sym_iota).astype(jnp.int8)
    prof = jax.lax.dot_general(
        m8_ref[...], oh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dprof_ref[...] = prof if dprof_ref.dtype == jnp.int32 \
        else prof.astype(dprof_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "dtype"))
def build_dprofile_series(matrix8: jax.Array, db: jax.Array, *,
                          interpret: bool = False,
                          dtype=None) -> jax.Array:
    """Precompute EVERY block's score profile of a chunk into HBM.

    The dprofile depends only on the database block — never on the
    query — yet the inline build costs ~6.5 us per (query, block) on a
    v5e (measured round 3: the batch kernel runs at 246 GCUPS with the
    build and 326 without at qlen 200, i.e. 97.8%% of the 2-chain VPU
    ceiling once the build is gone).  Building the whole chunk's
    profiles ONCE here and streaming them into the scoring kernels
    (``dprof=`` argument) recovers the reference's economics — SWIPE
    pays dprofile_fill once per 64 db symbols regardless of query count
    (/root/reference/search7.cc:50-51) — across the whole query batch
    AND across chunks a search revisits.

    Returns [nblocks, 32, KSEG*SUB, nl] for db [L, nseqs]; sized ~128x
    the chunk's bytes (int32), so callers budget HBM windows
    (a 2048-lane block is 4.2 MB; scoring overlaps the per-block DMA
    with ~20 us of row-loop compute, so the stream stays hidden).

    ``dtype`` (default DPROF_DTYPE = int32) selects the profile element
    type.  int16 halves both the HBM footprint and the kernel's
    double-buffered VMEM input (2 x 4.2 MB -> 2 x 2.1 MB at 2048 lanes)
    — the headroom that lets MEMBER-INTERLEAVED kernels fit their
    doubled H/E row state — at the cost of a half-tile (16-sublane
    tiling) row load plus one widen per cell.  Scores always fit:
    profile entries are int8 matrix values.
    """
    if dtype is None:
        dtype = DPROF_DTYPE
    L, nseqs = db.shape
    if L % KSEG:
        raise ValueError(f"db length {L} not a multiple of {KSEG}")
    nl = nseqs // SUB
    nblocks = L // KSEG
    db8 = db.reshape(L, SUB, nl).reshape(L * SUB, nl)

    def kern(m8_ref, db_ref, out_ref):
        _build_dprofile(m8_ref, db_ref, out_ref)

    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((32, 32), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KSEG * SUB, nl), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 32, KSEG * SUB, nl),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, 32, KSEG * SUB, nl),
                                       dtype),
        interpret=interpret,
    )(matrix8, db8)


def _scoring_cell(clamp):
    """Per-cell hook of the scoring kernels: saturate (16-bit-tier
    compatibility mode) and fold the running max."""
    def cell(h, rbase, k, j, s):
        if clamp is not None:
            h = jnp.minimum(h, clamp)
        return h, jnp.maximum(s, h)
    return cell


def _make_row_body_multi(qc_ref, hst_ref, est_ref, hrow_ref, frow_ref,
                         dprof_ref, *, members, reset, Q, R, cell,
                         member_axis, ru=RU):
    """The shared RU-blocked, pre-advanced-E/F stream recurrence, over
    one or more INTERLEAVED query members.

    Every stream kernel runs this same inner loop: RU query rows per
    fori_loop step so the dprofile/hrow/frow traffic amortizes over the
    row group (the blocking SWIPE's ONESTEP macro does 2 rows at a time,
    search7.cc:623-645), with E and F stored pre-advanced into the next
    cell so the shared H-Q term is subtracted once (search7.cc:585-595).
    Rows beyond a member's qlen see the PAD profile and decay.

    ``members`` is a list of (qi, qoff, soff) tuples of INDEPENDENT
    queries whose recurrences interleave cell by cell: the DP dependency
    chain is latency-bound on the VPU (measured ~1.0/3.4/4.4 Tops/s of
    chained int32 max/add at 1/2/4 independent chains on v5e), so M
    members x (NL/128) vregs of independent work per cell keeps the ALUs
    fed — the batch-throughput analog of SWIPE running one query per
    hardware thread.  A member's query symbol reads qc_ref[qi, qoff+row]
    and its H/E state lives at soff + row (the grouped kernel packs
    members at soff = member * qlen_pad; the tiled kernels read query
    rows at qoff = tile * tile_rows; static zero offsets fold away at
    trace time).  reset is the start-mask lane reset; None skips it (the
    hint kernel holds one whole sequence per lane).  With
    ``member_axis`` the hrow/frow scratch carries a leading member axis
    ([M, KSEG, SUB, NL]).

    Returns a fori_loop body whose carry is a TUPLE of (diag0, acc) per
    member: diag0 is the previous block's last-row H at the previous
    column; ``acc`` threads the caller's accumulator through the
    per-cell hook ``cell(h, rbase, k, col, acc) -> (h', acc')`` (scoring
    kernels clamp and fold the running max; the hint kernel updates its
    column-max/row scratch at query row rbase + k).
    """
    M = len(members)

    def at(mi, j):
        return (mi, j) if member_axis else j

    def row_body(rb, carry):
        rbase = rb * ru
        bases, qsyms, olds, ehat, diag, accs = [], [], [], [], [], []
        for mi, (qi, qoff, soff) in enumerate(members):
            base = rbase if isinstance(soff, int) and soff == 0 \
                else soff + rbase
            qb = rbase if isinstance(qoff, int) and qoff == 0 \
                else qoff + rbase
            bases.append(base)
            qsyms.append([qc_ref[qi, qb + k] for k in range(ru)])
            if reset is None:
                ho = [hst_ref[base + k] for k in range(ru)]
                eh = [est_ref[base + k] for k in range(ru)]
            else:
                ho = [jnp.where(reset, 0, hst_ref[base + k])
                      for k in range(ru)]
                eh = [jnp.where(reset, NEG_INF, est_ref[base + k])
                      for k in range(ru)]
            d0, acc = carry[mi]
            olds.append(ho)
            ehat.append(eh)
            diag.append([d0] + ho[: ru - 1])
            accs.append(acc)
        hs = [list(o) for o in olds]
        for j in range(KSEG):
            hprev = [hrow_ref[at(mi, j)] for mi in range(M)]
            fh = [frow_ref[at(mi, j)] for mi in range(M)]
            hs = [[] for _ in range(M)]
            for k in range(ru):
                for mi in range(M):
                    p = dprof_ref[qsyms[mi][k], j * SUB:(j + 1) * SUB]
                    if p.dtype != jnp.int32:
                        p = p.astype(jnp.int32)
                    h = jnp.maximum(jnp.maximum(diag[mi][k] + p, 0),
                                    jnp.maximum(ehat[mi][k], fh[mi]))
                    h, accs[mi] = cell(h, rbase, k, j, accs[mi])
                    hq = h - Q
                    ehat[mi][k] = jnp.maximum(ehat[mi][k] - R, hq)
                    fh[mi] = jnp.maximum(fh[mi] - R, hq)
                    hs[mi].append(h)
            for mi in range(M):
                hrow_ref[at(mi, j)] = hs[mi][-1]
                frow_ref[at(mi, j)] = fh[mi]
                diag[mi] = [hprev[mi]] + hs[mi][: ru - 1]
        for mi in range(M):
            for k in range(ru):
                hst_ref[bases[mi] + k] = hs[mi][k]
                est_ref[bases[mi] + k] = ehat[mi][k]
        return tuple((olds[mi][ru - 1], accs[mi]) for mi in range(M))

    return row_body


def _make_row_body(qc_ref, hst_ref, est_ref, hrow_ref, frow_ref, dprof_ref,
                   *, qi, qoff, soff, reset, Q, R, cell):
    """Single-member form of _make_row_body_multi (the carry / tiled /
    hint kernels run one query per grid step); carry is one
    (diag0, acc) pair."""
    multi = _make_row_body_multi(
        qc_ref, hst_ref, est_ref, hrow_ref, frow_ref, dprof_ref,
        members=[(qi, qoff, soff)], reset=reset, Q=Q, R=R, cell=cell,
        member_axis=False)

    def row_body(rb, carry):
        return multi(rb, (carry,))[0]

    return row_body


def _stream_kernel_grouped(qc_ref, ql_ref, m8_ref, db_ref, start_ref,
                           *rest, Q: int, R: int, clamp: int | None,
                           qgroup: int, qlen_pad: int, minter: int,
                           dprof_in: bool = False):
    """One (query-group, db-block, member-tuple) grid step.

    The score profile ("dprofile") depends only on the db block — NOT on
    the query — so the grid iterates group members fastest and builds the
    profile once per (group, block), amortizing its cost over ``qgroup``
    queries (the reference pays dprofile_fill once per 64 db symbols
    regardless of query count, search7.cc:50-51; this recovers the same
    economics for short-query batches).  The members' H/E row states
    co-reside in one VMEM scratch of qgroup * qlen_pad rows.

    ``minter`` members run INTERLEAVED per grid step
    (_make_row_body_multi): their independent recurrences double the
    VPU's dependency chains — the DP is latency-bound, so pairing
    members approaches the 4-chain issue rate (see the chain-count
    measurements in _make_row_body_multi's docstring).  A pair shares
    the row loop's trip count (max of the two qlens; slots are
    length-bucketed so members match), and a shorter member's extra
    rows read the PAD profile and decay.
    """
    if dprof_in:
        (dprof_ref, out_ref, hst_ref, est_ref, hrow_ref, frow_ref,
         s_ref) = rest
    else:
        (out_ref, hst_ref, est_ref, hrow_ref, frow_ref, s_ref,
         dprof_ref) = rest
    gi = pl.program_id(0)
    b = pl.program_id(1)
    qp = pl.program_id(2)
    nl = db_ref.shape[1]
    g0 = qp * minter             # first member of this step in the group

    @pl.when((b == 0) & (qp == 0))
    def _init():
        hst_ref[...] = jnp.zeros_like(hst_ref)
        est_ref[...] = jnp.full_like(est_ref, NEG_INF)
        s_ref[...] = jnp.zeros_like(s_ref)

    if not dprof_in:
        # ---- dprofile: built once per (group, block), shared by members -----
        @pl.when(qp == 0)
        def _dprofile():
            _build_dprofile(m8_ref, db_ref, dprof_ref)

    reset = start_ref[0] != 0
    hrow_ref[...] = jnp.zeros_like(hrow_ref)
    frow_ref[...] = jnp.full_like(frow_ref, NEG_INF)

    qis = [gi * qgroup + g0 + mi for mi in range(minter)]
    members = [(qis[mi], 0, (g0 + mi) * qlen_pad) for mi in range(minter)]
    qlen = ql_ref[qis[0]]
    for mi in range(1, minter):
        qlen = jnp.maximum(qlen, ql_ref[qis[mi]])
    row_body = _make_row_body_multi(
        qc_ref, hst_ref, est_ref, hrow_ref, frow_ref, dprof_ref,
        members=members, reset=reset, Q=Q, R=R,
        cell=_scoring_cell(clamp), member_axis=True)
    nrb = (qlen + RU - 1) // RU
    init = tuple((jnp.zeros((SUB, nl), jnp.int32),
                  jnp.where(reset, 0, s_ref[g0 + mi]))
                 for mi in range(minter))
    final = jax.lax.fori_loop(0, nrb, row_body, init)
    for mi in range(minter):
        s = final[mi][1]
        s_ref[g0 + mi] = s
        out_ref[mi, 0] = s


def _stream_kernel(qc_ref, ql_ref, m8_ref, db_ref, start_ref, *rest,
                   Q: int, R: int, clamp: int | None,
                   dprof_in: bool = False, minter: int = 1,
                   qlen_pad: int = 0, ru: int = RU,
                   carry_in: bool = True, carry_out: bool = True):
    """One (query-tuple, db-block) grid step of the CARRY variant
    (sw_scores_stream_carry; the plain path uses _stream_kernel_grouped).

    With ``dprof_in`` the block profile arrives as a pipelined INPUT
    (build_dprofile_series) instead of being rebuilt per (query, block)
    — the build was the entire measured fixed cost (see
    build_dprofile_series).

    ``minter`` members (consecutive queries of the batch) run
    INTERLEAVED per grid step (_make_row_body_multi), sharing ONE pass
    over the chunk: a drain chunk's mandatory 1024-lane width is paid
    once per M queries of a stream instead of per query (the round-4
    flow-series amortization; the reference's refill machine never
    idles a lane, search7.cc:830-957, but its lanes are per-query too —
    this lever has no x86 analog).  Measured reality (BASELINE.md
    round-4 config table): the kernel saturates the VPU's 2-wide issue
    at 2048 lanes, so interleaving only pays on 1024-lane chunks
    (minter=2, +4.8% whole-series with the DMA trim) and regresses
    beyond minter x ru = 8 live row-states (register spills).

    db_ref:    [KSEG*SUB, NL] int8 — column j's symbols are rows j*8..j*8+7
    start_ref: [1, SUB, NL] int32 — 1 where the lane starts a new sequence
    out_ref:   [minter, 1, SUB, NL] int32 — per-lane running max per member
    hst/est:   [minter*QLEN, SUB, NL] int32 — H/E at the last column
    hrow/frow: [minter, KSEG, SUB, NL] int32 — previous row's H/F per column
    dprof_ref: [32, KSEG*SUB, NL] block score profile (int32 or int16)

    The per-lane DP state (H/E per query row + running S) enters and
    leaves through HBM instead of being zero-initialized: at block 0 it
    is DMA'd from hin/ein/sin [NQ, ...] into the VMEM scratch, and after
    the last block the scratch is DMA'd to hout/eout/sout.  This makes a
    chunk boundary invisible to the DP — the packer
    (batching.pack_stream_carry) cuts lanes mid-sequence and the cut
    columns continue in the next chunk of the series.
    """
    rest = list(rest)
    dprof_ref = rest.pop(0) if dprof_in else None
    if carry_in:
        hin_ref, ein_ref, sin_ref = rest[:3]
        rest = rest[3:]
    out_ref = rest.pop(0)
    if carry_out:
        hout_ref, eout_ref, sout_ref = rest[:3]
        rest = rest[3:]
    hst_ref, est_ref, hrow_ref, frow_ref, s_ref = rest[:5]
    rest = rest[5:]
    if not dprof_in:
        dprof_ref = rest.pop(0)
    dma_sem, = rest
    qp = pl.program_id(0)
    b = pl.program_id(1)
    nl = db_ref.shape[1]
    qis = [qp * minter + mi for mi in range(minter)]

    if carry_in:
        @pl.when(b == 0)
        def _load():
            cps = []
            for mi, qi in enumerate(qis):
                lo = mi * qlen_pad
                cps += [pltpu.make_async_copy(
                            hin_ref.at[qi],
                            hst_ref.at[lo:lo + qlen_pad] if minter > 1
                            else hst_ref, dma_sem.at[mi, 0]),
                        pltpu.make_async_copy(
                            ein_ref.at[qi],
                            est_ref.at[lo:lo + qlen_pad] if minter > 1
                            else est_ref, dma_sem.at[mi, 1]),
                        pltpu.make_async_copy(sin_ref.at[qi], s_ref.at[mi],
                                              dma_sem.at[mi, 2])]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
    else:
        # series head: fresh state initialized in VMEM — the caller
        # neither allocates nor streams HBM zeros (make_stream_state's
        # buffers and their DMA round trip are pure overhead for chunk 0)
        @pl.when(b == 0)
        def _fresh():
            hst_ref[...] = jnp.zeros_like(hst_ref)
            est_ref[...] = jnp.full_like(est_ref, NEG_INF)
            s_ref[...] = jnp.zeros_like(s_ref)

    # ---- dprofile: one-hot matmul on the MXU (unless streamed in) -----------
    if not dprof_in:
        _build_dprofile(m8_ref, db_ref, dprof_ref)

    # ---- lane refill: reset state where a new sequence starts ---------------
    reset = start_ref[0] != 0                               # [SUB, NL] bool
    hrow_ref[...] = jnp.zeros_like(hrow_ref)
    frow_ref[...] = jnp.full_like(frow_ref, NEG_INF)

    # members share the row-loop trip count (max qlen); a shorter
    # member's extra rows see the PAD profile and decay (every PAD-row H
    # descends from a real-row H minus positive penalties, so it can
    # never raise that member's running max or poison its carried state)
    qlen = ql_ref[qis[0]]
    for qi in qis[1:]:
        qlen = jnp.maximum(qlen, ql_ref[qi])
    members = [(qis[mi], 0, mi * qlen_pad) for mi in range(minter)]
    row_body = _make_row_body_multi(
        qc_ref, hst_ref, est_ref, hrow_ref, frow_ref, dprof_ref,
        members=members, reset=reset, Q=Q, R=R,
        cell=_scoring_cell(clamp), member_axis=True, ru=ru)
    nrb = (qlen + ru - 1) // ru
    init = tuple((jnp.zeros((SUB, nl), jnp.int32),
                  jnp.where(reset, 0, s_ref[mi]))
                 for mi in range(minter))
    final = jax.lax.fori_loop(0, nrb, row_body, init)
    for mi in range(minter):
        s_ref[mi] = final[mi][1]
        out_ref[mi, 0] = final[mi][1]

    if carry_out:
        @pl.when(b == pl.num_programs(1) - 1)
        def _store():
            cps = []
            for mi, qi in enumerate(qis):
                lo = mi * qlen_pad
                cps += [pltpu.make_async_copy(
                            hst_ref.at[lo:lo + qlen_pad] if minter > 1
                            else hst_ref,
                            hout_ref.at[qi], dma_sem.at[mi, 0]),
                        pltpu.make_async_copy(
                            est_ref.at[lo:lo + qlen_pad] if minter > 1
                            else est_ref,
                            eout_ref.at[qi], dma_sem.at[mi, 1]),
                        pltpu.make_async_copy(s_ref.at[mi], sout_ref.at[qi],
                                              dma_sem.at[mi, 2])]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()


def is_megacore() -> bool:
    """True when the attached TPU has 2 TensorCores per chip (v4/v5p):
    the stream kernel then marks its group axis "parallel" so Mosaic
    splits query groups across the cores (each core instantiates its own
    scratch).  Override with SWIPE_TPU_MEGACORE=0/1."""
    import os
    env = os.environ.get("SWIPE_TPU_MEGACORE")
    if env is not None:
        return env.strip().lower() in ("1", "true", "yes", "on")
    try:
        dev = jax.devices()[0]
        if getattr(dev, "num_cores", 1) > 1:
            return True
        kind = getattr(dev, "device_kind", "").lower()
        return "v4" in kind or "v5p" in kind or "v5 p" in kind
    except Exception:
        return False


@functools.partial(
    jax.jit,
    static_argnames=("gapopenextend", "gapextend", "clamp", "interpret",
                     "qgroup", "megacore"),
)
def sw_scores_stream(qcodes: jax.Array, qlens: jax.Array, matrix8: jax.Array,
                     db: jax.Array, start: jax.Array, *,
                     gapopenextend: int, gapextend: int,
                     clamp: int | None = None,
                     interpret: bool = False,
                     qgroup: int = 1,
                     megacore: bool = False,
                     dprof: jax.Array | None = None) -> jax.Array:
    """Score queries against a lane-packed db chunk (stream kernel).

    qcodes:  [NQ, QLEN] int32 query codes, PAD_SYMBOL padded (build_qcodes)
    qlens:   [NQ] int32 true query lengths
    matrix8: [32, 32] int8 score matrix (build_matrix8)
    db:      [L, NSEQS] int8 lane-packed chunk (batching.pack_stream);
             L a multiple of KSEG, NSEQS a multiple of 8*128
    start:   [L // KSEG, NSEQS] int8/int32 — 1 where a lane begins a new
             sequence at that block
    qgroup:  queries whose H/E states co-reside in VMEM and share one
             dprofile build per db block (the short-query amortization;
             qgroup * QLEN rows of state must fit the VMEM budget —
             callers size it from STREAM_CONFIGS caps).  Even qgroups
             additionally run members PAIRWISE-INTERLEAVED in the row
             loop (minter=2): two independent recurrences double the
             VPU's dependency chains (the DP is latency-bound — see
             _make_row_body_multi), the main batch-throughput lever
             WHEN the dprofile is built inline.
    dprof:   precomputed block profiles (build_dprofile_series),
             streamed per block instead of rebuilt per (group, block).
             The inline build is the kernel's whole measured fixed cost
             (~6.5 us/block at 2048 lanes), and most of qgroup pairing's
             historical +16% was really build amortization — with dprof
             streamed, qgroup=1 measures within ~4% of paired, and the
             pair's doubled H/E state no longer fits VMEM beside the
             profile blocks, so dprof callers use qgroup=1.
    Returns [NQ, L // KSEG, NSEQS] int32: each lane's running max score
    after every block; a sequence's score is the value at its end block
    (gather_scores).
    """
    nq, qlen_pad = qcodes.shape
    L, nseqs = db.shape
    if L % KSEG:
        raise ValueError(f"db length {L} not a multiple of {KSEG}")
    if nseqs % (SUB * 128):
        raise ValueError(f"NSEQS {nseqs} not a multiple of {SUB * 128}")
    if qlen_pad % RU:
        # the RU-unrolled row loop indexes qc/hst/est up to the next
        # multiple of RU
        raise ValueError(f"qlen_pad {qlen_pad} not a multiple of RU={RU}")
    ngroups = -(-nq // qgroup)
    nq_pad = ngroups * qgroup
    if nq_pad != nq:
        # pad with zero-length members (their row loop never runs)
        qcodes = jnp.concatenate(
            [qcodes, jnp.full((nq_pad - nq, qlen_pad), PAD_SYMBOL,
                              qcodes.dtype)], axis=0)
        qlens = jnp.concatenate(
            [qlens, jnp.zeros((nq_pad - nq,), qlens.dtype)], axis=0)
    nl = nseqs // SUB
    nblocks = L // KSEG
    # lane fold: packed lane i -> (sublane i // nl, lane i % nl); then merge
    # (column, sublane) so the db block is a cleanly tiled 2-D int8 array
    db8 = db.reshape(L, SUB, nl).reshape(L * SUB, nl)
    start32 = start.astype(jnp.int32).reshape(nblocks, SUB, nl)

    minter = 2 if qgroup % 2 == 0 else 1
    npairs = qgroup // minter
    if dprof is not None and dprof.shape != (nblocks, 32, KSEG * SUB, nl):
        raise ValueError(f"dprof shape {dprof.shape} != "
                         f"{(nblocks, 32, KSEG * SUB, nl)}")
    kernel = functools.partial(
        _stream_kernel_grouped, Q=gapopenextend, R=gapextend, clamp=clamp,
        qgroup=qgroup, qlen_pad=qlen_pad, minter=minter,
        dprof_in=dprof is not None)

    in_specs = [
        pl.BlockSpec((32, 32), lambda g, b, q, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((KSEG * SUB, nl), lambda g, b, q, *_: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, SUB, nl), lambda g, b, q, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [qcodes, qlens, matrix8, db8, start32]
    if dprof is not None:
        in_specs.append(pl.BlockSpec((None, 32, KSEG * SUB, nl),
                                     lambda g, b, q, *_: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(dprof)
    scratch = [
        pltpu.VMEM((qgroup * qlen_pad, SUB, nl), jnp.int32),
        pltpu.VMEM((qgroup * qlen_pad, SUB, nl), jnp.int32),
        pltpu.VMEM((minter, KSEG, SUB, nl), jnp.int32),
        pltpu.VMEM((minter, KSEG, SUB, nl), jnp.int32),
        pltpu.VMEM((qgroup, SUB, nl), jnp.int32),
    ]
    if dprof is None:
        scratch.append(pltpu.VMEM((32, KSEG * SUB, nl), DPROF_DTYPE))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ngroups, nblocks, npairs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (minter, 1, SUB, nl),
            lambda g, b, q, *_: (g * npairs + q, b, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq_pad, nblocks, SUB, nl),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(
            # db blocks carry H/E state and members share the block's
            # dprofile, so those axes are sequential.  Each GROUP's state
            # lifecycle is self-contained (init at its own b==0/qg==0
            # step), so the group axis is safely "parallel" on megacore
            # parts (v4/v5p): Mosaic splits groups across the two
            # TensorCores, each with its own scratch — ~2x batch
            # throughput (is_megacore; single-core chips keep it
            # sequential).
            dimension_semantics=(
                "parallel" if megacore else "arbitrary",
                "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    return out.reshape(nq_pad, nblocks, nseqs)[:nq]


def _pad_to_state_width(db, start, nseqs_state: int):
    """PAD-expand a compact carry chunk to the carry state's lane count.

    pack_stream_carry emits chunks holding only the used lanes so idle
    lanes never cross the host->device link; the kernels need the full
    state width, so the missing lanes are PAD-filled (and never reset by
    the start mask) on device.  Returns (db, start, nseqs)."""
    L, nseqs = db.shape
    if nseqs < nseqs_state:
        db = jnp.concatenate(
            [db, jnp.full((L, nseqs_state - nseqs), PAD_SYMBOL, db.dtype)],
            axis=1)
        start = jnp.concatenate(
            [start,
             jnp.zeros((start.shape[0], nseqs_state - nseqs), start.dtype)],
            axis=1)
        nseqs = nseqs_state
    return db, start, nseqs


def make_stream_state(nq: int, qlen_pad: int, nseqs: int):
    """Fresh (h, e, s) carry state for a pack_stream_carry series
    (the kernel layout: lane i -> (sublane i // nl, lane i % nl))."""
    nl = nseqs // SUB
    return (jnp.zeros((nq, qlen_pad, SUB, nl), jnp.int32),
            jnp.full((nq, qlen_pad, SUB, nl), NEG_INF, jnp.int32),
            jnp.zeros((nq, SUB, nl), jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("gapopenextend", "gapextend", "clamp", "interpret",
                     "minter", "ru", "carry_in", "carry_out"),
)
def sw_scores_stream_carry(qcodes: jax.Array, qlens: jax.Array,
                           matrix8: jax.Array, db: jax.Array,
                           start: jax.Array, h: jax.Array, e: jax.Array,
                           s: jax.Array, *, gapopenextend: int,
                           gapextend: int, clamp: int | None = None,
                           interpret: bool = False,
                           dprof: jax.Array | None = None,
                           minter: int = 1, ru: int = RU,
                           carry_in: bool = True,
                           carry_out: bool = True):
    """sw_scores_stream over ONE chunk of a pack_stream_carry series.

    h/e: [NQ, QLEN, SUB, NL] int32, s: [NQ, SUB, NL] int32 — the per-lane
    DP state left by the previous chunk (make_stream_state for the first).
    Returns (scores [NQ, nblocks, NSEQS], h', e', s'); thread the state
    into the next chunk of the series.  Lane resets still come from the
    start mask, so lanes that begin a new sequence at a chunk boundary
    ignore the carried state — only cut (continuing) lanes consume it.

    ``db``/``start`` may be narrower than the state's lane count (compact
    chunks from pack_stream_carry): the missing lanes are PAD-filled on
    device, so idle lanes never cross the host->device link.

    ``dprof``: this chunk's precomputed block profiles
    (build_dprofile_series, built at the STATE's lane width) — streamed
    per block instead of rebuilt per (query, block); the build is the
    kernel's entire measured fixed cost, so passing it lifts the
    single-query rate to ~98% of the VPU ceiling.

    ``carry_in``/``carry_out``: series-head and series-tail launches can
    skip the state DMA: with ``carry_in=False`` the kernel initializes
    fresh state in VMEM (h/e/s are still passed for SHAPE but never read
    — under jit their creation is dead code and is elided), and with
    ``carry_out=False`` no state leaves the chip (the returned state is
    the INPUT state, unchanged — do not thread it further).

    ``minter``: interleave this many consecutive queries per grid step
    (NQ must be a multiple); a flow series' drain chunks (mandatory
    1024-lane width for a handful of tail chains) are then walked once
    per minter queries instead of once per query.  Use minter=2 on
    1024-lane chunks only: at 2048 lanes the kernel already saturates
    the VPU's 2-wide issue and interleaving measured NEGATIVE, and
    minter x ru > 8 live row-states spills registers (round-4 config
    table, BASELINE.md).  VMEM: the H/E scratch scales with
    minter x qlen_pad rows; at 2048 lanes an int16 ``dprof`` halves the
    profile buffers to make room, costing a widen + half-tile load
    (~5% unpaired).
    """
    nq, qlen_pad = qcodes.shape
    if nq % minter:
        raise ValueError(f"NQ {nq} not a multiple of minter={minter}")
    db, start, nseqs = _pad_to_state_width(db, start,
                                           h.shape[2] * h.shape[3])
    L = db.shape[0]
    if L % KSEG:
        raise ValueError(f"db length {L} not a multiple of {KSEG}")
    if nseqs % (SUB * 128):
        raise ValueError(f"NSEQS {nseqs} not a multiple of {SUB * 128}")
    if qlen_pad % ru:
        raise ValueError(f"qlen_pad {qlen_pad} not a multiple of ru={ru}")
    nl = nseqs // SUB
    nblocks = L // KSEG
    db8 = db.reshape(L, SUB, nl).reshape(L * SUB, nl)
    start32 = start.astype(jnp.int32).reshape(nblocks, SUB, nl)
    if dprof is not None and dprof.shape != (nblocks, 32, KSEG * SUB, nl):
        raise ValueError(f"dprof shape {dprof.shape} != "
                         f"{(nblocks, 32, KSEG * SUB, nl)}")

    kernel = functools.partial(
        _stream_kernel, Q=gapopenextend, R=gapextend, clamp=clamp,
        dprof_in=dprof is not None, minter=minter, qlen_pad=qlen_pad,
        ru=ru, carry_in=carry_in, carry_out=carry_out)

    in_specs = [
        pl.BlockSpec((32, 32), lambda q, b, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((KSEG * SUB, nl), lambda q, b, *_: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, SUB, nl), lambda q, b, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [qcodes, qlens, matrix8, db8, start32]
    if dprof is not None:
        in_specs.append(pl.BlockSpec((None, 32, KSEG * SUB, nl),
                                     lambda q, b, *_: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(dprof)
    # carry state stays in HBM; the kernel DMAs it into the same
    # VMEM scratch the non-carry kernel zero-initializes
    if carry_in:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 3
        inputs += [h, e, s]
    scratch = [
        pltpu.VMEM((minter * qlen_pad, SUB, nl), jnp.int32),
        pltpu.VMEM((minter * qlen_pad, SUB, nl), jnp.int32),
        pltpu.VMEM((minter, KSEG, SUB, nl), jnp.int32),
        pltpu.VMEM((minter, KSEG, SUB, nl), jnp.int32),
        pltpu.VMEM((minter, SUB, nl), jnp.int32),
    ]
    if dprof is None:
        scratch.append(pltpu.VMEM((32, KSEG * SUB, nl), DPROF_DTYPE))
    scratch.append(pltpu.SemaphoreType.DMA((minter, 3)))

    out_specs = [pl.BlockSpec((minter, 1, SUB, nl),
                              lambda q, b, *_: (q, b, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((nq, nblocks, SUB, nl), jnp.int32)]
    if carry_out:
        out_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 3
        out_shape += [
            jax.ShapeDtypeStruct((nq, qlen_pad, SUB, nl), jnp.int32),
            jax.ShapeDtypeStruct((nq, qlen_pad, SUB, nl), jnp.int32),
            jax.ShapeDtypeStruct((nq, SUB, nl), jnp.int32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq // minter, nblocks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    if carry_out:
        out, h2, e2, s2 = res
    else:
        out, h2, e2, s2 = res[0], h, e, s
    return out.reshape(nq, nblocks, nseqs), h2, e2, s2


@jax.jit
def permute_stream_state(h: jax.Array, e: jax.Array, s: jax.Array,
                         carry_src: jax.Array):
    """Gather a carry state across lanes by FlowChunk.carry_src.

    Between two chunks of a FLOW series (batching.pack_stream_flow) a cut
    sequence may continue on a different lane; this reindexes the carried
    per-lane DP state so lane i of the next launch holds the state of
    lane carry_src[i].  Fresh lanes (carry_src < 0) receive lane 0's
    state, which the next chunk's block-0 start mask discards anyway.
    Accepts both the kernel layout (h/e [NQ, QLEN, SUB, NL], lane
    i <-> (i // NL, i % NL)) and the lax twin's [NQ, QLEN, NSEQS].
    The output's lane count is ``len(carry_src)`` — drain chunks narrow
    the state by passing a shorter carry_src.
    """
    src = jnp.where(carry_src < 0, 0, carry_src)

    def g(x, kern):
        if kern:   # kernel layout [..., SUB, NL] -> flat lane axis
            shape = x.shape
            x = x.reshape(*shape[:-2], shape[-2] * shape[-1])
            return x[..., src].reshape(*shape[:-2], SUB, -1)
        return x[..., src]

    kern = h.ndim == 4
    return g(h, kern), g(e, kern), g(s, kern)


@jax.jit
def gather_scores(out: jax.Array, end_block: jax.Array, lane: jax.Array
                  ) -> jax.Array:
    """[NQ, nseq] scores from the per-block dump (device-side gather).

    out: [NQ, nblocks, NSEQS] from sw_scores_stream; end_block/lane: [nseq]
    int32 per-sequence coordinates from batching.pack_stream.
    """
    return out[:, end_block, lane]


def _hint_kernel(qc_ref, ql_ref, m8_ref, db_ref, st_ref,
                 s_out, bq_out, bp_out,
                 hst_ref, est_ref, hrow_ref, frow_ref,
                 cm_ref, ra_ref, s_ref, bq_ref, bp_ref,
                 dprof_ref, *, Q: int, R: int):
    """One db-block step of the endpoint-hint kernel (search16s analog).

    Same DP recurrence as _stream_kernel over one query and one sequence
    per lane (no refill), plus endpoint tracking with the reference's
    exact tie semantics (/root/reference/search16s.cc:397-404,523-530):
    per column, cm/ra record the column max H and the SMALLEST row
    attaining it (strict-greater update); after the row walk the block's
    columns are folded into (S, bestq, bestpos) in ascending column
    order, improving only on a strict running-max increase — so bestpos
    is the first column attaining the final maximum.

    st_ref carries a per-lane first-tracked column: columns before it
    warm the DP state up but never update (S, bestq, bestpos) — the
    owned-column mask of the segmented chromosome-scale hint route
    (ops.align_hint.hint_endpoints_many).

    Columns past a lane's sequence end need no masking: H there is
    bounded by an earlier H minus a positive gap penalty (or 0), so the
    strict colmax > S test can never fire.
    """
    qi = pl.program_id(0)
    b = pl.program_id(1)
    nl = db_ref.shape[2]

    @pl.when(b == 0)
    def _init():
        hst_ref[...] = jnp.zeros_like(hst_ref)
        est_ref[...] = jnp.full_like(est_ref, NEG_INF)
        s_ref[...] = jnp.zeros_like(s_ref)
        bq_ref[...] = jnp.full_like(bq_ref, -1)
        bp_ref[...] = jnp.zeros_like(bp_ref)

    _build_dprofile(m8_ref, db_ref.at[0], dprof_ref)

    hrow_ref[...] = jnp.zeros_like(hrow_ref)
    frow_ref[...] = jnp.full_like(frow_ref, NEG_INF)
    cm_ref[...] = jnp.zeros_like(cm_ref)
    ra_ref[...] = jnp.zeros_like(ra_ref)

    qlen = ql_ref[qi]

    def hint_cell(h, rbase, k, j, acc):
        # rows past qlen (the RU round-up overhang) must not win the
        # column max: their PAD score is only -128, so with
        # gapopenextend > 128 an overhang diag step could beat the real
        # rows at a segmented lane's first owned column
        upd = (h > cm_ref[j]) & (rbase + k < qlen)
        cm_ref[j] = jnp.where(upd, h, cm_ref[j])
        ra_ref[j] = jnp.where(upd, rbase + k, ra_ref[j])
        return h, acc

    row_body = _make_row_body(
        qc_ref, hst_ref, est_ref, hrow_ref, frow_ref, dprof_ref,
        qi=qi, qoff=0, soff=0, reset=None, Q=Q, R=R, cell=hint_cell)
    nrb = (qlen + RU - 1) // RU
    jax.lax.fori_loop(0, nrb, row_body,
                      (jnp.zeros((SUB, nl), jnp.int32), jnp.int32(0)))

    for j in range(KSEG):
        improve = ((cm_ref[j] > s_ref[...])
                   & (b * KSEG + j >= st_ref[0]))
        s_ref[...] = jnp.where(improve, cm_ref[j], s_ref[...])
        bp_ref[...] = jnp.where(improve, b * KSEG + j, bp_ref[...])
        bq_ref[...] = jnp.where(improve, ra_ref[j], bq_ref[...])

    @pl.when(b == pl.num_programs(1) - 1)
    def _emit():
        s_out[0] = s_ref[...]
        bq_out[0] = bq_ref[...]
        bp_out[0] = bp_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=("gapopenextend", "gapextend", "interpret"),
)
def sw_hint_stream(qcodes: jax.Array, qlens: jax.Array, matrix8: jax.Array,
                   db: jax.Array, starts: jax.Array, *,
                   gapopenextend: int, gapextend: int,
                   interpret: bool = False):
    """Endpoint hints for a BATCH of queries, each vs its own lane pack.

    qcodes: [NQ, QLEN] int32 (build_qcodes), qlens: [NQ] int32,
    matrix8: [32, 32] int8, db: [NQ, L, NSEQS] int8 — query q's subject
    i in lane (q, i), PAD_SYMBOL padded (no refill; one sequence per
    lane); a 2-D [L, NSEQS] db is accepted for NQ == 1.  starts:
    [NQ, NSEQS] (or [NSEQS] for NQ == 1) int32 per-lane first-tracked
    column (zeros for whole sequences; the owned-column offset for
    segmented giant subjects).  Returns (S, bestq, bestpos), each
    [NQ, NSEQS] int32 (squeezed to [NSEQS] for 2-D input), with
    search16s tie semantics: bestpos = first db column attaining the
    final maximum, bestq = smallest query row attaining it there;
    bestq = -1 when the lane never scores above 0.  The query grid axis
    lets a whole align phase (all queries x all bins) run in O(1)
    dispatches instead of one per (query, bin) — each dispatch pays the
    remote tunnel's latency (align_hint.hint_endpoints_grid).
    """
    squeeze = db.ndim == 2
    if squeeze:
        db = db[None]
        starts = starts[None]
    nq, qlen_pad = qcodes.shape
    nqd, L, nseqs = db.shape
    if nqd != nq:
        raise ValueError(f"db batch {nqd} != query batch {nq}")
    if L % KSEG:
        raise ValueError(f"db length {L} not a multiple of {KSEG}")
    if nseqs % (SUB * 128):
        raise ValueError(f"NSEQS {nseqs} not a multiple of {SUB * 128}")
    if qlen_pad % RU:
        raise ValueError(f"qlen_pad {qlen_pad} not a multiple of RU={RU}")
    nl = nseqs // SUB
    nblocks = L // KSEG
    db8 = db.reshape(nq, L, SUB, nl).reshape(nq, L * SUB, nl)
    st2 = starts.astype(jnp.int32).reshape(nq, SUB, nl)

    kernel = functools.partial(_hint_kernel, Q=gapopenextend, R=gapextend)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq, nblocks),
        in_specs=[
            pl.BlockSpec((32, 32), lambda q, b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KSEG * SUB, nl), lambda q, b, *_: (q, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, nl), lambda q, b, *_: (q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SUB, nl), lambda q, b, *_: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, nl), lambda q, b, *_: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, nl), lambda q, b, *_: (q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((qlen_pad, SUB, nl), jnp.int32),
            pltpu.VMEM((qlen_pad, SUB, nl), jnp.int32),
            pltpu.VMEM((KSEG, SUB, nl), jnp.int32),
            pltpu.VMEM((KSEG, SUB, nl), jnp.int32),
            pltpu.VMEM((KSEG, SUB, nl), jnp.int32),
            pltpu.VMEM((KSEG, SUB, nl), jnp.int32),
            pltpu.VMEM((SUB, nl), jnp.int32),
            pltpu.VMEM((SUB, nl), jnp.int32),
            pltpu.VMEM((SUB, nl), jnp.int32),
            pltpu.VMEM((32, KSEG * SUB, nl), DPROF_DTYPE),
        ],
    )
    s, bq, bp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq, SUB, nl), jnp.int32),
            jax.ShapeDtypeStruct((nq, SUB, nl), jnp.int32),
            jax.ShapeDtypeStruct((nq, SUB, nl), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qcodes, qlens, matrix8, db8, st2)
    s = s.reshape(nq, nseqs)
    bq = bq.reshape(nq, nseqs)
    bp = bp.reshape(nq, nseqs)
    if squeeze:
        return s[0], bq[0], bp[0]
    return s, bq, bp


def _stream_lax_core(qcodes, qlens, matrix, db, start, h0, e0, s0, *,
                     gapopenextend: int, gapextend: int,
                     clamp: int | None):
    """Shared lax.scan implementation: returns (dumps, h, e, s)."""
    nq, qlen_pad = qcodes.shape
    L, nseqs = db.shape
    Q, R = gapopenextend, gapextend
    nblocks = L // KSEG
    prof = matrix.astype(jnp.int32)                       # [32, 32]
    # the pad penalty must be strictly negative so H decays through
    # padding/overhang rows; for int8 matrices this is -128 (build_matrix8)
    pad_pen = jnp.minimum(jnp.min(prof), -1)
    dbb = db.astype(jnp.int32).reshape(nblocks, KSEG, nseqs)
    startb = (start != 0).reshape(nblocks, nseqs)
    iota_q = jnp.arange(qlen_pad, dtype=jnp.int32)[:, None]

    def one_query(qc, ql, h0, e0, s0):
        qprof = prof[qc]                                  # [QLEN, 32]
        qmask = iota_q < ql                               # [QLEN, 1]

        def block(carry, xs):
            h, e, s = carry
            cols, reset = xs
            h = jnp.where(reset[None, :], 0, h)
            e = jnp.where(reset[None, :], NEG_INF, e)
            s = jnp.where(reset, 0, s)

            def column(st, dj):
                h, e, s = st
                p = jnp.where(qmask, qprof[:, dj], pad_pen)
                e = jnp.maximum(e - R, h - Q)
                hd = jnp.concatenate(
                    [jnp.zeros((1, nseqs), jnp.int32), h[:-1, :]], axis=0)
                hnof = jnp.maximum(jnp.maximum(hd + p, e), 0)
                if clamp is not None:
                    hnof = jnp.minimum(hnof, clamp)
                t = jax.lax.cummax(hnof + iota_q * R, axis=0)
                f = jnp.concatenate(
                    [jnp.full((1, nseqs), NEG_INF, jnp.int32), t[:-1, :]],
                    axis=0) - (Q + jnp.maximum(iota_q - 1, 0) * R)
                h = jnp.maximum(hnof, f)
                if clamp is not None:
                    h = jnp.minimum(h, clamp)
                s = jnp.maximum(s, jnp.max(h, axis=0))
                return (h, e, s), None

            (h, e, s), _ = jax.lax.scan(column, (h, e, s), cols)
            return (h, e, s), s

        (h, e, s), dumps = jax.lax.scan(block, (h0, e0, s0), (dbb, startb))
        return dumps, h, e, s                             # [nblocks, NSEQS]

    return jax.vmap(one_query)(qcodes, qlens, h0, e0, s0)


@functools.partial(
    jax.jit,
    static_argnames=("gapopenextend", "gapextend", "clamp"),
)
def sw_scores_stream_lax(qcodes: jax.Array, qlens: jax.Array,
                         matrix8: jax.Array, db: jax.Array,
                         start: jax.Array, *,
                         gapopenextend: int, gapextend: int,
                         clamp: int | None = None) -> jax.Array:
    """Pure-JAX (lax.scan) twin of sw_scores_stream: same contract, any
    backend.  The cross-check oracle for the Pallas stream kernel and the
    CPU fallback scoring path for lane-packed chunks."""
    nq, qlen_pad = qcodes.shape
    _, nseqs = db.shape
    zvar = db[0, 0].astype(jnp.int32) * 0 + matrix8[0, 0].astype(jnp.int32) * 0
    h0 = jnp.zeros((nq, qlen_pad, nseqs), jnp.int32) + zvar
    e0 = jnp.full((nq, qlen_pad, nseqs), NEG_INF, jnp.int32) + zvar
    s0 = jnp.zeros((nq, nseqs), jnp.int32) + zvar
    dumps, _, _, _ = _stream_lax_core(
        qcodes, qlens, matrix8, db, start, h0, e0, s0,
        gapopenextend=gapopenextend, gapextend=gapextend, clamp=clamp)
    return dumps


def make_stream_state_lax(nq: int, qlen_pad: int, nseqs: int):
    """Fresh (h, e, s) carry state in the lax twin's [QLEN, NSEQS] layout
    (reshape of the kernel layout: lane i <-> (i // nl, i % nl))."""
    return (jnp.zeros((nq, qlen_pad, nseqs), jnp.int32),
            jnp.full((nq, qlen_pad, nseqs), NEG_INF, jnp.int32),
            jnp.zeros((nq, nseqs), jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("gapopenextend", "gapextend", "clamp"),
)
def sw_scores_stream_lax_carry(qcodes: jax.Array, qlens: jax.Array,
                               matrix: jax.Array, db: jax.Array,
                               start: jax.Array, h: jax.Array,
                               e: jax.Array, s: jax.Array, *,
                               gapopenextend: int, gapextend: int,
                               clamp: int | None = None):
    """Any-backend twin of sw_scores_stream_carry (same contract, lax
    layout [NQ, QLEN, NSEQS]).  Unlike the int8-only Pallas kernel it
    accepts any integer score matrix, so it also serves as the giant-
    sequence fallback for matrices outside int8 range."""
    dumps, h2, e2, s2 = _stream_lax_core(
        qcodes, qlens, matrix, db, start, h, e, s,
        gapopenextend=gapopenextend, gapextend=gapextend, clamp=clamp)
    return dumps, h2, e2, s2


def _stream_tile_kernel(qc_ref, ql_ref, tile_ref, m8_ref, db_ref, start_ref,
                        bh_ref, bf_ref, sp_ref,
                        out_ref, bho_ref, bfo_ref,
                        hst_ref, est_ref, hrow_ref, frow_ref, s_ref, bh0_ref,
                        dprof_ref, *,
                        Q: int, R: int, tile_rows: int, clamp: int | None):
    """One (query, db-block) step of one query-tile pass (long queries).

    Identical to _stream_kernel over ``tile_rows`` query rows, except the
    DP boundary with the tile above enters per column: bh/bf_ref hold
    H/F of the previous tile's bottom row for this block's columns
    ([1, KSEG, SUB, NL]); the kernel emits the same planes for its own
    bottom row (bho/bfo_ref) for the next tile pass.  sp_ref carries the
    previous passes' per-block S dump, max-merged into out_ref.
    """
    qi = pl.program_id(0)
    b = pl.program_id(1)
    nl = db_ref.shape[1]
    tile = tile_ref[0]

    @pl.when(b == 0)
    def _init():
        hst_ref[...] = jnp.zeros_like(hst_ref)
        est_ref[...] = jnp.full_like(est_ref, NEG_INF)
        s_ref[...] = jnp.zeros_like(s_ref)
        bh0_ref[...] = jnp.zeros_like(bh0_ref)

    _build_dprofile(m8_ref, db_ref, dprof_ref)

    reset = start_ref[0] != 0
    # the tile-top boundary replaces the zero/NEG_INF row-state init of the
    # single-tile kernel.  bh/bf were produced at THIS block by the
    # previous tile pass, which already applied this block's lane resets —
    # so they belong to the newly started sequence and must NOT be masked
    for j in range(KSEG):
        hrow_ref[j] = bh_ref[0, 0, j]
        frow_ref[j] = bf_ref[0, 0, j]

    # H[tile_top-1, col -1 of this block] = previous block's bh[KSEG-1],
    # carried across blocks in scratch (grid is block-sequential); that
    # column belongs to the PREVIOUS sequence on reset lanes -> masked
    diag0_init = jnp.where(reset, 0, bh0_ref[...])
    bh0_ref[...] = bh_ref[0, 0, KSEG - 1]

    rows = jnp.clip(ql_ref[qi] - tile * tile_rows, 0, tile_rows)
    # a partial final row group only happens when the query ends in this
    # tile (PAD rows decay and cannot raise S or matter downstream)
    row_body = _make_row_body(
        qc_ref, hst_ref, est_ref, hrow_ref, frow_ref, dprof_ref,
        qi=qi, qoff=tile * tile_rows, soff=0, reset=reset, Q=Q, R=R,
        cell=_scoring_cell(clamp))

    _, s = jax.lax.fori_loop(
        0, (rows + RU - 1) // RU, row_body,
        (diag0_init, jnp.where(reset, 0, s_ref[...])))
    s_ref[...] = s
    # sp_ref is per-block (not running), so a refill block's previous-pass
    # dump already belongs to the newly started sequence — no reset here
    out_ref[0, 0] = jnp.maximum(sp_ref[0, 0], s)
    # bottom-row boundary for the next tile: hrow holds the last processed
    # row's H; frow is F already advanced into the next tile's top row
    for j in range(KSEG):
        bho_ref[0, 0, j] = hrow_ref[j]
        bfo_ref[0, 0, j] = frow_ref[j]


@functools.partial(
    jax.jit,
    static_argnames=("gapopenextend", "gapextend", "tile_rows", "clamp",
                     "interpret"),
)
def _stream_tile_pass(qcodes, qlens, tile, matrix8, db8, start32, bh, bf,
                      sprev, *, gapopenextend: int, gapextend: int,
                      tile_rows: int, clamp: int | None,
                      interpret: bool = False):
    nq, qlen_pad = qcodes.shape
    s8, nl = db8.shape
    nblocks = s8 // (KSEG * SUB)
    kernel = functools.partial(
        _stream_tile_kernel, Q=gapopenextend, R=gapextend,
        tile_rows=tile_rows, clamp=clamp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nq, nblocks),
        in_specs=[
            pl.BlockSpec((32, 32), lambda q, b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KSEG * SUB, nl), lambda q, b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, nl), lambda q, b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KSEG, SUB, nl),
                         lambda q, b, *_: (q, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KSEG, SUB, nl),
                         lambda q, b, *_: (q, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, nl), lambda q, b, *_: (q, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, SUB, nl), lambda q, b, *_: (q, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KSEG, SUB, nl),
                         lambda q, b, *_: (q, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KSEG, SUB, nl),
                         lambda q, b, *_: (q, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_rows, SUB, nl), jnp.int32),
            pltpu.VMEM((tile_rows, SUB, nl), jnp.int32),
            pltpu.VMEM((KSEG, SUB, nl), jnp.int32),
            pltpu.VMEM((KSEG, SUB, nl), jnp.int32),
            pltpu.VMEM((SUB, nl), jnp.int32),
            pltpu.VMEM((SUB, nl), jnp.int32),
            pltpu.VMEM((32, KSEG * SUB, nl), DPROF_DTYPE),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq, nblocks, SUB, nl), jnp.int32),
            jax.ShapeDtypeStruct((nq, nblocks, KSEG, SUB, nl), jnp.int32),
            jax.ShapeDtypeStruct((nq, nblocks, KSEG, SUB, nl), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qcodes, qlens, tile, matrix8, db8, start32, bh, bf, sprev)


def _stream_tile_carry_kernel(qc_ref, ql_ref, tile_ref, m8_ref, db_ref,
                              start_ref, bh_ref, bf_ref, sp_ref,
                              hin_ref, ein_ref, sin_ref, bh0c_ref,
                              out_ref, bho_ref, bfo_ref,
                              hout_ref, eout_ref, bh0o_ref,
                              hst_ref, est_ref, hrow_ref, frow_ref, s_ref,
                              bh0_ref, bhl_ref, dprof_ref, dma_sem,
                              *, Q: int, R: int, tile_rows: int,
                              clamp: int | None):
    """One (query, db-block) step of one tile pass of the CARRY series
    for long queries (sw_scores_stream_carry_long).

    _stream_tile_kernel plus chunk-boundary state exchange: the tile's
    H/E row state enters from HBM at block 0 (hin/ein[qi, tile]) and
    leaves at the last block (hout/eout[qi]); bh0c[qi, tile] carries the
    previous tile's bottom-row H at the previous chunk's LAST column
    (the diagonal across the chunk cut), and bh0o[qi] emits this tile's
    own bottom-row H at this chunk's last column — the wrapper stacks it
    into slot tile+1 for the next chunk.  The carried running max S
    loads only in the tile-0 pass (other tiles fold into the per-block
    dump via sp).
    """
    qi = pl.program_id(0)
    b = pl.program_id(1)
    nl = db_ref.shape[1]
    tile = tile_ref[0]

    @pl.when(b == 0)
    def _load():
        cps = [pltpu.make_async_copy(hin_ref.at[qi, tile], hst_ref,
                                     dma_sem.at[0]),
               pltpu.make_async_copy(ein_ref.at[qi, tile], est_ref,
                                     dma_sem.at[1]),
               pltpu.make_async_copy(bh0c_ref.at[qi, tile], bh0_ref,
                                     dma_sem.at[2])]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        s_ref[...] = jnp.zeros_like(s_ref)

    @pl.when((b == 0) & (tile == 0))
    def _load_s():
        cp = pltpu.make_async_copy(sin_ref.at[qi], s_ref, dma_sem.at[0])
        cp.start()
        cp.wait()

    _build_dprofile(m8_ref, db_ref, dprof_ref)

    reset = start_ref[0] != 0
    for j in range(KSEG):
        hrow_ref[j] = bh_ref[0, 0, j]
        frow_ref[j] = bf_ref[0, 0, j]

    diag0_init = jnp.where(reset, 0, bh0_ref[...])
    bh0_ref[...] = bh_ref[0, 0, KSEG - 1]

    rows = jnp.clip(ql_ref[qi] - tile * tile_rows, 0, tile_rows)
    row_body = _make_row_body(
        qc_ref, hst_ref, est_ref, hrow_ref, frow_ref, dprof_ref,
        qi=qi, qoff=tile * tile_rows, soff=0, reset=reset, Q=Q, R=R,
        cell=_scoring_cell(clamp))

    _, s = jax.lax.fori_loop(
        0, (rows + RU - 1) // RU, row_body,
        (diag0_init, jnp.where(reset, 0, s_ref[...])))
    s_ref[...] = s
    out_ref[0, 0] = jnp.maximum(sp_ref[0, 0], s)
    for j in range(KSEG):
        bho_ref[0, 0, j] = hrow_ref[j]
        bfo_ref[0, 0, j] = frow_ref[j]

    @pl.when(b == pl.num_programs(1) - 1)
    def _store():
        bhl_ref[...] = hrow_ref[KSEG - 1]
        cps = [pltpu.make_async_copy(hst_ref, hout_ref.at[qi],
                                     dma_sem.at[0]),
               pltpu.make_async_copy(est_ref, eout_ref.at[qi],
                                     dma_sem.at[1]),
               pltpu.make_async_copy(bhl_ref, bh0o_ref.at[qi],
                                     dma_sem.at[2])]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("gapopenextend", "gapextend", "tile_rows", "clamp",
                     "interpret"),
)
def _stream_tile_carry_pass(qcodes, qlens, tile, matrix8, db8, start32,
                            bh, bf, sprev, hin, ein, sin, bh0c, *,
                            gapopenextend: int, gapextend: int,
                            tile_rows: int, clamp: int | None,
                            interpret: bool = False):
    nq, qlen_pad = qcodes.shape
    s8, nl = db8.shape
    nblocks = s8 // (KSEG * SUB)
    kernel = functools.partial(
        _stream_tile_carry_kernel, Q=gapopenextend, R=gapextend,
        tile_rows=tile_rows, clamp=clamp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nq, nblocks),
        in_specs=[
            pl.BlockSpec((32, 32), lambda q, b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KSEG * SUB, nl), lambda q, b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, nl), lambda q, b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KSEG, SUB, nl),
                         lambda q, b, *_: (q, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KSEG, SUB, nl),
                         lambda q, b, *_: (q, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, nl), lambda q, b, *_: (q, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, SUB, nl), lambda q, b, *_: (q, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KSEG, SUB, nl),
                         lambda q, b, *_: (q, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KSEG, SUB, nl),
                         lambda q, b, *_: (q, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_rows, SUB, nl), jnp.int32),
            pltpu.VMEM((tile_rows, SUB, nl), jnp.int32),
            pltpu.VMEM((KSEG, SUB, nl), jnp.int32),
            pltpu.VMEM((KSEG, SUB, nl), jnp.int32),
            pltpu.VMEM((SUB, nl), jnp.int32),
            pltpu.VMEM((SUB, nl), jnp.int32),
            pltpu.VMEM((SUB, nl), jnp.int32),
            pltpu.VMEM((32, KSEG * SUB, nl), DPROF_DTYPE),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq, nblocks, SUB, nl), jnp.int32),
            jax.ShapeDtypeStruct((nq, nblocks, KSEG, SUB, nl), jnp.int32),
            jax.ShapeDtypeStruct((nq, nblocks, KSEG, SUB, nl), jnp.int32),
            jax.ShapeDtypeStruct((nq, tile_rows, SUB, nl), jnp.int32),
            jax.ShapeDtypeStruct((nq, tile_rows, SUB, nl), jnp.int32),
            jax.ShapeDtypeStruct((nq, SUB, nl), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qcodes, qlens, tile, matrix8, db8, start32, bh, bf, sprev,
      hin, ein, sin, bh0c)


def make_stream_state_long(nq: int, qlen_pad: int, nseqs: int,
                           tile_rows: int = 512):
    """Fresh carry state for sw_scores_stream_carry_long: (h, e, s, bh0c)
    with h/e [NQ, ntiles, tile_rows, SUB, NL] and bh0c
    [NQ, ntiles + 1, SUB, NL] (slot t = previous tile's bottom-row H at
    the previous chunk's last column; slot 0 stays 0 — the virtual row
    above the query)."""
    nl = nseqs // SUB
    ntiles = qlen_pad // tile_rows
    return (jnp.zeros((nq, ntiles, tile_rows, SUB, nl), jnp.int32),
            jnp.full((nq, ntiles, tile_rows, SUB, nl), NEG_INF, jnp.int32),
            jnp.zeros((nq, SUB, nl), jnp.int32),
            jnp.zeros((nq, ntiles + 1, SUB, nl), jnp.int32))


def sw_scores_stream_carry_long(qcodes, qlens, matrix8, db, start,
                                h, e, s, bh0c, *,
                                gapopenextend: int, gapextend: int,
                                tile_rows: int = 512,
                                clamp: int | None = None,
                                interpret: bool = False):
    """Carry-series scoring for queries beyond one VMEM tile.

    The composition of sw_scores_stream_long's query tiling with
    sw_scores_stream_carry's chunk-boundary state exchange: each chunk
    of a pack_stream_carry series runs ntiles tile passes (inter-tile
    boundary planes bh/bf live per block within the chunk), and each
    tile's H/E row state, the running S, and the tile-crossing diagonal
    plane bh0c thread through HBM to the next chunk.  Matches the
    reference's unbounded-db x unbounded-query semantics
    (/root/reference/search7.cc:787, swipe.cc:1240) with O(tile_rows)
    VMEM state.

    h/e/s/bh0c come from make_stream_state_long; returns
    (scores [NQ, nblocks, NSEQS], h', e', s', bh0c').  ``db``/``start``
    may be narrower than the state's lane count (compact chunks); the
    missing lanes are PAD-filled on device.
    """
    nq, qlen_pad = qcodes.shape
    db, start, nseqs = _pad_to_state_width(db, start,
                                           h.shape[3] * h.shape[4])
    L = db.shape[0]
    if qlen_pad % tile_rows:
        raise ValueError(f"qlen_pad {qlen_pad} not a multiple of "
                         f"tile_rows {tile_rows}")
    if tile_rows % RU:
        raise ValueError(f"tile_rows {tile_rows} not a multiple of RU={RU}")
    if L % KSEG:
        raise ValueError(f"db length {L} not a multiple of {KSEG}")
    if nseqs % (SUB * 128):
        raise ValueError(f"NSEQS {nseqs} not a multiple of {SUB * 128}")
    nl = nseqs // SUB
    nblocks = L // KSEG
    ntiles = qlen_pad // tile_rows
    db8 = db.reshape(L, SUB, nl).reshape(L * SUB, nl)
    start32 = start.astype(jnp.int32).reshape(nblocks, SUB, nl)

    bh = jnp.zeros((nq, nblocks, KSEG, SUB, nl), jnp.int32)
    bf = jnp.full((nq, nblocks, KSEG, SUB, nl), NEG_INF, jnp.int32)
    out = jnp.zeros((nq, nblocks, SUB, nl), jnp.int32)
    new_h, new_e, new_bh0 = [], [], []
    for t in range(ntiles):
        out, bh, bf, ht, et, bh0t = _stream_tile_carry_pass(
            qcodes, qlens, jnp.asarray([t], jnp.int32), matrix8, db8,
            start32, bh, bf, out, h, e, s, bh0c,
            gapopenextend=gapopenextend, gapextend=gapextend,
            tile_rows=tile_rows, clamp=clamp, interpret=interpret)
        new_h.append(ht)
        new_e.append(et)
        new_bh0.append(bh0t)
    h2 = jnp.stack(new_h, axis=1)
    e2 = jnp.stack(new_e, axis=1)
    # slot t+1 <- tile t's bottom-row H at this chunk's last column;
    # slot 0 stays the zero row above the query
    bh0c2 = jnp.concatenate(
        [jnp.zeros((nq, 1, SUB, nl), jnp.int32),
         jnp.stack(new_bh0, axis=1)], axis=1)
    s2 = out[:, nblocks - 1]
    return out.reshape(nq, nblocks, nseqs), h2, e2, s2, bh0c2


def sw_scores_stream_long(qcodes, qlens, matrix8, db, start, *,
                          gapopenextend: int, gapextend: int,
                          tile_rows: int = 512, clamp: int | None = None,
                          interpret: bool = False):
    """Stream scoring for queries longer than one VMEM tile.

    Splits the query into ``tile_rows``-row tiles; each pass streams the
    whole chunk, carrying the inter-tile DP boundary (H and the query-gap
    chain F of the tile's bottom row, per column) in HBM — the O(qlen)
    ``hearray`` state stays O(tile_rows) in VMEM.  The reference has no
    length limit because its state lives in cache (swipe.cc:1240); here
    the boundary planes cost 8 bytes/db-cell of HBM traffic per extra
    tile, which is negligible against the DP work of tile_rows rows.
    Contract and result match sw_scores_stream.
    """
    nq, qlen_pad = qcodes.shape
    L, nseqs = db.shape
    if qlen_pad % tile_rows:
        raise ValueError(f"qlen_pad {qlen_pad} not a multiple of "
                         f"tile_rows {tile_rows}")
    if tile_rows % RU:
        raise ValueError(f"tile_rows {tile_rows} not a multiple of RU={RU}")
    if L % KSEG:
        raise ValueError(f"db length {L} not a multiple of {KSEG}")
    if nseqs % (SUB * 128):
        raise ValueError(f"NSEQS {nseqs} not a multiple of {SUB * 128}")
    nl = nseqs // SUB
    nblocks = L // KSEG
    db8 = db.reshape(L, SUB, nl).reshape(L * SUB, nl)
    start32 = start.astype(jnp.int32).reshape(nblocks, SUB, nl)
    ntiles = qlen_pad // tile_rows

    bh = jnp.zeros((nq, nblocks, KSEG, SUB, nl), jnp.int32)
    bf = jnp.full((nq, nblocks, KSEG, SUB, nl), NEG_INF, jnp.int32)
    out = jnp.zeros((nq, nblocks, SUB, nl), jnp.int32)
    for t in range(ntiles):
        out, bh, bf = _stream_tile_pass(
            qcodes, qlens, jnp.asarray([t], jnp.int32), matrix8, db8,
            start32, bh, bf, out, gapopenextend=gapopenextend,
            gapextend=gapextend, tile_rows=tile_rows, clamp=clamp,
            interpret=interpret)
    return out.reshape(nq, nblocks, nseqs)
