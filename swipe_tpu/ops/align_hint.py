"""Alignment-endpoint hint pass (the reference's search16s equivalent).

Parity target: /root/reference/search16s.cc:297-548.  For each hit that will
be displayed, the reference runs a CDEPTH=1 16-bit kernel that, whenever the
running maximum S strictly increases after a column, records

* ``bestpos`` — the 0-based db offset of that column (i.e. the FIRST column
  at which the final maximum is attained), and
* ``bestq``  — the SMALLEST query row whose H equals S in that column
  (the i loop scans qlen-1..0 and lets smaller i overwrite).

hits_align then skips the forward region pass and starts the reverse pass
from (bestq, bestpos) — but only when ``bestq > 0`` and ``bestpos != 0``
(hits.cc:587-595), and only when the score is below SCORELIMIT_16.  These
tie-breaking semantics differ from the forward region scan (which picks the
smallest query row overall), so reproducing them is required for alignment
parity when several optimal endpoints exist.

Host-side NumPy implementation (exact: the int16 kernel cannot saturate for
scores below SCORELIMIT_16); runs once per displayed hit.
"""

from __future__ import annotations

import numpy as np

__all__ = ["hint_endpoint", "hint_endpoints_many"]

NEG = -(1 << 40)


def hint_endpoint(qseq: np.ndarray, dseq: np.ndarray, matrix: np.ndarray,
                  gapopen: int, gapextend: int
                  ) -> tuple[int, int, int]:
    """Return (score, bestq, bestpos) with search16s tie semantics."""
    if len(dseq) > GIANT_HINT_MIN:
        return hint_endpoints_many(qseq, [np.asarray(dseq)], matrix,
                                   gapopen, gapextend)[0]
    q = np.asarray(qseq, dtype=np.int64)
    d = np.asarray(dseq, dtype=np.int64)
    mat = np.asarray(matrix, dtype=np.int64).reshape(32, 32)
    Q = gapopen + gapextend
    R = gapextend
    m = len(q)
    QP = mat[q, :].T  # (32, m)

    H = np.zeros(m, dtype=np.int64)
    E = np.full(m, NEG, dtype=np.int64)
    idxR = np.arange(m, dtype=np.int64) * R
    S = 0
    bestpos = 0
    bestq = -1
    for j, dj in enumerate(d):
        P = QP[dj]
        E = np.maximum(E - R, H - Q)
        diag = np.concatenate(([0], H[:-1]))
        hnof = np.maximum(np.maximum(diag + P, E), 0)
        A = np.maximum.accumulate(hnof + idxR)
        F = np.concatenate(([NEG], A[:-1])) - Q - idxR + R
        H = np.maximum(hnof, F)
        colmax = int(H.max())
        if colmax > S:
            S = colmax
            bestpos = j
            bestq = int(np.argmax(H == S))  # smallest row attaining S
    return S, bestq, bestpos


# int32 is provably sufficient for the batched passes: scores are
# bounded by qlen * max(matrix) << 2^31 and the sentinel only ever
# decays by R per column (bounded db lengths keep it far from overflow)
NEG32 = -(1 << 28)

# batched workloads above this many DP cells route to the device pass
# when an accelerator is attached (a ~1 GCUPS NumPy hint pass would
# dominate wall clock for -b 100 against long db sequences; the
# reference runs search16s at SIMD speed for the same reason)
DEVICE_CELLS = 50_000_000

# subjects longer than this segment into overlapped pieces for the hint
# pass (the transpose of the search phase's segmented-giant scoring): a
# lone chromosome otherwise runs one lane through maxlen sequential
# columns, which is latency-bound on every backend
GIANT_HINT_MIN = 1 << 18


def _span_bound(m: int, maxS: int, R: int) -> int | None:
    """Max db-span of a positive-score local alignment (same argument
    as pipeline.SearchEngine._overlap_bound): pairs contribute at most
    m * maxS and each unpaired db residue costs at least R.  With free
    gap extension (R == 0) the span is unbounded — no segmentation."""
    if maxS <= 0 or R <= 0:
        return None
    return m + -(-m * maxS // R)


def hint_endpoints_many(qseq: np.ndarray, dseqs: list[np.ndarray],
                        matrix: np.ndarray, gapopen: int, gapextend: int
                        ) -> list[tuple[int, int, int]]:
    """hint_endpoint for MANY db sequences at once (same query).

    One vectorized pass over [nhits, qlen] state — the reference runs
    its hint kernel on the whole displayed-hit bin per thread
    (align_chunk, swipe.cc:339-414).  Tie semantics are identical to
    hint_endpoint (first column attaining the final max; smallest row
    within it).  Large batches run on the attached accelerator via the
    lax twin; small ones stay in NumPy (no dispatch/compile latency).

    Chromosome-scale subjects segment into overlapped pieces that run
    as parallel lanes (EXACT: a positive-score alignment spans at most
    _span_bound db columns, so every colmax over a piece's OWNED
    columns — those at least that far from the piece start — is the
    true colmax; ownership partitions the columns, so merging by
    (max S, then smallest global column) reproduces the unsegmented
    first-improving-column/smallest-row tie semantics bit-for-bit).
    """
    if not dseqs:
        return []
    q = np.asarray(qseq, dtype=np.int64)
    m = len(q)
    mat = np.asarray(matrix, dtype=np.int64).reshape(32, 32)
    Q = gapopen + gapextend
    R = gapextend

    V = _span_bound(m, int(mat.max()), R)
    giants = [i for i, d in enumerate(dseqs)
              if V is not None and len(d) > GIANT_HINT_MIN
              and len(d) > 4 * V]
    if not giants:
        return _hint_batch(q, [np.asarray(d) for d in dseqs], mat, Q, R,
                           None)

    results: list[tuple[int, int, int] | None] = [None] * len(dseqs)
    normals = [i for i in range(len(dseqs)) if i not in set(giants)]
    if normals:
        for i, res in zip(normals, _hint_batch(
                q, [np.asarray(dseqs[i]) for i in normals], mat, Q, R,
                None)):
            results[i] = res

    pieces, starts, owner, gpos = [], [], [], []
    for i in giants:
        d = np.asarray(dseqs[i])
        N = len(d)
        stride = max(2 * V, -(-N // 1024), 2048)
        stride = -(-stride // 256) * 256
        for pos in range(0, max(N - V, 1), stride):
            pieces.append(d[pos: pos + stride + V])
            starts.append(0 if pos == 0 else V)
            owner.append(i)
            gpos.append(pos)
    res = _hint_batch(q, pieces, mat, Q, R,
                      np.asarray(starts, dtype=np.int64))
    best: dict[int, tuple[int, int, int]] = {}
    for (s, bq, bp), i, pos in zip(res, owner, gpos):
        cur = best.get(i)
        if cur is None or s > cur[0] or (s == cur[0] and 0 <= bq
                                         and pos + bp < cur[2]):
            best[i] = (s, bq, pos + bp) if bq >= 0 else (s, bq, bp)
    for i in giants:
        results[i] = best[i]
    return results


def _hint_batch(q, dseqs, mat, Q, R, starts):
    """Batched hint pass with optional per-lane first-tracked column
    (``starts``: columns before a lane's start never update S/bq/bp —
    the owned-column mask of the segmented-giant route)."""
    lens = np.array([len(d) for d in dseqs], dtype=np.int64)
    n = len(dseqs)
    m = len(q)
    maxlen = int(lens.max())
    if starts is None:
        starts = np.zeros(n, dtype=np.int64)

    if n * maxlen * m > DEVICE_CELLS:
        try:
            import jax
            if jax.default_backend() not in ("cpu",):
                return _hint_endpoints_device(q, dseqs, lens, mat, Q, R,
                                              starts)
        except Exception:
            pass

    QP = mat[q, :].T.astype(np.int32)                 # (32, m)
    dense = np.zeros((n, maxlen), dtype=np.int8)
    for i, d in enumerate(dseqs):
        dense[i, : len(d)] = np.asarray(d, dtype=np.int8)

    H = np.zeros((n, m), dtype=np.int32)
    E = np.full((n, m), NEG32, dtype=np.int32)
    idxR = (np.arange(m, dtype=np.int64) * R).astype(np.int32)
    S = np.zeros(n, dtype=np.int32)
    bestpos = np.zeros(n, dtype=np.int64)
    bestq = np.full(n, -1, dtype=np.int64)
    for j in range(maxlen):
        active = j < lens
        if not active.any():
            break
        P = QP[dense[:, j], :]                        # (n, m)
        E = np.maximum(E - R, H - Q)
        diag = np.concatenate(
            [np.zeros((n, 1), dtype=np.int32), H[:, :-1]], axis=1)
        hnof = np.maximum(np.maximum(diag + P, E), 0)
        A = np.maximum.accumulate(hnof + idxR, axis=1)
        F = np.concatenate(
            [np.full((n, 1), NEG32, dtype=np.int32), A[:, :-1]],
            axis=1) - Q - idxR + R
        H = np.maximum(hnof, F)
        colmax = H.max(axis=1)
        improve = active & (colmax > S) & (j >= starts)
        if improve.any():
            rows = np.argmax(H == colmax[:, None], axis=1)
            S = np.where(improve, colmax, S)
            bestpos = np.where(improve, j, bestpos)
            bestq = np.where(improve, rows, bestq)
        H = np.where(active[:, None], H, 0)
        E = np.where(active[:, None], E, NEG32)
    return [(int(S[i]), int(bestq[i]), int(bestpos[i])) for i in range(n)]


_HINT_UNROLL = 8


def _hint_lax_impl(QP, dense_t, lens, starts, Q, R):
    """lax twin of the batched hint pass: scan over db columns,
    _HINT_UNROLL columns per scan step (a bare per-column scan is
    step-overhead-bound on tiny [n, m] state).

    QP: [32, m] int32; dense_t: [maxlen, n] int32; lens: [n] int32;
    starts: [n] int32 per-lane first-tracked column (the segmented
    giant route's owned-column mask; zeros for whole sequences).
    Tie semantics identical to the NumPy pass (argmax = smallest row /
    first improving column).
    """
    import jax
    import jax.numpy as jnp

    m = QP.shape[1]
    n = dense_t.shape[1]
    idxR = jnp.arange(m, dtype=jnp.int32) * R
    T = _HINT_UNROLL

    def column(state, sym, j):
        H, E, S, bq, bp = state
        P = QP[sym]                                   # [n, m]
        E = jnp.maximum(E - R, H - Q)
        diag = jnp.concatenate(
            [jnp.zeros((n, 1), jnp.int32), H[:, :-1]], axis=1)
        hnof = jnp.maximum(jnp.maximum(diag + P, E), 0)
        A = jax.lax.cummax(hnof + idxR, axis=1)
        F = jnp.concatenate(
            [jnp.full((n, 1), NEG32, jnp.int32), A[:, :-1]],
            axis=1) - Q - idxR + R
        H = jnp.maximum(hnof, F)
        colmax = H.max(axis=1)
        active = j < lens
        improve = active & (colmax > S) & (j >= starts)
        rows = jnp.argmax(H == colmax[:, None], axis=1).astype(jnp.int32)
        S = jnp.where(improve, colmax, S)
        bp = jnp.where(improve, j, bp)
        bq = jnp.where(improve, rows, bq)
        H = jnp.where(active[:, None], H, 0)
        E = jnp.where(active[:, None], E, NEG32)
        return H, E, S, bq, bp

    def step(state, xs):
        syms, j0 = xs                                 # [T, n], scalar
        for t in range(T):
            state = column(state, syms[t], j0 + t)
        return state, None

    init = (jnp.zeros((n, m), jnp.int32),
            jnp.full((n, m), NEG32, jnp.int32),
            jnp.zeros((n,), jnp.int32),
            jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), jnp.int32))
    maxlen = dense_t.shape[0]
    (_, _, S, bq, bp), _ = jax.lax.scan(
        step, init,
        (dense_t.reshape(maxlen // T, T, n),
         jnp.arange(0, maxlen, T, dtype=jnp.int32)))
    return S, bq, bp


_hint_lax_jit = None


def _hint_endpoints_device(q, dseqs, lens, mat, Q, R, starts=None):
    """Run the batched hint pass on the attached accelerator.

    int8-range matrices with queries that fit one VMEM tile go through
    the Pallas hint kernel (ops.sw_stream.sw_hint_stream — the stream
    kernel's recurrence plus in-kernel colmax/argrow tracking, the
    search16s analog); everything else uses the lax scan twin.  Shapes
    are bucketed (hit count, columns, query rows) so repeated align
    phases reuse the compiled program.
    """
    import jax
    m = len(q)
    # the pallas route pads the hit bin to 1024 lanes; cap its HBM
    # footprint so one chromosome-scale subject falls through to the lax
    # scan (whose padding is 8 lanes) instead of allocating lanes x len
    if (mat.min() >= -128 and mat.max() <= 127 and m <= 1024
            and int(lens.max()) * 1024 <= (512 << 20)
            and jax.default_backend() not in ("cpu",)):
        try:
            return _hint_endpoints_pallas(q, dseqs, lens, mat, Q, R,
                                          starts)
        except Exception:
            pass
    return _hint_endpoints_lax(q, dseqs, lens, mat, Q, R, starts)


def _hint_endpoints_pallas(q, dseqs, lens, mat, Q, R, starts=None,
                           interpret=False):
    """Pallas hint-kernel route: one sequence per lane, PAD-padded."""
    import jax.numpy as jnp

    from .sw_pallas import PAD_SYMBOL
    from .sw_stream import SUB, build_matrix8, build_qcodes, sw_hint_stream

    n = len(dseqs)
    lanes = SUB * 128                     # kernel minimum lane count
    n_pad = -(-n // lanes) * lanes
    maxlen = int(lens.max())
    len_pad = -(-maxlen // 2048) * 2048   # multiple of KSEG
    qlen_pad = max(128, -(-len(q) // 128) * 128)
    qc, ql = build_qcodes([np.asarray(q)], qlen_pad)
    dense = np.full((len_pad, n_pad), PAD_SYMBOL, dtype=np.int8)
    for i, d in enumerate(dseqs):
        dense[: len(d), i] = np.asarray(d, dtype=np.int8)
    st = np.zeros(n_pad, dtype=np.int32)
    if starts is not None:
        st[:n] = starts
    S, bq, bp = sw_hint_stream(
        jnp.asarray(qc), jnp.asarray(ql),
        jnp.asarray(build_matrix8(mat)), jnp.asarray(dense),
        jnp.asarray(st),
        gapopenextend=int(Q), gapextend=int(R), interpret=interpret)
    S, bq, bp = np.asarray(S), np.asarray(bq), np.asarray(bp)
    return [(int(S[i]), int(bq[i]), int(bp[i])) for i in range(n)]


def _hint_endpoints_lax(q, dseqs, lens, mat, Q, R, starts=None):
    import jax.numpy as jnp

    global _hint_lax_jit
    if _hint_lax_jit is None:
        import jax
        _hint_lax_jit = jax.jit(_hint_lax_impl,
                                static_argnames=("Q", "R"))
    n = len(dseqs)
    n_pad = -(-n // 8) * 8
    maxlen = int(lens.max())
    len_pad = -(-maxlen // 2048) * 2048
    dense_t = np.zeros((len_pad, n_pad), dtype=np.int32)
    for i, d in enumerate(dseqs):
        dense_t[: len(d), i] = np.asarray(d, dtype=np.int32)
    QP = mat[q, :].T.astype(np.int32)
    lens_pad = np.zeros(n_pad, dtype=np.int32)
    lens_pad[:n] = lens
    st_pad = np.zeros(n_pad, dtype=np.int32)
    if starts is not None:
        st_pad[:n] = starts
    S, bq, bp = _hint_lax_jit(jnp.asarray(QP), jnp.asarray(dense_t),
                              jnp.asarray(lens_pad), jnp.asarray(st_pad),
                              Q=int(Q), R=int(R))
    S, bq, bp = np.asarray(S), np.asarray(bq), np.asarray(bp)
    return [(int(S[i]), int(bq[i]), int(bp[i])) for i in range(n)]
