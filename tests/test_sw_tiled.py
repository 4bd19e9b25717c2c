"""Tiled (register-blocked) kernel validation.

Three layers:
1. a NumPy emulator of the exact tile/boundary algorithm (same update
   order, boundary rows, lagged reads) fuzzed against the scalar oracle —
   fast and covers the tricky logic;
2. one small interpret-mode smoke of the actual Pallas kernel (block
   carries + a tile-crossing alignment);
3. full-scale validation runs on real TPU hardware (10k sequences,
   0 mismatches — see commit history); interpret mode is too slow for that.
"""

import numpy as np
import pytest

from swipe_tpu.batching import PackedChunk
from swipe_tpu.matrices import ScoreMatrix
from swipe_tpu.ops.sw_pallas import PAD_SYMBOL, SEG_BLK, build_qpt
from swipe_tpu.ops.sw_ref import sw_numpy_many, sw_scalar
from swipe_tpu.ops.sw_tiled import TQ, sw_scores_tiled

NEG = -(1 << 30)


@pytest.fixture(scope="module")
def m62():
    return ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)


def emulate_tiled(q, d, mat, Q, R, tq=8, seg_blk=4):
    """NumPy mirror of _tiled_kernel's algorithm (small tiles for testing)."""
    m, n = len(q), len(d)
    nt = -(-m // tq)
    mpad = nt * tq
    QP = np.full((mpad, 32), -128, dtype=np.int64)
    QP[:m] = np.asarray(mat, dtype=np.int64)[np.asarray(q, dtype=np.int64)]
    npad = -(-n // seg_blk) * seg_blk
    dd = np.full(npad, PAD_SYMBOL, dtype=np.int64)
    dd[:n] = d
    H = np.zeros((nt, tq))
    E = np.full((nt, tq), NEG)
    S = np.zeros((nt, tq))
    iota = np.arange(tq)
    qr = iota * R
    foff = Q + np.maximum(iota - 1, 0) * R
    bh = np.zeros(seg_blk)
    bf = np.zeros(seg_blk)
    for b in range(npad // seg_blk):
        old_last = 0.0
        for t in range(nt):
            h = H[t].copy()
            e = E[t].copy()
            s = S[t].copy()
            new_old_last = h[tq - 1]
            last_read = old_last
            for j in range(seg_blk):
                cur = bh[j]
                carry = NEG if t == 0 else bf[j]
                diag0 = 0.0 if t == 0 else last_read
                p = QP[t * tq:(t + 1) * tq, dd[b * seg_blk + j]]
                e = np.maximum(e - R, h - Q)
                hd = np.concatenate(([diag0], h[:-1]))
                hnof = np.maximum(np.maximum(hd + p, e), 0)
                tacc = np.maximum.accumulate(hnof + qr)
                f = np.concatenate(([NEG], tacc[:-1])) - foff
                f = np.maximum(f, carry - iota * R)
                h = np.maximum(hnof, f)
                s = np.maximum(s, h)
                bh[j] = h[tq - 1]
                bf[j] = max(tacc[tq - 1] - (Q + (tq - 1) * R),
                            carry - tq * R)
                last_read = cur
            H[t] = h
            E[t] = e
            S[t] = s
            old_last = new_old_last
    return int(S.max())


@pytest.mark.parametrize("seed", range(4))
def test_tiled_algorithm_fuzz(m62, seed):
    rng = np.random.default_rng(seed)
    for _ in range(60):
        q = rng.integers(1, 26, size=int(rng.integers(5, 40)), dtype=np.int8)
        d = rng.integers(1, 26, size=int(rng.integers(5, 60)), dtype=np.int8)
        got = emulate_tiled(q, d, m62.matrix, 12, 1)
        want = sw_scalar(q, d, m62.matrix, 11, 1)
        assert got == want, (len(q), len(d), got, want)


def test_tiled_pallas_interpret_smoke(m62):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    q = rng.integers(1, 26, size=100, dtype=np.int8)  # 2 tiles of TQ=64
    # one segment of 2 blocks; include a tile-boundary-crossing alignment
    seqs = [q[30:80].copy(),
            rng.integers(1, 26, size=64, dtype=np.int8),
            rng.integers(1, 26, size=40, dtype=np.int8)]
    L = 2 * SEG_BLK
    data = np.full((L, 8), PAD_SYMBOL, dtype=np.int8)
    snos = np.full((1, 8), -1, dtype=np.int64)
    for lane, s in enumerate(seqs):
        data[:len(s), lane] = s
        snos[0, lane] = lane
    seg_ids = np.zeros(L // SEG_BLK + 1, dtype=np.int32)
    ch = PackedChunk(data, seg_ids, snos, np.zeros_like(snos))
    qpt = build_qpt([q], m62.matrix, qlen_pad=2 * TQ)
    got = np.asarray(sw_scores_tiled(
        jnp.asarray(qpt), jnp.asarray(ch.data), jnp.asarray(ch.seg_ids),
        nsegs=1, gapopenextend=12, gapextend=1, interpret=True))
    want = sw_numpy_many(q, seqs, m62.matrix, 11, 1)
    for lane in range(3):
        assert got[0, 0, lane] == want[lane], (lane, got[0, 0, lane],
                                               want[lane])


def test_tiled_rejects_bad_qlen(m62):
    import jax.numpy as jnp
    qpt = build_qpt([np.ones(10, dtype=np.int8)], m62.matrix, qlen_pad=96)
    db = np.full((SEG_BLK, 8), PAD_SYMBOL, dtype=np.int8)
    with pytest.raises(ValueError, match="TQ"):
        sw_scores_tiled(jnp.asarray(qpt), jnp.asarray(db),
                        jnp.zeros(2, jnp.int32), nsegs=1,
                        gapopenextend=12, gapextend=1, interpret=True)
