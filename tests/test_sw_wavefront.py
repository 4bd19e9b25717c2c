"""Anti-diagonal wavefront kernel (one query x one giant sequence)."""

import numpy as np
import pytest

import swipe_tpu.ops.sw_wavefront as W
from swipe_tpu.matrices import ScoreMatrix
from swipe_tpu.ops.sw_ref import sw_numpy_many
from swipe_tpu.ops.sw_stream import build_matrix8, build_qcodes


@pytest.fixture(scope="module")
def m62():
    return ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)


def _score(queries, seq, m, qlen_pad):
    qc, _ = build_qcodes(queries, qlen_pad)
    mq = W.build_mq(qc, build_matrix8(m.matrix))
    return np.asarray(W.sw_wavefront_scores(
        mq, seq, gapopenextend=12, gapextend=1, interpret=True))


def test_wavefront_matches_oracle(m62):
    # hits planted across strip boundaries (1024-column cuts) and the
    # in-strip block boundaries (128-column cuts) must score exactly;
    # the wavefront's lazy-E prefix and rolled boundary exports are the
    # moving parts under test
    rng = np.random.default_rng(5)
    queries = [rng.integers(1, 26, size=n, dtype=np.int8)
               for n in (50, 23, 64)]
    seq = rng.integers(1, 26, size=2500, dtype=np.int8)
    seq[1000:1050] = queries[0][:50]          # crosses strip 0 -> 1
    seq[120:143] = queries[1]                 # crosses block 0 -> 1
    got = _score(queries, seq, m62, 64)
    want = np.array([sw_numpy_many(q, [seq], m62.matrix, 11, 1)[0]
                     for q in queries])
    assert np.array_equal(got, want)


def test_wavefront_segment_carry(m62, monkeypatch):
    # the edge ring + running max thread through HBM between segments;
    # with 2-strip segments a hit crossing the segment cut must still be
    # exact, and the tail segment buckets to power-of-two strips
    monkeypatch.setattr(W, "SEG_STRIPS", 2)
    rng = np.random.default_rng(6)
    queries = [rng.integers(1, 26, size=n, dtype=np.int8) for n in (50, 23)]
    seq = rng.integers(1, 26, size=7000, dtype=np.int8)
    seq[2020:2070] = queries[0][:50]          # crosses segment cut (2048)
    got = _score(queries, seq, m62, 64)
    want = np.array([sw_numpy_many(q, [seq], m62.matrix, 11, 1)[0]
                     for q in queries])
    assert np.array_equal(got, want)


def test_wavefront_gap_spans_boundaries(m62):
    # an alignment whose GAP (not just a match run) spans the strip cut:
    # the E chain must survive the edge ring with its exact value
    rng = np.random.default_rng(7)
    q = np.concatenate([np.arange(1, 21, dtype=np.int8)] * 2)
    left, right = q[:20], q[20:]
    seq = rng.integers(1, 26, size=2048, dtype=np.int8)
    seq[1004:1024] = left                     # ends exactly at the cut
    seq[1034:1054] = right                    # resumes after a 10-gap
    got = _score([q], seq, m62, 40)
    want = sw_numpy_many(q, [seq], m62.matrix, 11, 1)
    assert got[0] == want[0]


def test_wavefront_zero_and_short(m62):
    # scores of 0 (nothing aligns) and single-symbol queries
    q0 = np.array([4], dtype=np.int8)         # C (rare)
    seq = np.full(1024, 10, dtype=np.int8)
    got = _score([q0], seq, m62, 8)
    want = sw_numpy_many(q0, [seq], m62.matrix, 11, 1)
    assert got[0] == want[0]
