"""Cross-checks between the scalar and vectorized SW oracles."""

import numpy as np
import pytest

from swipe_tpu.matrices import ScoreMatrix
from swipe_tpu.ops.sw_ref import sw_numpy, sw_numpy_many, sw_scalar


@pytest.fixture(scope="module")
def blosum62():
    return ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)


def _rand_seq(rng, n):
    # amino-acid codes 1..25 (the codes real sequences use)
    return rng.integers(1, 26, size=n, dtype=np.int8)


def test_identical_sequences(blosum62):
    rng = np.random.default_rng(0)
    q = _rand_seq(rng, 40)
    diag = blosum62.matrix[q, q].sum()
    assert sw_scalar(q, q, blosum62.matrix, 11, 1) == diag
    assert sw_numpy(q, q, blosum62.matrix, 11, 1) == diag


def test_empty_overlap_scores_zero(blosum62):
    # sequences with no positive-scoring pair: score 0
    q = np.array([20], dtype=np.int8)  # W
    d = np.array([1], dtype=np.int8)   # A, W-A = -3
    assert sw_scalar(q, d, blosum62.matrix, 11, 1) == 0
    assert sw_numpy(q, d, blosum62.matrix, 11, 1) == 0


def test_gap_is_taken_when_beneficial(blosum62):
    # query = AAWWAA, db = AAWXWAA-like: an insertion should be bridged
    from swipe_tpu.alphabet import MAP_NCBI_AA, encode
    q = encode("AAWWAAWW", MAP_NCBI_AA)
    d = encode("AAWWCCCAAWW", MAP_NCBI_AA)
    s_scalar = sw_scalar(q, d, blosum62.matrix, 11, 1)
    s_np = sw_numpy(q, d, blosum62.matrix, 11, 1)
    assert s_scalar == s_np
    # ungapped best (AAWW = 4+4+11+11 = 30) < gapped (two AAWW blocks
    # bridged by a 3-residue gap: 60 - 11 - 3 = 46)
    assert s_scalar == 46


@pytest.mark.parametrize("seed", range(6))
def test_scalar_vs_numpy_random(blosum62, seed):
    rng = np.random.default_rng(seed)
    q = _rand_seq(rng, int(rng.integers(5, 60)))
    seqs = [_rand_seq(rng, int(rng.integers(1, 80))) for _ in range(16)]
    got = sw_numpy_many(q, seqs, blosum62.matrix, 11, 1)
    want = [sw_scalar(q, d, blosum62.matrix, 11, 1) for d in seqs]
    assert list(got) == want


@pytest.mark.parametrize("go,ge", [(11, 1), (5, 2), (32767, 32767), (0, 1)])
def test_gap_penalty_variants(blosum62, go, ge):
    rng = np.random.default_rng(99)
    q = _rand_seq(rng, 30)
    seqs = [_rand_seq(rng, 45) for _ in range(8)]
    got = sw_numpy_many(q, seqs, blosum62.matrix, go, ge)
    want = [sw_scalar(q, d, blosum62.matrix, go, ge) for d in seqs]
    assert list(got) == want


def test_dense_input_with_lengths(blosum62):
    rng = np.random.default_rng(7)
    q = _rand_seq(rng, 25)
    lens = np.array([10, 30, 1, 22])
    dense = np.zeros((4, 30), dtype=np.int8)
    for i, L in enumerate(lens):
        dense[i, :L] = _rand_seq(rng, L)
    got = sw_numpy_many(q, dense, blosum62.matrix, 11, 1, lengths=lens)
    want = [sw_scalar(q, dense[i, : lens[i]], blosum62.matrix, 11, 1)
            for i in range(4)]
    assert list(got) == want


def test_nucleotide_scoring():
    m = ScoreMatrix.nucleotide(1, -3)
    rng = np.random.default_rng(3)
    q = rng.integers(1, 16, size=50, dtype=np.int8)
    d = rng.integers(1, 16, size=70, dtype=np.int8)
    assert sw_scalar(q, d, m.matrix, 5, 2) == sw_numpy(q, d, m.matrix, 5, 2)
