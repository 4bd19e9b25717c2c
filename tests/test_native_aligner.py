"""Native C++ aligner vs the NumPy reference implementation."""

import numpy as np
import pytest

from swipe_tpu import native
from swipe_tpu.align import align_py
from swipe_tpu.matrices import ScoreMatrix
from swipe_tpu.ops.sw_ref import sw_scalar

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native/libswipetpu.so not built")


@pytest.fixture(scope="module")
def m62():
    return ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)


def _rand_seq(rng, n):
    return rng.integers(1, 26, size=n, dtype=np.int8)


@pytest.mark.parametrize("seed", range(12))
def test_native_matches_python(m62, seed):
    rng = np.random.default_rng(seed)
    a = _rand_seq(rng, int(rng.integers(8, 80)))
    b = _rand_seq(rng, int(rng.integers(8, 120)))
    if sw_scalar(a, b, m62.matrix, 11, 1) == 0:
        pytest.skip("zero-score pair")
    want = align_py(a, b, m62.matrix, 11, 1)
    got = native.align(a, b, m62.matrix, 11, 1)
    assert got == want


def test_native_with_hint(m62):
    rng = np.random.default_rng(42)
    a = _rand_seq(rng, 50)
    b = np.concatenate([_rand_seq(rng, 30), a[5:40], _rand_seq(rng, 20)])
    full = native.align(a, b, m62.matrix, 11, 1)
    hinted = native.align(a, b, m62.matrix, 11, 1,
                          hint=(full[0], full[3], full[4]))
    assert hinted == full


def test_native_homopolymer_gaps(m62):
    # repeat-rich sequences stress the tie-breaking paths
    a = np.array([1] * 20 + [20] * 5 + [1] * 20, dtype=np.int8)
    b = np.array([1] * 45, dtype=np.int8)
    want = align_py(a, b, m62.matrix, 11, 1)
    got = native.align(a, b, m62.matrix, 11, 1)
    assert got == want


def test_native_large_random(m62):
    rng = np.random.default_rng(7)
    a = _rand_seq(rng, 400)
    b = np.concatenate([_rand_seq(rng, 100), a[50:350], _rand_seq(rng, 100)])
    want = align_py(a, b, m62.matrix, 11, 1)
    got = native.align(a, b, m62.matrix, 11, 1)
    assert got == want


def test_native_empty_subject_fatal(m62):
    # N == 0 used to write H[0] on a size-0 vector (heap corruption);
    # now it trips the score-0 internal-error fatal like align_py
    a = _rand_seq(np.random.default_rng(3), 20)
    empty = np.zeros(0, dtype=np.int8)
    for x, y in ((a, empty), (empty, a)):
        with pytest.raises(RuntimeError, match="Internal error"):
            native.align(x, y, m62.matrix, 11, 1)
