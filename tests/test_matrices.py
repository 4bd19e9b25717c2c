import numpy as np
import pytest

from swipe_tpu.alphabet import MAP_NCBI_AA
from swipe_tpu.matrices import BUILTIN_MATRICES, ScoreMatrix


def _s(m, a, b):
    return m.matrix[MAP_NCBI_AA[ord(a)], MAP_NCBI_AA[ord(b)]]


def test_blosum62_spot_values():
    m = ScoreMatrix.builtin("BLOSUM62")
    assert _s(m, "A", "A") == 4
    assert _s(m, "W", "W") == 11
    assert _s(m, "W", "A") == -3
    assert _s(m, "A", "W") == -3
    assert _s(m, "*", "*") == 1
    assert _s(m, "A", "*") == -4
    assert _s(m, "B", "N") == 4  # B row vs N column
    assert _s(m, "N", "B") == 4
    assert _s(m, "B", "D") == 4
    assert _s(m, "E", "Z") == 4


def test_blosum62_limits():
    m = ScoreMatrix.builtin("BLOSUM62")
    assert m.hi == 11
    assert m.lo == -4
    assert m.bias == 4
    assert m.scorelimit_7 == 117
    assert m.scorelimit_16 == 65525


def test_unset_entries_are_minus_one():
    m = ScoreMatrix.builtin("BLOSUM62")
    assert m.matrix[0, 0] == -1  # gap row/col never set
    assert m.matrix[31, 31] == -1


@pytest.mark.parametrize("name", BUILTIN_MATRICES)
def test_all_builtins_parse(name):
    m = ScoreMatrix.builtin(name, symtype=5 if name == "IDENTITY_5_1" else 1)
    assert m.matrix.shape == (32, 32)
    assert m.hi > 0
    assert m.lo < 0


def test_pam30_spot_values():
    m = ScoreMatrix.builtin("PAM30")
    assert _s(m, "W", "W") == 13
    assert _s(m, "A", "A") == 6


def test_nucleotide_matrix():
    m = ScoreMatrix.nucleotide(1, -3)
    a = MAP_NCBI_AA  # not used; nt codes directly
    assert m.matrix[1, 1] == 1  # A vs A
    assert m.matrix[1, 2] == -3  # A vs C
    assert m.matrix[15, 15] == 1  # N vs N scores as a match
    assert m.matrix[0, 1] == -1  # gap row unset
    assert m.hi == 1
    assert m.lo == -3


def test_matrix_file_roundtrip(tmp_path):
    m0 = ScoreMatrix.builtin("BLOSUM62")
    p = tmp_path / "custom.mat"
    # re-render in NCBI format and parse back
    import swipe_tpu.matrices as mats
    import os
    src = os.path.join(os.path.dirname(mats.__file__), "data", "blosum62.mat")
    p.write_text(open(src).read())
    m1 = ScoreMatrix.from_file(str(p))
    assert (m0.matrix == m1.matrix).all()
