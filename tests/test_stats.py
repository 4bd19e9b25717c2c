import math

import pytest

from swipe_tpu import stats


def test_blosum62_gapped_params():
    # row {11, 1, INT2_MAX, 0.267, 0.041, 0.14, 1.9, -30} from the NCBI table
    p = stats.get_params("BLOSUM62", 11, 1)
    assert p is not None
    assert p.lambda_ == pytest.approx(0.267)
    assert p.K == pytest.approx(0.041)
    assert p.H == pytest.approx(0.14)
    assert p.alpha == pytest.approx(1.9)
    assert p.beta == pytest.approx(-30)


def test_blosum62_ungapped_params():
    p = stats.get_params("BLOSUM62", 32767, 32767)
    assert p is not None
    assert p.lambda_ == pytest.approx(0.3176)
    assert p.K == pytest.approx(0.134)


def test_unknown_combination_returns_none():
    assert stats.get_params("BLOSUM62", 1, 1) is None
    assert stats.get_params("NOSUCH", 11, 1) is None


def test_prefs_defaults():
    # BLAST defaults: BLOSUM62 -> 11/1, BLOSUM45 -> 14/2, PAM30 -> 9/1
    assert stats.get_prefs("BLOSUM62") == (11, 1)
    assert stats.get_prefs("BLOSUM45") == (14, 2)
    assert stats.get_prefs("PAM30") == (9, 1)
    assert stats.get_prefs("BLOSUM80") == (11, 1)


def test_nt_params_basic():
    # +1/-3, ungapped row (0,0): lambda=1.374, K=0.711
    p = stats.get_params_nt(1, -3, 0, 0)
    assert p is not None
    assert p.lambda_ == pytest.approx(1.374)
    assert p.K == pytest.approx(0.711)
    # gap costs above the table maxima (2,2) collapse to the ungapped row
    p2 = stats.get_params_nt(1, -3, 5, 2)
    assert p2 == p
    # a listed gapped row
    p3 = stats.get_params_nt(1, -3, 1, 2)
    assert p3 is not None and p3 != p


def test_nt_params_unknown():
    assert stats.get_params_nt(7, -11, 0, 0) is None


def test_length_adjustment_sane():
    p = stats.get_params("BLOSUM62", 11, 1)
    logK = math.log(p.K)
    adj, conv = stats.length_adjustment(
        p.K, logK, p.alpha / p.lambda_, p.beta, 350, 10_000_000, 30_000)
    assert conv
    # fixed-point property: adj <= f(adj) < adj+1-ish
    m = 350 - adj
    n = 10_000_000 - 30_000 * adj
    ell_bar = (p.alpha / p.lambda_) * (logK + math.log(m * n)) + p.beta
    assert adj <= ell_bar
    assert adj > 0


def test_length_adjustment_tiny_search_space():
    p = stats.get_params("BLOSUM62", 11, 1)
    adj, conv = stats.length_adjustment(
        p.K, math.log(p.K), p.alpha / p.lambda_, p.beta, 5, 10, 1)
    assert adj == 0


def test_evalue_model_protein():
    ev = stats.EvalueModel(1, 350, 30_000, 10_000_000,
                           matrixname="BLOSUM62", gapopen=11, gapextend=1)
    assert ev.available
    assert ev.Kmn > 0
    # monotonic, sane magnitudes
    assert ev.evalue(100) > ev.evalue(200)
    assert ev.bits(100) == pytest.approx(
        0.267 / math.log(2) * 100 - math.log(0.041) / math.log(2))
    # score<->expect inverses
    s = ev.min_score_for_expect(10.0)
    assert ev.evalue(s) <= 10.0
    assert ev.evalue(s - 1) > 10.0


def test_evalue_model_unavailable():
    ev = stats.EvalueModel(1, 350, 100, 10000,
                           matrixname="BLOSUM62", gapopen=1, gapextend=1)
    assert not ev.available


def test_evalue_model_tblastx_uses_ungapped():
    ev = stats.EvalueModel(4, 900, 100, 3_000_000, matrixname="BLOSUM62",
                           gapopen=11, gapextend=1)
    assert ev.available
    assert ev.lambda_ == pytest.approx(0.3176)
