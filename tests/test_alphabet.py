import numpy as np
import pytest

from swipe_tpu import alphabet as al


def test_aa_map_roundtrip():
    # every display symbol maps back to its own code
    for code, ch in enumerate(al.SYM_NCBI_AA):
        if ch == "#":
            continue
        assert al.MAP_NCBI_AA[ord(ch)] == code
        if ch.isalpha():
            assert al.MAP_NCBI_AA[ord(ch.lower())] == code


def test_nt16_map_is_acgt_bitmask():
    assert al.MAP_NCBI_NT16[ord("A")] == 1
    assert al.MAP_NCBI_NT16[ord("C")] == 2
    assert al.MAP_NCBI_NT16[ord("G")] == 4
    assert al.MAP_NCBI_NT16[ord("T")] == 8
    assert al.MAP_NCBI_NT16[ord("U")] == 8
    assert al.MAP_NCBI_NT16[ord("N")] == 15
    # R = A|G, Y = C|T, S = C|G, W = A|T, ...
    assert al.MAP_NCBI_NT16[ord("R")] == 5
    assert al.MAP_NCBI_NT16[ord("Y")] == 10


def test_invalid_chars_dropped():
    seq = al.encode("AC GT\n1a", al.MAP_NCBI_NT16)
    assert list(seq) == [1, 2, 4, 8, 1]


def test_revcompl():
    seq = al.encode("ACGT", al.MAP_NCBI_NT16)
    rc = al.revcompl(seq)
    assert al.decode(rc, al.SYM_NCBI_NT16) == "acgt"
    # ambiguity codes complement by bit swap: R (AG) -> Y (CT)
    seq = al.encode("R", al.MAP_NCBI_NT16)
    assert al.decode(al.revcompl(seq), al.SYM_NCBI_NT16) == "y"


def test_translate_standard_code():
    # ATG GCC TAA -> M A *
    dna = al.encode("ATGGCCTAA", al.MAP_NCBI_NT16)
    aa = al.translate(dna, 0, 0, 1)
    assert al.decode(aa, al.SYM_NCBI_AA) == "MA*"
    # frame 1 drops the first base: TGG CCT AA -> W P
    aa = al.translate(dna, 0, 1, 1)
    assert al.decode(aa, al.SYM_NCBI_AA) == "WP"
    # reverse strand frame 0: revcompl = TTAGGCCAT -> L G H
    aa = al.translate(dna, 1, 0, 1)
    assert al.decode(aa, al.SYM_NCBI_AA) == "LGH"


def test_translate_ambiguity_inference():
    # RAT = A or G in first position: AAT=N, GAT=D -> B
    dna = al.encode("RAT", al.MAP_NCBI_NT16)
    assert al.decode(al.translate(dna, 0, 0, 1), al.SYM_NCBI_AA) == "B"
    # SAA: CAA=Q, GAA=E -> Z
    dna = al.encode("SAA", al.MAP_NCBI_NT16)
    assert al.decode(al.translate(dna, 0, 0, 1), al.SYM_NCBI_AA) == "Z"
    # NNN -> X
    dna = al.encode("NNN", al.MAP_NCBI_NT16)
    assert al.decode(al.translate(dna, 0, 0, 1), al.SYM_NCBI_AA) == "X"
    # GCN: all alanine -> A
    dna = al.encode("GCN", al.MAP_NCBI_NT16)
    assert al.decode(al.translate(dna, 0, 0, 1), al.SYM_NCBI_AA) == "A"


def test_translate_gap_codon_is_x():
    t = al.translation_table(1)
    assert t[0] == al.MAP_NCBI_AA[ord("X")]


@pytest.mark.parametrize("gencode", sorted(al.GENETIC_CODES))
def test_all_gencode_tables_build(gencode):
    t = al.translation_table(gencode)
    assert t.shape == (4096,)
    assert (t >= 0).all()


def test_vertebrate_mito_differences():
    # AGA is R in standard, * in vertebrate mitochondrial
    dna = al.encode("AGA", al.MAP_NCBI_NT16)
    assert al.decode(al.translate(dna, 0, 0, 1), al.SYM_NCBI_AA) == "R"
    assert al.decode(al.translate(dna, 0, 0, 2), al.SYM_NCBI_AA) == "*"
    # TGA is * in standard, W in vertebrate mitochondrial
    dna = al.encode("TGA", al.MAP_NCBI_NT16)
    assert al.decode(al.translate(dna, 0, 0, 1), al.SYM_NCBI_AA) == "*"
    assert al.decode(al.translate(dna, 0, 0, 2), al.SYM_NCBI_AA) == "W"
