"""BLAST v4 writer/reader roundtrip and ASN.1 defline tests."""

import numpy as np
import pytest

from swipe_tpu.alphabet import MAP_NCBI_AA, MAP_NCBI_NT16, encode
from swipe_tpu.io.asn1 import (Defline, SeqId, encode_defline_set,
                               parse_defline_set, render_defline)
from swipe_tpu.io.blastdb import BlastDatabase
from swipe_tpu.io.blastdb_writer import make_deflines, write_blastdb


def test_asn1_roundtrip_title_only():
    dls = [Defline(title="hello world protein")]
    blob = encode_defline_set(dls)
    back = parse_defline_set(blob)
    assert len(back) == 1
    assert back[0].title == "hello world protein"
    assert render_defline(back[0]) == "hello world protein"


def test_asn1_roundtrip_ids_taxid():
    dls = [
        Defline(title="seq one", seqids=[SeqId("lcl", id_string="abc1")],
                taxid=9606),
        Defline(title="seq two",
                seqids=[SeqId("gi", number=12345),
                        SeqId("sp", accession="P12345", name="TEST_HUMAN",
                              version=2)],
                memberships=1, links=3),
    ]
    blob = encode_defline_set(dls)
    back = parse_defline_set(blob)
    assert back[0].taxid == 9606
    assert render_defline(back[0]) == "lcl|abc1 seq one"
    assert render_defline(back[1]) == "sp|P12345.2|TEST_HUMAN seq two"
    assert render_defline(back[1], show_gis=True) == \
        "gi|12345|sp|P12345.2|TEST_HUMAN seq two"
    assert render_defline(back[1], show_taxid=True) == \
        "sp|P12345.2|TEST_HUMAN|link|3|memb|1 seq two"
    assert back[1].memberships == 1


def test_asn1_long_title():
    t = "x" * 300
    blob = encode_defline_set([Defline(title=t)])
    assert parse_defline_set(blob)[0].title == t


@pytest.mark.parametrize("dbtype", ["aa", "nt"])
def test_blastdb_roundtrip(tmp_path, dbtype):
    rng = np.random.default_rng(0)
    base = str(tmp_path / "testdb")
    if dbtype == "aa":
        raw = ["MKTAYIAK", "WWWW", "A", "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"]
        seqs = [encode(s, MAP_NCBI_AA) for s in raw]
    else:
        raw = ["ACGTACGT", "NNNACGTRYSWKMBDHVN", "A", "ACGT" * 40 + "ACG"]
        seqs = [encode(s, MAP_NCBI_NT16) for s in raw]
    descs = [f"seq{i} some description {i}" for i in range(len(seqs))]
    write_blastdb(base, seqs, make_deflines(descs), dbtype, title="round")
    db = BlastDatabase(base, dbtype)
    assert db.seqcount() == len(seqs)
    assert db.symcount() == sum(len(s) for s in seqs)
    assert db.longest() == max(len(s) for s in seqs)
    assert db.title == "round"
    symtype = 1 if dbtype == "aa" else 0
    for i, s in enumerate(seqs):
        got, ntlen = db.get_sequence(i, symtype)
        assert list(got) == list(s), (i, list(got), list(s))
        assert ntlen == len(s)
        assert db.get_header(i) == descs[i]
    if dbtype == "nt":
        # reverse complement via the reader
        from swipe_tpu.alphabet import revcompl
        got, _ = db.get_sequence(1, 0, dstrand=1)
        assert list(got) == list(revcompl(seqs[1]))
        # translation via the reader
        from swipe_tpu.alphabet import translate
        got, ntlen = db.get_sequence(3, 3, dstrand=1, dframe=2)
        assert list(got) == list(translate(seqs[3], 1, 2, 1))
        assert ntlen == len(seqs[3])


def test_blastdb_multivolume_alias(tmp_path):
    rng = np.random.default_rng(1)
    seqs1 = [rng.integers(1, 26, size=20, dtype=np.int8) for _ in range(3)]
    seqs2 = [rng.integers(1, 26, size=30, dtype=np.int8) for _ in range(2)]
    write_blastdb(str(tmp_path / "vol0"), seqs1,
                  make_deflines([f"a{i}" for i in range(3)]), "aa")
    write_blastdb(str(tmp_path / "vol1"), seqs2,
                  make_deflines([f"b{i}" for i in range(2)]), "aa")
    (tmp_path / "multi.pal").write_text(
        "TITLE  combined db\nDBLIST vol0 vol1\n")
    db = BlastDatabase(str(tmp_path / "multi"), "aa")
    assert db.title == "combined db"
    assert db.seqcount() == 5
    got, _ = db.get_sequence(4, 1)
    assert list(got) == list(seqs2[1])
    assert db.get_header(3) == "b0"


def test_blastdb_taxid_filter(tmp_path):
    seqs = [np.array([1, 2, 3], dtype=np.int8) for _ in range(3)]
    dls = make_deflines(["t1", "t2", "t3"], taxids=[100, 200, 300])
    write_blastdb(str(tmp_path / "tax"), seqs, dls, "aa")
    (tmp_path / "taxids.txt").write_text("200\n300\n")
    db = BlastDatabase(str(tmp_path / "tax"), "aa",
                       taxid_file=str(tmp_path / "taxids.txt"))
    assert not db.check_inclusion(0)
    assert db.check_inclusion(1)
    assert db.check_inclusion(2)


def test_blastdb_msk_masked_subset(tmp_path):
    import struct
    seqs = [np.array([1 + i], dtype=np.int8) for i in range(8)]
    write_blastdb(str(tmp_path / "base"), seqs,
                  make_deflines([f"m{i}" for i in range(8)],
                                ), "aa")
    # add membership bit 1 to deflines of the even seqs
    from swipe_tpu.io.asn1 import Defline
    dls = [[Defline(title=f"m{i}", memberships=1 if i % 2 == 0 else 0)]
           for i in range(8)]
    write_blastdb(str(tmp_path / "base"), seqs, dls, "aa")
    # oid bitmap: maxoid 7, bits for even seqs (MSB-first per byte)
    bits = 0
    for i in range(8):
        if i % 2 == 0:
            bits |= 1 << (7 - i)
    (tmp_path / "sub.msk").write_bytes(struct.pack(">I", 8) + bytes([bits]))
    (tmp_path / "inner.pal").write_text(
        "TITLE  subset\nDBLIST base\nOIDLIST sub.msk\n"
        "LENGTH 4\nNSEQ 4\nMAXOID 7\nMEMB_BIT 1\n")
    (tmp_path / "sub.pal").write_text(
        "TITLE  subset\nDBLIST inner\nMEMB_BIT 1\n")
    db = BlastDatabase(str(tmp_path / "sub"), "aa")
    assert db.is_masked()
    assert db.seqcount_masked() == 4
    assert db.symcount_masked() == 4
    incl = [db.check_inclusion(i) for i in range(8)]
    assert incl == [True, False] * 4
