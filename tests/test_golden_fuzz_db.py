"""Adversarial DB-reader goldens (VERDICT r4 item 7).

Three new golden classes over hand-built / randomized BLAST v4
artifacts, each byte-compared against the reference binary:

* the SEQ-ID ZOO: deflines exercising EVERY Seq-id choice the
  reference's BER parser handles (/root/reference/asnparse.cc:652-751 —
  lcl str/int, gi, gb/emb/dbj/pir/prf/sp/tr/ref/tpg/tpe/tpd with
  name/accession/version combinations, pdb single and doubled chains,
  pat granted and pending applications, gnl str/int tags), rendered
  through -m 0, tabular -m 9, and the dump utility;
* ADVERSARIAL ALIAS GRAPHS (/root/reference/database.cc:406-489,
  775-860): a diamond (two aliases listing the same volume — the
  reference double-counts it; so must we), an alias chain deeper than
  the reference's single supported nesting level (must fail with the
  same message), and volumes referenced through a subdirectory path;
* CORRUPT VOLUMES: missing .pin/.phr/.psq, an empty (unmappable) .pin,
  a wrong version number, GILIST aliases, and the MEMB_BIT alias-shape
  violations — both programs must fail with byte-identical stderr
  (db_open_xin's fatal ladder, database.cc:543-570, 804, 851).

The randomized generators here are shared with tools/fuzz_blastdb.py.
"""

import io
import os
import struct
import subprocess
from contextlib import redirect_stderr, redirect_stdout

import numpy as np
import pytest

from swipe_tpu.alphabet import MAP_NCBI_AA, encode
from swipe_tpu.io.asn1 import Defline, SeqId

from test_golden_foreign_db import _write_volume
from test_golden_parity import (REF_SRC, _normalize, ref_swipe,  # noqa: F401
                                run_ours, run_ref)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_SRC), reason="reference sources not available")

AA = list("ARNDCQEGHILKMFPSTWYV")


# ---- randomized defline generator (shared with tools/fuzz_blastdb.py) ----

_WORDS = ["protein", "putative", "kinase", "subunit", "alpha", "beta",
          "precursor", "fragment", "hypothetical", "chain"]


def _rs(rng, lo=2, hi=8):
    n = int(rng.integers(lo, hi))
    return "".join(chr(int(c)) for c in rng.integers(65, 91, n))


def random_seqid(rng) -> SeqId:
    """One random Seq-id over every choice the reference parser walks."""
    kind = str(rng.choice(
        ["lcl", "gi", "gb", "emb", "dbj", "pir", "prf", "sp", "ref",
         "tpg", "tpe", "tpd", "pdb", "pat", "gnl", "bbs", "gim"]))
    if kind in ("gi", "bbs", "gim"):
        return SeqId(kind=kind, number=int(rng.integers(1, 10**8)))
    if kind == "lcl":
        if rng.integers(2):
            return SeqId(kind=kind, id_string=_rs(rng))
        return SeqId(kind=kind, id_integer=int(rng.integers(1, 10**6)))
    if kind == "gnl":
        if rng.integers(2):
            return SeqId(kind=kind, gnl_db=_rs(rng), id_string=_rs(rng))
        return SeqId(kind=kind, gnl_db=_rs(rng),
                     id_integer=int(rng.integers(1, 10**6)))
    if kind == "pdb":
        # chain 32 = blank, >95 renders doubled (asnparse.cc pdb chain
        # quirk); cover blank, single upper, and doubled
        chain = int(rng.choice([32, 65, 66, 90, 97, 122]))
        return SeqId(kind=kind, pdb_molid=_rs(rng, 4, 5), pdb_chain=chain)
    if kind == "pat":
        return SeqId(kind=kind, pat_sequence=int(rng.integers(1, 99)),
                     pat_country=str(rng.choice(["US", "EP", "WO"])),
                     pat_granted=int(rng.integers(2)),
                     pat_id=_rs(rng, 5, 9))
    sid = SeqId(kind=kind, accession=_rs(rng, 6, 9))
    if rng.integers(2):
        sid.name = _rs(rng, 6, 11)
    if rng.integers(2):
        sid.version = int(rng.integers(1, 9))
    if kind == "sp" and rng.integers(3) == 0:
        sid.release = "unreviewed"        # renders as tr|
    return sid


def random_defline(rng) -> Defline:
    d = Defline(title=" ".join(
        str(rng.choice(_WORDS)) for _ in range(int(rng.integers(1, 4)))))
    d.seqids = [random_seqid(rng) for _ in range(int(rng.integers(1, 4)))]
    if rng.integers(2):
        d.taxid = int(rng.integers(1, 10**6))
    return d


def _compare(ref_swipe, args):
    ref = _normalize(run_ref(ref_swipe, args))
    ours = _normalize(run_ours(args))
    assert ours == ref


def run_ref_fail(ref_bin, args):
    """Reference run that must FAIL: returns (rc, stderr)."""
    r = subprocess.run([ref_bin] + args, capture_output=True, timeout=300)
    assert r.returncode != 0, (r.returncode, r.stdout.decode()[:500])
    return r.returncode, r.stderr.decode()


def run_ours_fail(args, backend="lax"):
    """Our CLI run that must FAIL: returns (rc, stderr)."""
    from swipe_tpu.cli import main
    buf, err = io.StringIO(), io.StringIO()
    rc = None
    with redirect_stdout(buf), redirect_stderr(err):
        try:
            rc = main(args + ["--backend", backend])
        except SystemExit as e:
            rc = e.code
    assert rc not in (0, None), (rc, buf.getvalue()[:500])
    return rc, err.getvalue()


def _fail_compare(ref_swipe, args):
    rrc, rerr = run_ref_fail(ref_swipe, args)
    orc, oerr = run_ours_fail(args)
    assert oerr == rerr, (oerr, rerr)
    assert orc == rrc, (orc, rrc)


# ---- class 1: the seq-id zoo ------------------------------------------------


def test_golden_seqid_zoo(ref_swipe, tmp_path):
    """Every Seq-id choice through header parsing + all render paths.

    A fixed sweep covering each kind's branches, then a randomized tail;
    -m 0 renders deflines via show_header, -m 9 re-renders with gi
    forcing, dump re-encodes FASTA ids (asnparse.cc:652-751 parity)."""
    rng = np.random.default_rng(201)
    qp = "".join(rng.choice(AA, 48))
    fixed = [
        [SeqId(kind="lcl", id_string="plain_local")],
        [SeqId(kind="lcl", id_integer=42)],
        [SeqId(kind="gi", number=123456),
         SeqId(kind="gb", accession="AF123456", name="AF123456",
               version=2)],
        [SeqId(kind="ref", accession="NP_001234", version=1)],
        [SeqId(kind="sp", accession="P12345", name="TEST_HUMAN")],
        [SeqId(kind="sp", accession="Q99999", name="TR_ENTRY",
               release="unreviewed")],
        [SeqId(kind="pdb", pdb_molid="1ABC", pdb_chain=65)],
        [SeqId(kind="pdb", pdb_molid="2XYZ", pdb_chain=32)],
        [SeqId(kind="pdb", pdb_molid="3QQQ", pdb_chain=97)],  # doubled
        [SeqId(kind="pat", pat_sequence=7, pat_country="US",
               pat_granted=1, pat_id="5168062")],
        [SeqId(kind="pat", pat_sequence=3, pat_country="EP",
               pat_granted=0, pat_id="20010384")],
        [SeqId(kind="gnl", gnl_db="TIGR", id_string="contig_77")],
        [SeqId(kind="gnl", gnl_db="SRA", id_integer=991)],
        [SeqId(kind="pir", accession="", name="A01243")],
        [SeqId(kind="prf", accession="", name="0806162A")],
        [SeqId(kind="tpg", accession="DAA00017", version=1),
         SeqId(kind="gi", number=987)],
        [SeqId(kind="emb", accession="CAA00001", name="HSXYZ")],
        [SeqId(kind="dbj", accession="BAA00001", name="")],
        [SeqId(kind="bbs", number=555)],
        [SeqId(kind="gim", number=777)],
    ]
    seqs, dls = [], []
    for i, ids in enumerate(fixed):
        s = "".join(rng.choice(AA, int(rng.integers(30, 90))))
        if i % 4 == 0:
            s = s[:5] + qp[4:40] + s[5:]
        seqs.append(encode(s, MAP_NCBI_AA))
        d = Defline(title=f"zoo member {i}")
        d.seqids = ids
        if i % 3 == 0:
            d.taxid = 9606
        dls.append([d])
    for i in range(12):                      # randomized tail
        s = "".join(rng.choice(AA, int(rng.integers(30, 90))))
        seqs.append(encode(s, MAP_NCBI_AA))
        dls.append([random_defline(rng) for _ in
                    range(int(rng.integers(1, 3)))])
    _write_volume(str(tmp_path / "zoo"), seqs, dls, True, title="seqid zoo")
    (tmp_path / "q.fa").write_text(f">q zoo query\n{qp}\n")
    base = ["-d", str(tmp_path / "zoo"), "-i", str(tmp_path / "q.fa"),
            "-p", "blastp", "-e", "1e6"]
    for extra in (["-m", "0"], ["-m", "9"], ["-m", "0", "-I"]):
        _compare(ref_swipe, base + extra)
    _compare(ref_swipe, ["-d", str(tmp_path / "zoo"), "-p", "blastp",
                         "-N", "1"])
    _compare(ref_swipe, ["-d", str(tmp_path / "zoo"), "-p", "blastp",
                         "-N", "2"])


# ---- class 2: adversarial alias graphs -------------------------------------


def _small_volume(tmp_path, name, rng, qp, planted=2, n=7):
    seqs, dls = [], []
    for i in range(n):
        s = "".join(rng.choice(AA, int(rng.integers(30, 90))))
        if i == planted:
            s = s[:6] + qp[3:40] + s[6:]
        seqs.append(encode(s, MAP_NCBI_AA))
        dls.append([Defline(title=f"{name} seq {i}")])
    _write_volume(str(tmp_path / name), seqs, dls, True, title=name)


def test_golden_alias_diamond(ref_swipe, tmp_path):
    """A diamond: top.pal lists two aliases that both resolve the SAME
    volume.  The reference opens the volume twice and double-counts its
    sequences and symbols in the statistics; the hit list shows each
    sequence twice.  Whatever one thinks of that, parity demands it."""
    rng = np.random.default_rng(202)
    qp = "".join(rng.choice(AA, 50))
    _small_volume(tmp_path, "dia", rng, qp)
    (tmp_path / "left.pal").write_text("TITLE left arm\nDBLIST dia\n")
    (tmp_path / "right.pal").write_text("TITLE right arm\nDBLIST dia\n")
    (tmp_path / "top.pal").write_text("TITLE diamond\nDBLIST left right\n")
    (tmp_path / "q.fa").write_text(f">q diamond\n{qp}\n")
    base = ["-d", str(tmp_path / "top"), "-i", str(tmp_path / "q.fa"),
            "-p", "blastp", "-e", "1e6"]
    for extra in (["-m", "0"], ["-m", "9"]):
        _compare(ref_swipe, base + extra)


def test_golden_alias_too_deep(ref_swipe, tmp_path):
    """An alias chain one level beyond the reference's supported nesting
    (top -> mid -> bottom -> volume): the reference treats the
    third-level alias name as a volume basename and fails with the
    db_open_xin message; ours must fail identically."""
    rng = np.random.default_rng(203)
    qp = "".join(rng.choice(AA, 50))
    _small_volume(tmp_path, "deepvol", rng, qp)
    (tmp_path / "bottom.pal").write_text("TITLE b\nDBLIST deepvol\n")
    (tmp_path / "mid.pal").write_text("TITLE m\nDBLIST bottom\n")
    (tmp_path / "top.pal").write_text("TITLE t\nDBLIST mid\n")
    (tmp_path / "q.fa").write_text(f">q deep\n{qp}\n")
    _fail_compare(ref_swipe, ["-d", str(tmp_path / "top"),
                              "-i", str(tmp_path / "q.fa"),
                              "-p", "blastp", "-m", "9"])


def test_golden_alias_subdir(ref_swipe, tmp_path):
    """DBLIST entries resolved relative to the ALIAS's directory
    (addpath semantics, database.cc:759-773): a volume living in a
    subdirectory referenced as sub/vol."""
    rng = np.random.default_rng(204)
    qp = "".join(rng.choice(AA, 50))
    (tmp_path / "sub").mkdir()
    _small_volume(tmp_path / "sub", "subvol", rng, qp)
    (tmp_path / "top.pal").write_text(
        "TITLE subdir alias\nDBLIST sub/subvol\n")
    (tmp_path / "q.fa").write_text(f">q subdir\n{qp}\n")
    base = ["-d", str(tmp_path / "top"), "-i", str(tmp_path / "q.fa"),
            "-p", "blastp", "-e", "1e6"]
    for extra in (["-m", "0"], ["-m", "9"]):
        _compare(ref_swipe, base + extra)


# ---- class 3: corrupt volumes ----------------------------------------------


def test_golden_corrupt_volumes(ref_swipe, tmp_path):
    """The db_open_xin fatal ladder plus the alias-shape fatals, stderr
    byte-compared (database.cc:543-570, 456, 804, 851)."""
    rng = np.random.default_rng(205)
    qp = "".join(rng.choice(AA, 40))
    (tmp_path / "q.fa").write_text(f">q corrupt\n{qp}\n")

    def fresh(name):
        _small_volume(tmp_path, name, rng, qp)
        return tmp_path / name

    args = lambda name: ["-d", str(tmp_path / name),
                         "-i", str(tmp_path / "q.fa"),
                         "-p", "blastp", "-m", "9"]

    # missing .psq (fatal format carries a trailing newline — parity
    # includes the blank line)
    fresh("c1")
    os.unlink(tmp_path / "c1.psq")
    _fail_compare(ref_swipe, args("c1"))

    # missing .phr
    fresh("c2")
    os.unlink(tmp_path / "c2.phr")
    _fail_compare(ref_swipe, args("c2"))

    # empty (unmappable) .pin
    fresh("c3")
    (tmp_path / "c3.pin").write_bytes(b"")
    _fail_compare(ref_swipe, args("c3"))

    # wrong version number
    fresh("c4")
    raw = bytearray((tmp_path / "c4.pin").read_bytes())
    raw[0:4] = struct.pack(">I", 5)
    (tmp_path / "c4.pin").write_bytes(bytes(raw))
    _fail_compare(ref_swipe, args("c4"))

    # alias pointing at a missing volume -> db_open_xin on the .pin
    (tmp_path / "c5.pal").write_text("TITLE ghost\nDBLIST novol\n")
    _fail_compare(ref_swipe, args("c5"))

    # GILIST is unimplemented in both
    fresh("c6v")
    (tmp_path / "c6.pal").write_text(
        "TITLE gilist\nDBLIST c6v\nGILIST c6.gil\n")
    _fail_compare(ref_swipe, args("c6"))

    # MEMB_BIT alias with the wrong OIDLIST/DBLIST shape (two volumes,
    # one oidlist) -> Illegal alias file (1)
    fresh("c7a")
    fresh("c7b")
    mask = struct.pack(">I", 7) + bytes([0b10100000])
    (tmp_path / "c7.msk").write_bytes(mask)
    (tmp_path / "c7.pal").write_text(
        "TITLE badmask\nDBLIST c7a c7b\nOIDLIST c7.msk\nMEMB_BIT 1\n"
        "NSEQ 2\nLENGTH 100\nMAXOID 6\n")
    _fail_compare(ref_swipe, args("c7"))
