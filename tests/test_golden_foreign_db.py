"""Golden parity on FOREIGN BLAST v4 artifacts.

The regular golden suite round-trips databases through our own writer
(tests/test_golden_parity.py), which cannot exercise reader features the
writer never emits.  This module hand-constructs those artifacts with an
independent byte-packer private to the test —

* a nested alias (top.pal -> mid.pal -> two volumes), the nr-style
  one-level indirection of /root/reference/database.cc:789-838;
* a masked MULTI-volume subset (top alias with MEMB_BIT over two
  sub-aliases, each carrying its own OIDLIST .msk), the layout real
  swissprot-inside-nr databases use (database.cc:800-836);
* nucleotide volumes whose ambiguity sections use the 64-BIT entry
  format on tiny sequences (bit31 of the entry count), which our writer
  only chooses for >=16M-base sequences (database.cc:1284-1323)

— and byte-compares the reference binary's output with ours on each.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

from swipe_tpu.alphabet import MAP_NCBI_AA, MAP_NCBI_NT16, encode
from swipe_tpu.io.asn1 import Defline, encode_defline_set

from test_golden_parity import (REF_SRC, _normalize, ref_swipe,  # noqa: F401
                                run_ours, run_ref)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_SRC), reason="reference sources not available")

_NT16_TO_2BIT = {1: 0, 2: 1, 4: 2, 8: 3}


def _pack_nt_64(codes):
    """2-bit pack one nt16 sequence with a 64-BIT ambiguity section
    (foreign variant: real makeblastdb emits it for huge sequences; our
    writer never does for small ones)."""
    n = len(codes)
    two = [(_NT16_TO_2BIT.get(int(c), 0)) for c in codes]
    full, rem = n // 4, n % 4
    out = bytearray()
    for q in range(full):
        b = 0
        for k in range(4):
            b |= two[4 * q + k] << (6 - 2 * k)
        out.append(b)
    last = rem
    for k in range(rem):
        last |= two[4 * full + k] << (6 - 2 * k)
    out.append(last)
    entries = []
    j = 0
    while j < n:
        if int(codes[j]) not in _NT16_TO_2BIT:
            v = int(codes[j])
            run = 1
            while j + run < n and int(codes[j + run]) == v:
                run += 1
            entries.append((v, run, j))
            j += run
        else:
            j += 1
    amb = b""
    if entries:
        amb = struct.pack(">I", (1 << 31) | (2 * len(entries)))
        for v, run, pos in entries:
            amb += struct.pack(">Q", (v << 60) | ((run - 1) << 48) | pos)
    return bytes(out), amb


def _write_volume(base, seqs, deflines, protein, title="foreign vol",
                  date="Jan 1, 2026  12:00 AM"):
    """Minimal independent v4 volume packer (deliberately NOT
    swipe_tpu.io.blastdb_writer — the golden runs must not round-trip
    through the production writer)."""
    ext = "p" if protein else "n"
    hdr = [encode_defline_set(d) for d in deflines]
    hoff = [0]
    for b in hdr:
        hoff.append(hoff[-1] + len(b))
    blobs, ambs = [], []
    if protein:
        start = 1
        for s in seqs:
            blobs.append(bytes(np.asarray(s, np.uint8)) + b"\x00")
            ambs.append(0)
    else:
        start = 0
        for s in seqs:
            p, a = _pack_nt_64(s)
            blobs.append(p + a)
            ambs.append(len(a))
    soff = [start]
    for b in blobs:
        soff.append(soff[-1] + len(b))
    aoff = [soff[i + 1] - ambs[i] for i in range(len(seqs))]
    aoff.append(soff[len(seqs)])
    with open(f"{base}.{ext}hr", "wb") as f:
        f.write(b"".join(hdr))
    with open(f"{base}.{ext}sq", "wb") as f:
        if protein:
            f.write(b"\x00")
        f.write(b"".join(blobs))
    head = struct.pack(">II", 4, 1 if protein else 0)
    head += struct.pack(">I", len(title)) + title.encode()
    head += struct.pack(">I", len(date)) + date.encode()
    while len(head) % 4:
        head += b"\x00"
    head += struct.pack(">I", len(seqs))
    head += struct.pack("<Q", sum(len(s) for s in seqs))
    head += struct.pack(">I", max((len(s) for s in seqs), default=0))
    with open(f"{base}.{ext}in", "wb") as f:
        f.write(head)
        f.write(struct.pack(">%dI" % len(hoff), *hoff))
        f.write(struct.pack(">%dI" % len(soff), *soff))
        if not protein:
            f.write(struct.pack(">%dI" % len(aoff), *aoff))


def _msk(maxoid, members):
    """OID bitmap: u32be count header, then MSB-first membership bits."""
    nbytes = maxoid // 8 + 1
    bits = bytearray(nbytes)
    for s in members:
        bits[s >> 3] |= 1 << (7 - (s & 7))
    return struct.pack(">I", maxoid + 1) + bytes(bits)


def _compare(ref_swipe, args):
    ref = _normalize(run_ref(ref_swipe, args))
    ours = _normalize(run_ours(args))
    assert ours == ref


def test_golden_nested_alias(ref_swipe, tmp_path):
    """top.pal -> mid.pal -> two volumes (one level of nesting, no
    masking): both programs must agree on stats, hits and report."""
    rng = np.random.default_rng(101)
    AA = list("ARNDCQEGHILKMFPSTWYV")
    qp = "".join(rng.choice(AA, 60))
    for v, planted in ((0, 3), (1, 6)):
        seqs, dls = [], []
        for i in range(9):
            s = "".join(rng.choice(AA, int(rng.integers(30, 110))))
            if i == planted:
                s = s[:8] + qp[5:52] + s[8:]
            seqs.append(encode(s, MAP_NCBI_AA))
            dls.append([Defline(title=f"nv{v} seq {i}")])
        _write_volume(str(tmp_path / f"nv{v}"), seqs, dls, True,
                      title=f"nested vol {v}")
    (tmp_path / "mid.pal").write_text(
        "TITLE  nested middle\nDBLIST nv0 nv1\n")
    (tmp_path / "top.pal").write_text(
        "TITLE  nested top\nDBLIST mid\n")
    (tmp_path / "q.fa").write_text(f">q nested query\n{qp}\n")
    base = ["-d", str(tmp_path / "top"), "-i", str(tmp_path / "q.fa"),
            "-p", "blastp", "-e", "1000"]
    for extra in (["-m", "0"], ["-m", "9"]):
        _compare(ref_swipe, base + extra)
    # and the dump utility walks the nested volumes identically
    _compare(ref_swipe, ["-d", str(tmp_path / "top"), "-p", "blastp",
                         "-N", "1"])


def test_golden_masked_multivolume(ref_swipe, tmp_path):
    """nr-style masked subset across TWO volumes: a MEMB_BIT top alias
    whose DBLIST entries are per-volume sub-aliases, each with its own
    OIDLIST bitmap (database.cc:800-836).  Masked seq/symbol counts feed
    the E-value statistics, so the report only matches if the reader
    combines NSEQ/LENGTH/MAXOID per volume exactly."""
    rng = np.random.default_rng(102)
    AA = list("ARNDCQEGHILKMFPSTWYV")
    qp = "".join(rng.choice(AA, 55))
    members = {0: [0, 2, 5], 1: [1, 3, 4, 6]}
    lens = {}
    for v in (0, 1):
        seqs, dls = [], []
        for i in range(8):
            s = "".join(rng.choice(AA, int(rng.integers(30, 100))))
            if (v, i) in ((0, 2), (1, 4)):
                s = s[:10] + qp[4:50] + s[10:]
            seqs.append(encode(s, MAP_NCBI_AA))
            # membership bit 1 marks subset members (asnparse.cc:990)
            dls.append([Defline(title=f"mv{v} seq {i}",
                                memberships=1 if i in members[v] else 0)])
            lens[(v, i)] = len(seqs[-1])
        _write_volume(str(tmp_path / f"mv{v}"), seqs, dls, True,
                      title=f"masked vol {v}")
        with open(tmp_path / f"mv{v}.msk", "wb") as f:
            f.write(_msk(7, members[v]))
        nseq = len(members[v])
        length = sum(lens[(v, i)] for i in members[v])
        (tmp_path / f"sub{v}.pal").write_text(
            f"TITLE  sub {v}\nDBLIST mv{v}\nOIDLIST mv{v}.msk\n"
            f"LENGTH {length}\nNSEQ {nseq}\nMAXOID 7\nMEMB_BIT 1\n")
    (tmp_path / "msub.pal").write_text(
        "TITLE  masked multivolume subset\nDBLIST sub0 sub1\nMEMB_BIT 1\n")
    (tmp_path / "q.fa").write_text(f">q masked query\n{qp}\n")
    base = ["-d", str(tmp_path / "msub"), "-i", str(tmp_path / "q.fa"),
            "-p", "blastp", "-e", "1000"]
    for extra in (["-m", "0"], ["-m", "9"]):
        _compare(ref_swipe, base + extra)


def test_golden_64bit_ambiguity(ref_swipe, tmp_path):
    """Tiny nucleotide volume whose ambiguity sections use the 64-bit
    entry format (bit31 set): our writer only emits it for huge
    sequences, real databases may use it anywhere.  Decompression must
    agree byte-for-byte — checked through blastn AND the -N dump (which
    re-symbolizes every base)."""
    rng = np.random.default_rng(103)
    NT = list("ACGT")
    qn = "".join(rng.choice(NT, 70))
    seqs, dls = [], []
    for i in range(10):
        s = "".join(rng.choice(NT, int(rng.integers(50, 160))))
        if i == 3:
            s = s[:20] + qn + s[20:]
        if i == 5:
            s = s[:10] + "N" * 5 + s[10:25] + "RYWS" + s[25:]
        if i == 8:
            s = "KM" + s + "N"
        seqs.append(encode(s, MAP_NCBI_NT16))
        dls.append([Defline(title=f"amb seq {i}")])
    _write_volume(str(tmp_path / "amb64"), seqs, dls, False,
                  title="64-bit ambiguity db")
    (tmp_path / "q.fa").write_text(f">q amb query\n{qn}\n")
    base = ["-d", str(tmp_path / "amb64"), "-i", str(tmp_path / "q.fa"),
            "-p", "blastn", "-e", "1000"]
    for extra in (["-m", "0"], ["-m", "9"]):
        _compare(ref_swipe, base + extra)
    _compare(ref_swipe, ["-d", str(tmp_path / "amb64"), "-p", "blastn",
                         "-N", "1"])
    # tblastn crosses the translated-search path over the 64-bit fixups
    rngq = np.random.default_rng(104)
    qa = "".join(rngq.choice(list("ARNDCQEGHILKMFPSTWYV"), 40))
    (tmp_path / "qaa.fa").write_text(f">qa amb tblastn query\n{qa}\n")
    _compare(ref_swipe, ["-d", str(tmp_path / "amb64"),
                         "-i", str(tmp_path / "qaa.fa"), "-p", "tblastn",
                         "-e", "1000", "-m", "9"])
