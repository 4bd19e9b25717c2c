"""Bulk (vectorized) FASTA ingestion vs the exact fgets-semantics reader.

The database fast path (io.fasta.scan_fasta_bytes + FastaDatabase.
_ingest_bulk) must be byte-for-byte equal to the record-by-record
reader (read_fasta, which reproduces the reference's fgets quirks,
/root/reference/query.cc:265-335) whenever it engages, and must REFUSE
(fall back) on every stream where the quirks can change the parse.
"""

import io

import numpy as np
import pytest

from swipe_tpu.io.db import FastaDatabase
from swipe_tpu.io.fasta import LINE_MAX, scan_fasta_bytes


def _both(tmp_path, text: str, dbtype: str = "aa"):
    a = FastaDatabase(io.StringIO(text), dbtype)      # record path
    p = tmp_path / "f.fa"
    p.write_bytes(text.encode("latin-1"))
    b = FastaDatabase(str(p), dbtype)                 # bulk path (maybe)
    return a, b


def _assert_equal(a, b):
    assert a._headers == b._headers
    assert len(a._seqs) == len(b._seqs)
    for x, y in zip(a._seqs, b._seqs):
        assert np.array_equal(x, y)


def test_bulk_fuzz_parity(tmp_path):
    rng = np.random.default_rng(11)
    alpha = list("ARNDCQEGHILKMFPSTWYVBZX*- \t\r>")
    for trial in range(120):
        parts = []
        if rng.random() < 0.3:
            parts.append("".join(rng.choice(alpha, rng.integers(0, 30)))
                         + "\n")
        for _ in range(int(rng.integers(0, 5))):
            hl = int(rng.choice([0, 5, 2045, 2046, 2047, 2048]))
            parts.append(">" + "".join(
                rng.choice(list("ab X|.1"), hl)) + "\n")
            for _ in range(int(rng.integers(0, 4))):
                sl = int(rng.choice([0, 10, 2046, 2047, 2048, 4094, 4095]))
                parts.append("".join(rng.choice(alpha, sl)) + "\n")
        text = "".join(parts)
        if text and rng.random() < 0.3:
            text = text.rstrip("\n")
        a, b = _both(tmp_path, text)
        _assert_equal(a, b)


def test_bulk_edge_cases(tmp_path):
    for text in ["", "\n", ">only header", ">h\n", "preamble\nACD\n>h\nWY",
                 ">a\n>b\n>c\nACD\n", ">h\n\n\nACDEF\n\n"]:
        a, b = _both(tmp_path, text)
        _assert_equal(a, b)


def test_bulk_rejects_quirk_streams():
    # NUL: fgets truncation/stop
    assert scan_fasta_bytes(b">h\nAC\0DE\n") is None
    # non-ASCII byte: text-mode decode differences
    assert scan_fasta_bytes(">h\nACé\n".encode("latin-1")) is None
    # header spilling real chars into a second fgets chunk
    assert scan_fasta_bytes(
        (">" + "x" * (LINE_MAX - 1) + "\nACD\n").encode()) is None
    # '>' exactly at an fgets chunk boundary of an overlong sequence line
    line = "A" * (LINE_MAX - 1) + ">" + "A" * 10
    assert scan_fasta_bytes((">h\n" + line + "\n").encode()) is None
    # ... but a benign overlong sequence line stays on the fast path
    ok = scan_fasta_bytes((">h\n" + "A" * 5000 + "\n").encode())
    assert ok is not None
    headers, seq_bytes, counts = ok
    assert headers == ["h"] and counts.tolist() == [5000]


def test_bulk_quirk_streams_still_parse_exactly(tmp_path):
    """The fallback must reproduce read_fasta on the quirky inputs."""
    quirky = [
        ">h\nAC\0DE\nFG\n",                       # NUL stops the reader
        ">" + "x" * (LINE_MAX + 5) + "\nACD\n",   # overlong header
        ">h\n" + "A" * (LINE_MAX - 1) + ">WY\n",  # '>' at chunk boundary
    ]
    for text in quirky:
        a, b = _both(tmp_path, text)
        _assert_equal(a, b)


def test_windowed_ingestion_parity(tmp_path, monkeypatch):
    """Files beyond BULK_WINDOW ingest in record-aligned windows
    (bounded temporaries, optional worker pool); results must equal the
    whole-file scan and the exact reader — including a window whose
    record straddles the nominal cut, a headerless preamble, and
    unmappable characters that shift the kept-byte counts."""
    monkeypatch.setattr(FastaDatabase, "BULK_WINDOW", 256)
    rng = np.random.default_rng(5)
    alpha = list("ARNDCQEGHILKMFPSTWYVBZX*- 8")
    for trial in range(20):
        parts = []
        if rng.random() < 0.4:
            parts.append("preamble" + "\n")
        for i in range(int(rng.integers(1, 40))):
            parts.append(f">rec {trial}/{i}\n")
            for _ in range(int(rng.integers(0, 3))):
                sl = int(rng.integers(0, 300))
                parts.append("".join(rng.choice(alpha, sl)) + "\n")
        text = "".join(parts)
        if rng.random() < 0.3:
            text = text.rstrip("\n")
        a, b = _both(tmp_path, text)
        assert isinstance(b._lens, np.ndarray)
        _assert_equal(a, b)
        # the worker-pool variant must give the same ingest
        p = tmp_path / "f.fa"
        c = FastaDatabase(str(p), "aa", threads=4)
        _assert_equal(a, c)


def test_windowed_ingestion_fallback(tmp_path, monkeypatch):
    """A quirk stream in ANY window must fall the whole file back to the
    exact fgets reader."""
    monkeypatch.setattr(FastaDatabase, "BULK_WINDOW", 64)
    text = ">a\nACDEF\n>b\n" + "W" * 200 + "\n>c\n" + \
        "R" * (LINE_MAX + 10) + "\n>d\nKLM\n"
    a, b = _both(tmp_path, text)
    _assert_equal(a, b)
