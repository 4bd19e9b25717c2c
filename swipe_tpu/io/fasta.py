"""FASTA reading and the per-query preprocessing pipeline.

Parity target: /root/reference/query.cc:186-366 (query_init/query_read) —
multi-record FASTA from a file or stdin, characters mapped through the
symtype's alphabet with invalid characters silently dropped, reverse
complement and 6-frame translations built according to the search mode.

Search modes (symtype):
  0 blastn   nt query, nt db          3 tblastn  aa query, translated nt db
  1 blastp   aa query, aa db          4 tblastx  translated x translated
  2 blastx   translated nt query      5 sound    experimental alphabet
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from typing import Iterator, TextIO

import numpy as np

from ..alphabet import map_for_symtype, revcompl, translate, encode

__all__ = ["Query", "read_fasta", "read_queries", "QueryReader"]


LINE_MAX = 2048  # the reference reader's fgets buffer (swipe.h:55)


def _fgets_chunks(text: str) -> Iterator[str]:
    """The exact 'lines' the reference sees: fgets(LINE_MAX) chunks of at
    most LINE_MAX-1 chars, ending early at a newline, each truncated at
    its first NUL (query_read processes chunks with strlen/char loops,
    query.cc:274-330)."""
    pos, n = 0, len(text)
    while pos < n:
        end = text.find("\n", pos, pos + LINE_MAX - 1)
        if end >= 0:
            chunk = text[pos: end + 1]
        else:
            chunk = text[pos: pos + LINE_MAX - 1]
        pos += len(chunk)
        nul = chunk.find("\0")
        yield chunk if nul < 0 else chunk[:nul]


def read_fasta(fp: TextIO) -> Iterator[tuple[str, str]]:
    """Yield (description, raw_sequence) records from a FASTA stream.

    Reference semantics (query_read, query.cc:265-335), including the
    fgets quirks: a physical line longer than LINE_MAX-1 bytes is
    processed as several chunks — the tail of an overlong header line
    feeds the SEQUENCE char map, and a '>' landing at a chunk boundary
    of an overlong sequence line starts a new record; a chunk whose
    strlen is zero (NUL at its start) stops the reader entirely.  Text
    before the first '>' is a sequence with an empty description.
    """
    desc = None
    chunks: list[str] = []
    started = False
    for chunk in _fgets_chunks(fp.read()):
        if not chunk:
            break                  # !query_line[0]: reading ends here
        if chunk.endswith("\n"):
            chunk = chunk[:-1]
        if chunk.startswith(">"):
            if started:
                yield (desc or "", "".join(chunks))
            desc = chunk[1:]
            chunks = []
            started = True
        else:
            chunks.append(chunk)
            started = True
    if started:
        yield (desc or "", "".join(chunks))


@dataclass
class Query:
    """One preprocessed query: encoded sequence(s) for every strand/frame."""

    description: str
    symtype: int
    strands: int  # bit 1 = plus, bit 2 = minus
    nt: list[np.ndarray | None] = field(default_factory=lambda: [None, None])
    # aa[3*strand + frame] for translated modes; aa[0] for protein modes
    aa: list[np.ndarray | None] = field(default_factory=lambda: [None] * 6)

    @property
    def length(self) -> int:
        """Length of the primary query sequence (nt for nt modes, else aa)."""
        if self.symtype in (0, 2, 4):
            return 0 if self.nt[0] is None else len(self.nt[0])
        return 0 if self.aa[0] is None else len(self.aa[0])

    def frames(self) -> list[tuple[int, int, np.ndarray]]:
        """All (strand, frame, encoded_seq) the search phase must score."""
        out = []
        if self.symtype in (2, 4):
            for s in range(2):
                if (s + 1) & self.strands:
                    for f in range(3):
                        seq = self.aa[3 * s + f]
                        if seq is not None:
                            out.append((s, f, seq))
        elif self.symtype == 0:
            for s in range(2):
                if (s + 1) & self.strands and self.nt[s] is not None:
                    out.append((s, 0, self.nt[s]))
        else:
            if self.aa[0] is not None:
                out.append((0, 0, self.aa[0]))
        return out


def preprocess_query(description: str, raw: str, symtype: int, strands: int,
                     query_gencode: int = 1) -> Query:
    """Encode a raw query and build strand/frame variants per search mode."""
    charmap = map_for_symtype(symtype)
    seq = encode(raw, charmap)

    q = Query(description, symtype, strands)
    if symtype in (0, 2, 4):
        q.nt[0] = seq
        if strands & 2:
            q.nt[1] = revcompl(seq)
        if symtype in (2, 4):
            for s in range(2):
                if (s + 1) & strands:
                    for f in range(3):
                        q.aa[3 * s + f] = translate(seq, s, f, query_gencode)
    else:
        q.aa[0] = seq
    return q


def read_queries(path: str, symtype: int, strands: int,
                 query_gencode: int = 1) -> Iterator[Query]:
    """Read and preprocess every query in a FASTA file ('-' = stdin).

    Files are read byte-exact (latin-1): the reference consumes raw bytes
    and the char maps drop anything unmappable (query.cc:265-330), so a
    stray non-UTF-8 byte in a header must not abort the run.  The file is
    opened eagerly so a missing path fails at call time like the
    reference's query_init fatal (query.cc:194).
    """
    import io as _io
    if path == "-":
        fp = _io.TextIOWrapper(sys.stdin.buffer, encoding="latin-1")
    else:
        try:
            fp = open(path, encoding="latin-1")
        except IsADirectoryError:
            # C fopen succeeds on a directory and fgets then fails:
            # the reference reads it as an empty query file
            fp = _io.StringIO("")

    def gen():
        try:
            for desc, raw in read_fasta(fp):
                yield preprocess_query(desc, raw, symtype, strands,
                                       query_gencode)
        finally:
            if path != "-":
                fp.close()
    return gen()


class QueryReader:
    """Stateful reader mirroring the reference's query_init/query_read API."""

    def __init__(self, path: str, symtype: int, strands: int,
                 query_gencode: int = 1):
        self._it = read_queries(path, symtype, strands, query_gencode)

    def __iter__(self) -> Iterator[Query]:
        return self._it
