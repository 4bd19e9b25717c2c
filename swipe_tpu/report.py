"""Output rendering: BLAST-like plain, XML, and tabular formats.

Byte-level parity targets in the reference:
* expect-value formatting: hits_show_expect[_nospace] (hits.cc:1177-1213)
* alignment statistics + coordinate remapping: count_align/whole_align
  (hits.cc:815-1175)
* 60-column pairwise rendering: putalignop/show_align (hits.cc:647-813)
* plain report: hits_show_plain (hits.cc:1791-1945), preamble args_show
  (swipe.cc:665-782), timing block clock_stop (swipe.cc:1716-1790)
* XML: hits_show_xml (hits.cc:1660-1727); TSV: hits_show_tsv (:1729-1789)
* defline display rules: show_deflines (asnparse.cc:889-971)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from .alphabet import SYM_NCBI_AA, SYM_NCBI_NT16, SYM_SOUND
from .hits import Hit, HitList

__all__ = ["format_expect", "format_expect_nospace", "render_header",
           "Reporter"]

LONG_MAX = 2**63 - 1
PROGRAM = "SWIPE 2.1.1"
PROGRAM_TPU = "swipe-tpu 0.1.0"
REFLINE = ("Reference: T. Rognes (2011) Faster Smith-Waterman database "
           "searches\nwith inter-sequence SIMD parallelisation, "
           "BMC Bioinformatics, 12:221.")
REFLINE1 = ("Reference: T. Rognes (2011) Faster Smith-Waterman database "
            "searches with inter-sequence SIMD parallelisation, "
            "BMC Bioinformatics, 12:221.")


def format_expect(expect: float) -> str:
    """hits_show_expect: fixed-ish-width E-value field."""
    if expect < 1e-180:
        return "0.0  "
    if expect < 9.5e-100:
        return ("%-6.0e" % expect)[1:]
    if expect < 0.00095:
        return "%-5.0e" % expect
    if expect < 0.0995:
        return "%-5.3f" % expect
    if expect < 0.95:
        return "%-5.2f" % expect
    if expect < 9.5:
        return "%-5.1f" % expect
    return "%5.0f" % expect


def format_expect_nospace(expect: float) -> str:
    if expect < 1e-180:
        return "0.0"
    if expect < 9.5e-100:
        return "%.0e" % expect
    if expect < 0.0995:
        return "%.3f" % expect
    if expect < 0.95:
        return "%.2f" % expect
    if expect < 9.5:
        return "%.1f" % expect
    return "%.0f" % expect


def show_description(desc: str) -> str:
    """Query id = description up to the first space (hits.cc:1650-1658)."""
    sp = desc.find(" ")
    return desc if sp < 0 else desc[:sp]


def render_header(deflines: list[str], indent: int = 0, maxlen: int = 0,
                  linelen: int = LONG_MAX, maxdeflines: int = 1,
                  show_descr: bool = True) -> str:
    """Defline rendering mirroring show_deflines (asnparse.cc:889-971).

    maxlen>0 truncates with '...'; linelen<LONG_MAX pads/wraps to that
    width; maxdeflines>1 adds the '>' prefix, indentation and newlines.
    """
    out = []
    for x, defline in enumerate(deflines):
        if x >= maxdeflines:
            break
        show = len(defline)
        if maxlen and show > maxlen:
            show = maxlen
        if show < len(defline) and show >= 3:
            defline = defline[: show - 3] + "..."
        else:
            defline = defline[:show]
        pos = 0
        line = 0
        while pos < show:
            col = 0
            if maxdeflines > 1:
                if line:
                    out.append(" " * (1 + indent))
                    col = 1 + indent
                else:
                    out.append(" " if x else ">")
                    col = 1
            while pos < show and col < linelen:
                c = defline[pos]
                if not show_descr and c == " ":
                    pos = show
                else:
                    out.append(c)
                    pos += 1
                    col += 1
            if linelen < LONG_MAX:
                out.append(" " * (linelen - col))
            if maxdeflines > 1:
                out.append("\n")
            line += 1
    return "".join(out)


@dataclass
class AlignStats:
    identities: int = 0
    positives: int = 0
    indels: int = 0
    aligned: int = 0
    gaps: int = 0
    q_first: int = 0
    q_last: int = 0
    d_first: int = 0
    d_last: int = 0
    poswidth: int = 1
    qline: str = ""
    aline: str = ""
    dline: str = ""


def _ops_iter(alignment: str):
    for op, num in re.findall(r"([MDI])(\d+)", alignment):
        yield op, int(num)


class Reporter:
    """Renders one query's results in the chosen view."""

    def __init__(self, out, view: int, symtype: int, matrix,
                 query=None, show_gis: int = 0):
        self.out = out
        self.view = view
        self.symtype = symtype
        self.matrix = np.asarray(matrix, dtype=np.int64).reshape(32, 32)
        self.query = query
        self.show_gis = show_gis

    # ---- alignment walking (count_align / whole_align) ----------------------

    def _seq_context(self, h: Hit):
        q = self.query
        if self.symtype == 0:
            sym = SYM_NCBI_NT16
            q_seq = q.nt[h.qstrand]
            q_len_nt = 0
            d_len_nt = h.dlennt
        elif self.symtype == 5:
            sym = SYM_SOUND
            q_seq = q.aa[0]
            q_len_nt = 0
            d_len_nt = 0
        else:
            sym = SYM_NCBI_AA
            q_seq = q.aa[3 * h.qstrand + h.qframe]
            q_len_nt = len(q.nt[0]) if q.nt[0] is not None else 0
            d_len_nt = h.dlennt
        return sym, q_seq, q_len_nt, d_len_nt

    def align_stats(self, h: Hit, build_lines: bool = False) -> AlignStats:
        st = AlignStats()
        sym, q_seq, q_len_nt, d_len_nt = self._seq_context(h)
        d_seq = h.dseq
        qpos, dpos = h.align_q_start, h.align_d_start
        qparts, aparts, dparts = [], [], []
        for op, ln in _ops_iter(h.alignment):
            st.aligned += ln
            if op == "D":
                if build_lines:
                    for _ in range(ln):
                        qparts.append(sym[q_seq[qpos]])
                        aparts.append(" ")
                        dparts.append("-")
                        qpos += 1
                else:
                    qpos += ln
                st.gaps += 1
                st.indels += ln
            elif op == "I":
                if build_lines:
                    for _ in range(ln):
                        qparts.append("-")
                        aparts.append(" ")
                        dparts.append(sym[d_seq[dpos]])
                        dpos += 1
                else:
                    dpos += ln
                st.gaps += 1
                st.indels += ln
            else:
                for _ in range(ln):
                    qs = int(q_seq[qpos])
                    ds = int(d_seq[dpos])
                    qpos += 1
                    dpos += 1
                    if qs == ds:
                        st.identities += 1
                        st.positives += 1
                        ach = "|"
                    elif self.matrix[qs, ds] > 0:
                        st.positives += 1
                        ach = "+"
                    else:
                        ach = " "
                    # whole_align (hits.cc:925-940): '|' for identities in
                    # every mode, unlike the plain pairwise display
                    if build_lines:
                        qparts.append(sym[qs])
                        aparts.append(ach)
                        dparts.append(sym[ds])
        if build_lines:
            st.qline = "".join(qparts)
            st.aline = "".join(aparts)
            st.dline = "".join(dparts)

        # display coordinates (count_align, hits.cc:1113-1175)
        q_first, q_last = h.align_q_start, h.align_q_end
        d_first, d_last = h.align_d_start, h.align_d_end
        q_len = len(q_seq)
        d_len = h.dlen
        if self.symtype == 0:
            if h.qstrand:
                q_first = q_len - 1 - q_first
                q_last = q_len - 1 - q_last
            if h.dstrand:
                d_first = d_len - 1 - d_first
                d_last = d_len - 1 - d_last
        if self.symtype in (2, 4):
            if h.qstrand:
                q_first = q_len_nt - 1 - 3 * q_first - h.qframe
                q_last = q_len_nt - 1 - 3 * q_last - h.qframe - 2
            else:
                q_first = 3 * q_first + h.qframe
                q_last = 3 * q_last + h.qframe + 2
        if self.symtype in (3, 4):
            if h.dstrand:
                d_first = d_len_nt - 1 - 3 * d_first - h.dframe
                d_last = d_len_nt - 1 - 3 * d_last - h.dframe - 2
            else:
                d_first = 3 * d_first + h.dframe
                d_last = 3 * d_last + h.dframe + 2
        st.q_first = q_first + 1
        st.q_last = q_last + 1
        st.d_first = d_first + 1
        st.d_last = d_last + 1
        maxpos = max(st.q_first, st.q_last, st.d_first, st.d_last)
        st.poswidth = 1
        while maxpos > 9:
            maxpos //= 10
            st.poswidth += 1
        return st

    # ---- 60-column pairwise rendering (putalignop / show_align) -------------

    def render_pairwise(self, h: Hit, poswidth: int) -> str:
        """show_align (hits.cc:757-813): query always from the plus-nt for
        blastn; coordinates remapped per strand/frame per 60-col block."""
        q = self.query
        if self.symtype == 0:
            sym = SYM_NCBI_NT16
            q_seq = q.nt[0]
            q_len_nt = 0
            d_len_nt = 0
        elif self.symtype == 5:
            sym = SYM_SOUND
            q_seq = q.aa[0]
            q_len_nt = 0
            d_len_nt = 0
        else:
            sym = SYM_NCBI_AA
            q_seq = q.aa[3 * h.qstrand + h.qframe]
            q_len_nt = len(q.nt[0]) if q.nt[0] is not None else 0
            d_len_nt = h.dlennt
        d_seq = h.dseq
        d_len = h.dlen

        out = []
        ALIGNLEN = 60
        q_pos, d_pos = h.align_q_start, h.align_d_start
        q_start, d_start = q_pos, d_pos
        qline, aline, dline = [], [], []

        def flush():
            nonlocal q_start, d_start
            q1 = q_start + 1
            q2 = q_pos
            d1 = d_start + 1
            d2 = d_pos
            if self.symtype == 0 and h.dstrand:
                d1 = d_len - d1 + 1
                d2 = d_len - d2 + 1
            if self.symtype in (2, 4):
                if h.qstrand:
                    q1 = q_len_nt - 3 * q_start - h.qframe
                    q2 = q_len_nt - 3 * q_pos - h.qframe + 1
                else:
                    q1 = 3 * q_start + h.qframe + 1
                    q2 = 3 * q_pos + h.qframe
            if self.symtype in (3, 4):
                if h.dstrand:
                    d1 = d_len_nt - 3 * d_start - h.dframe
                    d2 = d_len_nt - 3 * d_pos - h.dframe + 1
                else:
                    d1 = 3 * d_start + h.dframe + 1
                    d2 = 3 * d_pos + h.dframe
            out.append("\n")
            out.append("Query: %*d %s %d\n" % (poswidth, q1, "".join(qline),
                                               q2))
            out.append("       %*s %s\n" % (poswidth, "", "".join(aline)))
            out.append("Sbjct: %*d %s %d\n" % (poswidth, d1, "".join(dline),
                                               d2))
            qline.clear()
            aline.clear()
            dline.clear()

        for op, ln in _ops_iter(h.alignment):
            for _ in range(ln):
                if not qline:
                    q_start, d_start = q_pos, d_pos
                if op == "M":
                    qs = int(q_seq[q_pos])
                    ds = int(d_seq[d_pos])
                    q_pos += 1
                    d_pos += 1
                    qline.append(sym[qs])
                    if self.symtype == 0:
                        aline.append("|" if qs == ds else " ")
                    else:
                        aline.append(sym[qs] if qs == ds else
                                     ("+" if self.matrix[qs, ds] > 0 else " "))
                    dline.append(sym[ds])
                elif op == "D":
                    qs = int(q_seq[q_pos])
                    q_pos += 1
                    qline.append(sym[qs])
                    aline.append(" ")
                    dline.append("-")
                else:
                    ds = int(d_seq[d_pos])
                    d_pos += 1
                    qline.append("-")
                    aline.append(" ")
                    dline.append(sym[ds])
                if len(qline) == ALIGNLEN:
                    flush()
        if qline:
            flush()
        return "".join(out)

    # ---- views ---------------------------------------------------------------

    def show_plain(self, hl: HitList) -> None:
        w = self.out.write
        if hl.count == 0:
            w("\nNo hits.\n")
            return
        ev = hl.evmodel
        if ev.available:
            w("                                                            "
              "     Score    E\n")
            w("Sequences producing significant alignments:                 "
              "     (bits) Value\n\n")
        else:
            w("Sequences producing significant alignments:                 "
              "        Score\n\n")
        for i in range(hl.showhits):
            h = hl.hits[i]
            headerlen = 67
            if self.symtype == 0:
                headerlen = 65
            elif self.symtype in (2, 3):
                headerlen = 64
            elif self.symtype == 4:
                headerlen = 61
            w(render_header(h.deflines or [h.header], 0, headerlen,
                headerlen, 1, True))
            if self.symtype == 0:
                w(" %c" % ("-" if h.dstrand else "+"))
            elif self.symtype == 2:
                w(" %c%d" % ("-" if h.qstrand else "+", h.qframe + 1))
            elif self.symtype == 3:
                w(" %c%d" % ("-" if h.dstrand else "+", h.dframe + 1))
            elif self.symtype == 4:
                w(" %c%d/%c%d" % ("-" if h.qstrand else "+", h.qframe + 1,
                                  "-" if h.dstrand else "+", h.dframe + 1))
            if ev.available:
                w(" %5d" % ev.bits_rounded(h.score))
                w("   ")
                w(format_expect(ev.evalue(h.score)))
            else:
                w(" %5d" % h.score)
            w("\n")

        for i in range(hl.showalignments):
            h = hl.hits[i]
            w("\n")
            w(render_header(h.deflines or [h.header], 10, 0, 79,
                LONG_MAX, True))
            if self.symtype in (3, 4):
                w("          Length = %d\n" % h.dlennt)
            else:
                w("          Length = %d\n" % h.dlen)
            w("\n")
            if ev.available:
                w(" Score = %.1f bits (%d), Expect = %s" %
                  (ev.bits(h.score), h.score,
                   format_expect(ev.evalue(h.score))))
            else:
                w(" Score = %d" % h.score)
            w("\n")
            st = self.align_stats(h)
            w(" Identities = %d/%d (%d%%)" %
              (st.identities, st.aligned,
               st.identities * 100 // st.aligned))
            if self.symtype > 0:
                w(", Positives = %d/%d (%d%%)" %
                  (st.positives, st.aligned,
                   st.positives * 100 // st.aligned))
            if st.indels:
                w(", Gaps = %d/%d (%d%%)" %
                  (st.indels, st.aligned, st.indels * 100 // st.aligned))
            w("\n")
            if self.symtype == 0:
                w(" Strand = %s\n" %
                  ("Plus / Minus" if h.dstrand else "Plus / Plus"))
            elif self.symtype == 2:
                w(" Frame = %c%d\n" % ("-" if h.qstrand else "+",
                                       h.qframe + 1))
            elif self.symtype == 3:
                w(" Frame = %c%d\n" % ("-" if h.dstrand else "+",
                                       h.dframe + 1))
            elif self.symtype == 4:
                w(" Frame = %c%d / %c%d\n" %
                  ("-" if h.qstrand else "+", h.qframe + 1,
                   "-" if h.dstrand else "+", h.dframe + 1))
            w(self.render_pairwise(h, st.poswidth))
            w("\n")

    def show_xml(self, hl: HitList) -> None:
        w = self.out.write
        w("<result>\n")
        w("  <general>\n")
        w("    <hitcount>%d</hitcount>\n" % hl.count)
        w("  </general>\n")
        w("  <hits>\n")
        for i in range(hl.showhits):
            h = hl.hits[i]
            w("    <hit>\n")
            w("      <hitno>%d</hitno>\n" % (i + 1))
            w("      <track>%d</track>\n" % h.seqno)
            w("      <query>%s</query>\n" %
              show_description(self.query.description))
            w("      <name>%s</name>\n" %
              render_header(h.deflines or [h.header], 0, 0, LONG_MAX, 1,
                            True))
            w("      <len>%d</len>\n" % h.dlen)
            w("      <score>%d</score>\n" % h.score)
            if i < hl.showalignments:
                st = self.align_stats(h, build_lines=True)
                w("      <alignment>%s</alignment>\n" % h.alignment)
                w("      <qpos>%d,%d</qpos>\n" % (st.q_first, st.q_last))
                w("      <dpos>%d,%d</dpos>\n" % (st.d_first, st.d_last))
                w("      <qseq>%s</qseq>\n" % st.qline)
                w("      <aseq>%s</aseq>\n" % st.aline)
                w("      <dseq>%s</dseq>\n" % st.dline)
            w("    </hit>\n")
        w("  </hits>\n")
        w("</result>\n")

    def show_tsv(self, hl: HitList, comments: bool, databasename: str,
                 compile_stamp: str = "") -> None:
        w = self.out.write
        ev = hl.evmodel
        if comments:
            w("# %s - Compiled %s - %s\n" % (PROGRAM, compile_stamp,
                                             REFLINE1))
            w("# Query: %s\n" % self.query.description)
            w("# Database: %s\n" % databasename)
            if ev.available:
                w("# Fields: Query id, Subject id, % identity, alignment "
                  "length, mismatches, gap openings, q. start, q. end, "
                  "s. start, s. end, e-value, bit score\n")
            else:
                w("# Fields: Query id, Subject id, % identity, alignment "
                  "length, mismatches, gap openings, q. start, q. end, "
                  "s. start, s. end, score\n")
        for i in range(hl.showalignments):
            h = hl.hits[i]
            w(show_description(self.query.description))
            w("\t")
            w(render_header(h.deflines or [h.header], 0, 0, LONG_MAX, 1,
                False))
            st = self.align_stats(h)
            w("\t%.2f\t%d\t%d\t%d\t%d\t%d\t%d\t%d" %
              (100.0 * st.identities / st.aligned,
               st.aligned,
               st.aligned - st.identities - st.indels,
               st.gaps,
               st.q_first, st.q_last, st.d_first, st.d_last))
            if ev.available:
                expect = ev.evalue(h.score)
                w("\t%.2g" % expect)
                w("\t%.1f" % ev.bits(h.score))
            else:
                w("\t%d" % h.score)
            w("\n")

    def show(self, hl: HitList, databasename: str = "") -> None:
        if self.view == 0:
            self.show_plain(hl)
        elif self.view == 7:
            self.show_xml(hl)
        elif self.view in (8, 9):
            self.show_tsv(hl, self.view == 9, databasename)


def show_begin(out, view: int) -> None:
    """hits_show_begin (hits.cc:1947-1977)."""
    if view == 0:
        out.write("%s [%s]\n\n%s\n\n" % (PROGRAM, PROGRAM_TPU, REFLINE))
    elif view == 7:
        out.write('<?xml version="1.0"?>\n')
    elif view == 99:
        out.write('<?xml version="1.0"?>\n')


def show_end(out, view: int) -> None:
    if view == 99:
        out.write("</ParalignXML>\n")
