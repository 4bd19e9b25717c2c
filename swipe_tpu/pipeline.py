"""Per-query search pipeline: pack -> score on TPU -> enter hits -> align.

TPU-native re-design of the reference's search runtime (parity targets:
work() /root/reference/swipe.cc:2436-2505, prepare_search/search_chunk
swipe.cc:1365-1699).  Differences by design:

* the pthread work queue over db chunks becomes a list of pre-packed
  segment chunks scored by the Pallas kernel (swipe_tpu.ops.sw_pallas);
  multi-chip sharding of the same chunk list lives in swipe_tpu.parallel;
* all (qstrand, qframe) variants of a query are scored in ONE kernel
  call per chunk (the query axis of the kernel grid), instead of the
  reference's per-frame passes;
* the 7->16->63-bit escalation is replaced by the exact int32 kernel;
  cascade-compatibility counters are still reported (everything lands in
  the "32-bit" tier unless cascade mode is enabled — swipe_tpu.ops.cascade).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from .batching import PackedChunk, pack_database, pack_stream
from .hits import HitList
from .io.db import Database
from .io.fasta import Query
from .matrices import ScoreMatrix
from .ops.sw_pallas import build_qpt
from .stats import EvalueModel

__all__ = ["SearchEngine", "SearchParams", "SearchTimings"]


@dataclass
class SearchParams:
    symtype: int = 1
    querystrands: int = 3
    matrixname: str = "BLOSUM62"
    matchscore: int = 1
    mismatchscore: int = -3
    gapopen: int = 11
    gapextend: int = 1
    descriptions: int = 250   # -v
    alignments: int = 100     # -b
    minscore: int = 1         # -c
    maxscore: int = 2**63 - 1  # -u
    expect: float = 10.0      # -e
    minexpect: float = 0.0    # -k
    effdbsize: int = 0        # -z
    query_gencode: int = 1
    db_gencode: int = 1

    @property
    def gapopenextend(self) -> int:
        return self.gapopen + self.gapextend


@dataclass
class SearchTimings:
    """GCUPS meter (parity: clock_start/clock_stop swipe.cc:1716-1790)."""

    start: float = 0.0
    elapsed: float = 0.0
    speed: float = 0.0
    starttime: str = ""
    endtime: str = ""
    # precision-cascade counters (compute*/rounds*, swipe.cc:111-119)
    compute: dict = field(default_factory=lambda: {7: 0, 16: 0, 32: 0, 63: 0})
    rounds: dict = field(default_factory=lambda: {7: 0, 16: 0, 32: 0, 63: 0})

    def begin(self):
        self.start = time.time()
        self.starttime = time.strftime(
            "%a, %e %b %Y %H:%M:%S UTC", time.gmtime(self.start))

    def end(self, db_symcount: int, query, symtype: int, querystrands: int):
        now = time.time()
        self.endtime = time.strftime(
            "%a, %e %b %Y %H:%M:%S UTC", time.gmtime(now))
        self.elapsed = now - self.start
        speed = float(db_symcount)
        if symtype == 0:
            speed *= len(query.nt[0])
            if querystrands == 3:
                speed *= 2
        elif symtype == 1 or symtype == 5:
            speed *= len(query.aa[0])
        elif symtype == 2:
            speed *= len(query.nt[0])
            if querystrands == 3:
                speed *= 2
        elif symtype == 3:
            speed *= 2 * len(query.aa[0])
        elif symtype == 4:
            speed *= 2 * len(query.nt[0])
            if querystrands == 3:
                speed *= 2
        self.speed = speed / self.elapsed if self.elapsed > 0 else 0.0


class SearchEngine:
    """Holds the packed database and runs queries against it."""

    def __init__(self, db: Database, params: SearchParams, *,
                 nseqs: int | None = None, max_cols: int | None = None,
                 backend: str = "auto"):
        self.db = db
        self.params = params
        self.backend = self._resolve_backend(backend)
        self.matrix = self._build_matrix()
        stream = self.backend in ("stream", "stream_interpret")
        if nseqs is None:
            nseqs = 1024 if stream else 512
        if max_cols is None:
            max_cols = 65536 if stream else 16384
        self._pack(nseqs, max_cols)

    # longest query frame the stream kernel's VMEM state supports; longer
    # queries fall back to the segmented lax path (still exact)
    STREAM_MAX_QLEN = 1280

    @staticmethod
    def _resolve_backend(backend: str) -> str:
        if backend != "auto":
            return backend
        import jax
        return "stream" if jax.default_backend() not in ("cpu",) else "lax"

    def _build_matrix(self) -> ScoreMatrix:
        p = self.params
        if p.symtype == 0:
            return ScoreMatrix.nucleotide(p.matchscore, p.mismatchscore,
                                          p.gapopen, p.gapextend)
        return ScoreMatrix.from_name_or_file(
            p.matrixname, p.gapopen, p.gapextend, symtype=p.symtype)

    def _pack(self, nseqs: int, max_cols: int) -> None:
        units = list(self.db.search_units(self.params.symtype))
        self._unit_seqs = [u.codes for u in units]
        self.unit_meta = np.array(
            [(u.seqno, u.dstrand, u.dframe) for u in units], dtype=np.int64
        ).reshape(len(units), 3)
        unit_ids = np.arange(len(units), dtype=np.int64)
        if self.backend in ("stream", "stream_interpret"):
            self.chunks = pack_stream(
                self._unit_seqs, nseqs=nseqs, max_cols=max_cols,
                seqnos=unit_ids)
        else:
            self.chunks = pack_database(
                self._unit_seqs, nseqs=nseqs, max_cols=max_cols,
                seqnos=unit_ids)
        self._seg_chunks: list[PackedChunk] | None = (
            self.chunks if self.backend not in ("stream", "stream_interpret")
            else None)
        self._dev_chunks = None

    def _segment_chunks(self) -> list[PackedChunk]:
        """Segment-packed chunks for the fallback path (built lazily)."""
        if self._seg_chunks is None:
            self._seg_chunks = pack_database(
                self._unit_seqs, nseqs=512, max_cols=16384,
                seqnos=np.arange(len(self._unit_seqs), dtype=np.int64))
        return self._seg_chunks

    # ---- scoring ------------------------------------------------------------

    def _scores_fn(self, backend: str):
        from .ops import sw_pallas
        if backend == "pallas":
            from .ops.sw_tiled import sw_scores_tiled
            return sw_scores_tiled
        if backend == "pallas_v1":
            return sw_pallas.sw_scores_segmented
        if backend == "pallas_interpret":
            import functools
            return functools.partial(sw_pallas.sw_scores_segmented,
                                     interpret=True)
        return sw_pallas.sw_scores_lax

    def query_frames(self, query: Query) -> list[tuple[int, int, np.ndarray]]:
        return query.frames()

    def search(self, query: Query, timings: SearchTimings | None = None
               ) -> HitList:
        """Run the full search+align pipeline for one query."""
        import jax.numpy as jnp

        p = self.params
        evmodel = EvalueModel(
            p.symtype, query.length, self.db.seqcount_masked(),
            self.db.symcount_masked(),
            matrixname=p.matrixname if p.symtype != 0 else None,
            matchscore=p.matchscore, mismatchscore=p.mismatchscore,
            gapopen=p.gapopen, gapextend=p.gapextend,
            effdbsize=p.effdbsize)

        hits = HitList(p.descriptions, p.alignments, p.minscore, p.maxscore,
                       p.minexpect, p.expect, evmodel, self.db, p.symtype,
                       p.querystrands)

        frames = self.query_frames(query)
        if not frames:
            hits.finalize()
            return hits

        if timings is not None:
            timings.begin()

        max_qlen = max(len(f[2]) for f in frames)
        backend = self.backend
        if backend in ("stream", "stream_interpret"):
            qlen_pad = max(128, -(-max_qlen // 128) * 128)
            if qlen_pad <= self.STREAM_MAX_QLEN and self.matrix.fits_int8:
                self._search_stream(frames, hits, qlen_pad, timings,
                                    interpret=(backend ==
                                               "stream_interpret"))
            else:
                self._search_segments(frames, hits, max_qlen, timings,
                                      self._scores_fn("lax"),
                                      self._segment_chunks())
        else:
            self._search_segments(frames, hits, max_qlen, timings,
                                  self._scores_fn(backend), self.chunks)

        if timings is not None:
            timings.end(self.db.symcount_masked(), query, p.symtype,
                        p.querystrands)

        hits.finalize()
        hits.align_all(query, self.matrix.matrix, p.gapopen, p.gapextend,
               scorelimit_16=self.matrix.scorelimit_16)
        return hits

    def _count_tiers(self, timings: SearchTimings | None, scores, nq: int
                     ) -> None:
        """Cascade-compatibility counters (compute*/rounds*, swipe.cc:111-119).

        Arithmetic here is exact int32 in one pass, but the tier a sequence
        *would* terminate at in the reference's 7->16->63-bit escalation is
        fully determined by its exact score vs SCORELIMIT_7/_16
        (matrices.cc:575-578, swipe.cc:1464,1518), so the counters are
        reproduced without running the narrow tiers.
        """
        if timings is None:
            return
        sl7 = self.matrix.scorelimit_7
        sl16 = self.matrix.scorelimit_16
        n16 = int((scores >= sl7).sum())
        n63 = int((scores >= sl16).sum())
        timings.compute[7] += int(scores.size)
        timings.compute[16] += n16
        timings.compute[63] += n63
        timings.rounds[7] += nq
        if n16:
            timings.rounds[16] += nq
        if n63:
            timings.rounds[63] += nq

    def _dev_stream_chunks(self):
        import jax.numpy as jnp
        if self._dev_chunks is None:
            self._dev_chunks = [
                (jnp.asarray(c.data), jnp.asarray(c.start),
                 jnp.asarray(c.end_block), jnp.asarray(c.lane))
                for c in self.chunks]
        return self._dev_chunks

    def _search_stream(self, frames, hits, qlen_pad, timings,
                       interpret=False):
        """Score all frames with the stream kernel (ops.sw_stream)."""
        import jax.numpy as jnp

        from .ops.sw_stream import (build_matrix8, build_qcodes,
                                    gather_scores, sw_scores_stream)
        p = self.params
        qc, ql = build_qcodes([f[2] for f in frames], qlen_pad)
        qc, ql = jnp.asarray(qc), jnp.asarray(ql)
        m8 = jnp.asarray(build_matrix8(self.matrix.matrix))
        # issue every chunk before the first sync: dispatch is async, so
        # device work overlaps the host-side hit entry below
        pending = []
        for chunk, dev in zip(self.chunks, self._dev_stream_chunks()):
            data, start, end_block, lane = dev
            out = sw_scores_stream(qc, ql, m8, data, start,
                                   gapopenextend=p.gapopenextend,
                                   gapextend=p.gapextend,
                                   interpret=interpret)
            pending.append((chunk, gather_scores(out, end_block, lane)))
        for chunk, sc in pending:
            sc = np.asarray(sc)                      # [NQ, n_chunk_units]
            meta = self.unit_meta[chunk.seqnos]
            for fi, (qstrand, qframe, _) in enumerate(frames):
                hits.enter_batch(meta[:, 0], sc[fi], qstrand, qframe,
                                 meta[:, 1], meta[:, 2])
            self._count_tiers(timings, sc, len(frames))

    def _search_segments(self, frames, hits, max_qlen, timings,
                         scores_fn, chunks):
        """Score all frames with a segment-packed kernel (lax/tiled/v1)."""
        import jax.numpy as jnp

        p = self.params
        qlen_pad = max(64, -(-max_qlen // 64) * 64)
        qpt = jnp.asarray(build_qpt([f[2] for f in frames],
                                    self.matrix.matrix, qlen_pad))
        for chunk in chunks:
            out = np.asarray(scores_fn(
                qpt, jnp.asarray(chunk.data), jnp.asarray(chunk.seg_ids),
                nsegs=chunk.seqnos.shape[0],
                gapopenextend=p.gapopenextend, gapextend=p.gapextend))
            # map (segment, lane) back to units
            unit_idx = chunk.seqnos.ravel()
            valid = unit_idx >= 0
            uids = unit_idx[valid]
            meta = self.unit_meta[uids]
            flats = []
            for fi, (qstrand, qframe, _) in enumerate(frames):
                flat = out[fi].reshape(-1)[valid]
                flats.append(flat)
                hits.enter_batch(meta[:, 0], flat, qstrand, qframe,
                                 meta[:, 1], meta[:, 2])
            self._count_tiers(timings, np.stack(flats), len(frames))
