"""Per-query search pipeline: pack -> score on TPU -> enter hits -> align.

TPU-native re-design of the reference's search runtime (parity targets:
work() /root/reference/swipe.cc:2436-2505, prepare_search/search_chunk
swipe.cc:1365-1699).  Differences by design:

* the pthread work queue over db chunks becomes a list of pre-packed
  lane-stream chunks scored by the Pallas stream kernel (ops.sw_stream;
  segment packing + ops.sw_pallas/sw_tiled remain as fallbacks);
  multi-chip sharding of the same chunk list lives in swipe_tpu.parallel;
* all (qstrand, qframe) variants of a query are scored in ONE kernel
  call per chunk (the query axis of the kernel grid), instead of the
  reference's per-frame passes;
* the 7->16->63-bit escalation is replaced by the exact int32 kernel
  (the TPU VPU has no sub-32-bit vector compare, see ops/sw_stream.py);
  cascade-compatibility tier counters are derived from the exact scores
  (_count_tiers) and match the reference's compute7/16/63 exactly.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field

import numpy as np

from .batching import PackedChunk, pack_database, pack_stream, round_up
from .hits import HitList
from .io.db import Database
from .io.fasta import Query
from .matrices import ScoreMatrix
from .ops.sw_pallas import build_qpt
from .stats import EvalueModel

__all__ = ["SearchEngine", "SearchParams", "SearchTimings"]


def reverse_tie_order(meta: np.ndarray) -> np.ndarray:
    """Column order for the device-side top-K: units must ascend in the
    REVERSE of the hit list's tie preference (score desc, seqno desc,
    dstrand asc, dframe asc — hits.finalize), because the reversed
    lax.top_k in the reductions prefers the highest column on ties.
    ``meta`` is [n, 3] rows of (seqno, dstrand, dframe)."""
    return np.lexsort((-meta[:, 2], -meta[:, 1], meta[:, 0]))


def _chunk_reduce_impl(sc, init_thr, upper, k, sl7, sl16):
    """Device-side per-chunk hit reduction: top-K candidates + counters.

    Replaces transferring every score to the host (the reference instead
    relies on a mutexed hits_enter per sequence, hits.cc:163-222).  Scores
    are selected by (score desc, unit id desc) — the reference's insertion
    tie order (hits.cc:188-191) — by running top_k on the unit-reversed
    array, since lax.top_k prefers the lowest index on ties.  Scores above
    the per-slot upper cutoff are masked to -1 (callers drop them), so the
    reduction stays exact under -u/-k.  Dispatched only as part of
    _fused_stream_step's single jitted computation.
    """
    import jax
    import jax.numpy as jnp

    totalh = (sc >= init_thr[:, None]).sum(axis=1)
    obvious = (sc > upper[:, None]).sum(axis=1)
    n16 = (sc >= sl7).sum()
    n63 = (sc >= sl16).sum()
    # entries above the upper cutoff (-u / -k) are counted in `obvious`
    # but excluded from the hit list (hits.cc:168-180): mask them below
    # any real SW score so they cannot occupy top-K slots
    sc = jnp.where(sc > upper[:, None], -1, sc)
    rev = sc[:, ::-1]
    vals, ridx = jax.lax.top_k(rev, k)
    idx = sc.shape[1] - 1 - ridx
    return vals, idx, totalh, obvious, n16, n63


@functools.lru_cache(maxsize=128)
def _fused_stream_step(long, interpret, gapopenextend, gapextend, qgroup,
                       megacore, nslots, topk, k, sl7, sl16,
                       use_dprof=False):
    """One jitted computation per configuration: stream kernel -> score
    gather -> (optionally) device top-K reduction.

    Folding the three device steps into a single dispatch removes two
    host->device round-trips per chunk through the remote tunnel
    (measured on the headline bench: 264 -> 405 GCUPS when the per-rep
    dispatches were chained the same way) and lets XLA free the
    per-block dump — up to 32 MB per slot on a full 65536-column chunk —
    immediately after the gather instead of holding it for a second
    dispatch.

    ``use_dprof`` precomputes the chunk's block score profiles on device
    (build_dprofile_series) and streams them into the kernel: the
    profiles depend only on the db block, so ONE build serves the whole
    slot group instead of every (query, block) grid step — the inline
    build was the kernel's entire measured fixed cost (~6.5 us/block at
    2048 lanes; single-query rate 246 -> 326 GCUPS without it).  The
    value is a dtype token: "i32" (full-rate profiles), "i16" (halved
    VMEM buffers — lets 512-row query states fit beside streamed
    profiles, measured +8.7% over the inline build on the cfg-3 shape,
    round 4), or falsy for the inline build."""
    import jax
    import jax.numpy as jnp

    from .ops.sw_stream import (build_dprofile_series, gather_scores,
                                sw_scores_stream, sw_scores_stream_long)

    def impl(qc, ql, m8, data, start, end_block, lane, init_thr, upper):
        if long:
            out = sw_scores_stream_long(
                qc, ql, m8, data, start, gapopenextend=gapopenextend,
                gapextend=gapextend, interpret=interpret)
        else:
            dp = build_dprofile_series(
                m8, data, interpret=interpret,
                dtype=jnp.int16 if use_dprof == "i16" else None) \
                if use_dprof else None
            out = sw_scores_stream(
                qc, ql, m8, data, start, gapopenextend=gapopenextend,
                gapextend=gapextend, interpret=interpret,
                qgroup=qgroup, megacore=megacore, dprof=dp)
        sc = gather_scores(out, end_block, lane)[:nslots]
        if topk:
            return _chunk_reduce_impl(sc, init_thr, upper, k, sl7, sl16)
        return sc

    return jax.jit(impl)


@functools.lru_cache(maxsize=256)
def _fused_flow_step(first, has_ends, interpret, gapopenextend, gapextend,
                     nslots, topk, k, sl7, sl16, use_dprof=False):
    """One jitted computation per flow-chunk configuration: state permute
    -> carry kernel -> score gather -> (optionally) device top-K.

    The flow series (batching.pack_stream_flow) threads per-lane DP state
    chunk to chunk, so unlike _fused_stream_step the carried (h, e, s)
    rides through the step; ``first`` skips the permute on chunk 0 and
    ``has_ends`` elides the gather for chunks where no sequence ends.
    ``use_dprof``: see _fused_stream_step (dtype token)."""
    import jax
    import jax.numpy as jnp

    from .ops.sw_stream import (build_dprofile_series, gather_scores,
                                permute_stream_state,
                                sw_scores_stream_carry)

    def impl(qc, ql, m8, data, start, src, h, e, s, eb, ln,
             init_thr, upper):
        if not first:
            h, e, s = permute_stream_state(h, e, s, src)
        dp = build_dprofile_series(
            m8, data, interpret=interpret,
            dtype=jnp.int16 if use_dprof == "i16" else None) \
            if use_dprof else None
        out, h, e, s = sw_scores_stream_carry(
            qc, ql, m8, data, start, h, e, s,
            gapopenextend=gapopenextend, gapextend=gapextend,
            interpret=interpret, dprof=dp)
        if not has_ends:
            return h, e, s
        sc = gather_scores(out, eb, ln)[:nslots]
        if topk:
            return (h, e, s) + _chunk_reduce_impl(sc, init_thr, upper, k,
                                                  sl7, sl16)
        return h, e, s, sc

    return jax.jit(impl)


def _dispatch_with_retry(step, *args, retries: int = 1):
    """Dispatch a jitted chunk step, retrying once on a transient
    runtime failure.

    The reference has no failure recovery at all (fatal() exits,
    /root/reference/swipe.cc:158-170); SURVEY §5 notes a re-dispatch of
    failed shards is a cheap extra since the chunk queue is already
    dynamic.  Here the remote execution tunnel occasionally drops a
    dispatch (worker restart); one retry after a short pause masks it.
    Only the runtime/transport error types a dropped dispatch can
    surface as are retried — a deterministic host-side bug (bad payload
    shape, a ValueError raised inside the step) raises immediately
    instead of paying a sleep and a full redispatch first.
    """
    import jax

    # XLA runtime errors (jax.errors.JaxRuntimeError) cover device-side
    # execution failures; OSError covers the tunnel's transport layer
    transient = (jax.errors.JaxRuntimeError, OSError)
    for attempt in range(retries + 1):
        try:
            return step(*args)
        except transient as exc:
            if attempt == retries:
                raise
            import sys
            import time as _time
            print(f"swipe_tpu: retrying chunk dispatch after transient "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr)
            _time.sleep(1.0)


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
    threads: int = 1          # -a: align-phase worker pool width

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

    @staticmethod
    def _work_multiplier(query, symtype: int, querystrands: int) -> float:
        """Per-query cell multiplier of the GCUPS formula
        (clock_stop, swipe.cc:1744-1775)."""
        if symtype == 0:
            w = len(query.nt[0])
            return 2 * w if querystrands == 3 else w
        if symtype in (1, 5):
            return len(query.aa[0])
        if symtype == 2:
            w = len(query.nt[0])
            return 2 * w if querystrands == 3 else w
        if symtype == 3:
            return 2 * len(query.aa[0])
        if symtype == 4:
            w = 2 * len(query.nt[0])
            return 2 * w if querystrands == 3 else w
        return 0

    def end(self, db_symcount: int, query, symtype: int, querystrands: int):
        self.end_batch(db_symcount, [query], symtype, querystrands)

    def end_batch(self, db_symcount: int, queries, symtype: int,
                  querystrands: int):
        now = time.time()
        self.endtime = time.strftime(
            "%a, %e %b %Y %H:%M:%S UTC", time.gmtime(now))
        self.elapsed = now - self.start
        speed = float(db_symcount) * sum(
            self._work_multiplier(q, symtype, querystrands)
            for q in queries)
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
        self._forced_nseqs = None
        if stream:
            valid = tuple(n for n, _ in self.STREAM_CONFIGS)
            if nseqs is None:
                nseqs = valid[0]
            elif nseqs not in valid:
                raise ValueError(
                    f"stream backend lane counts are {valid}, got {nseqs}")
            else:
                self._forced_nseqs = nseqs
        elif nseqs is None:
            nseqs = 512
        if max_cols is None:
            # stream chunks are sized so one chunk's precomputed block
            # profiles (128x the chunk bytes, see build_dprofile_series /
            # DPROF_MAX_BYTES) stay within the HBM guard: 2048 lanes x
            # 8192 cols = 16 MB data -> 2 GB of profiles per chunk.
            # More, smaller chunks cost nothing extra inside the fused
            # walks (one dispatch either way).  The GIANT threshold stays
            # at the old 65536: an 8k-64k db sequence (common nucleotide
            # scale) keeps the fast plain/flow pack — its oversized chunk
            # merely skips the dprofile precompute via _dprof_ok — instead
            # of falling to the serial per-sequence carry route.
            max_cols = 8192 if stream else 16384
            self._giant_cols = 65536 if stream else max_cols
        else:
            # explicit caps keep the old contract (tests force the giant
            # route by shrinking max_cols)
            self._giant_cols = max_cols
        self._pack(nseqs, max_cols)

    # stream-kernel configs: (lanes, row budget of the co-resident H/E
    # state).  Wider lane counts are faster (measured v5e: 2048 lanes
    # ~1.8x 1024 — 2 vregs per op gives the VPU chain-level parallelism)
    # but the O(qlen) state shrinks the supported query length; longer
    # queries fall back to the query-tiled path (still exact).  The 512
    # cap at 2048 lanes became possible in round 3 by inlining the
    # dprofile one-hot (no 1 MB scratch) — it is what lets TWO 256-row
    # members pair per grid step (member interleaving, +16% measured;
    # see ops/sw_stream._make_row_body_multi).
    STREAM_CONFIGS = ((2048, 512), (1024, 1024))

    # dprofile-precompute mode (round 3): the block profiles are built
    # once per chunk per slot group (build_dprofile_series) and streamed
    # into the kernel; the inline per-(query, block) build was the whole
    # measured fixed cost (~6.5 us/block at 2048 lanes; config-1 bench
    # 182 -> 244 GCUPS, single-query kernel to ~98% of the VPU ceiling).
    # The streamed profile blocks are double-buffered in VMEM (2 x
    # 4.2 MB at 2048 lanes), so the co-resident H/E row budget shrinks:
    # queries past STREAM_ROWS_DPROF keep the inline build instead of
    # falling to the (much slower) long path.
    USE_DPROF = True
    STREAM_ROWS_DPROF = ((2048, 288), (1024, 640))
    # int16-profile FALLBACK tier: halved buffers let longer query rows
    # (e.g. 512-row blastn queries) keep streamed profiles -- measured
    # round 4: +8.7% over the inline build at 512 rows, but -5% vs int32
    # where int32 fits, so it only engages past STREAM_ROWS_DPROF
    STREAM_ROWS_DPROF_I16 = ((2048, 512), (1024, 1024))
    # skip the precompute for chunks whose profile array would not fit
    # comfortably in HBM (bytes = 128 x chunk data bytes)
    DPROF_MAX_BYTES = 3 << 30

    def _dprof_ok(self, use_dprof, data):
        """HBM-size guard: returns the dtype token ("i32"/"i16") when
        this chunk's profile array fits the budget, else False (int16
        profiles are half the bytes)."""
        if not use_dprof:
            return False
        per = 64 if use_dprof == "i16" else 128
        return use_dprof if data.size * per <= self.DPROF_MAX_BYTES \
            else False

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
        self._max_cols = max_cols
        # units longer than the giant threshold would stretch the whole
        # pack to nseqs x their length; they go to the carry series
        # instead (pack_stream_carry), which bounds every chunk at
        # nseqs x max_cols
        gc = getattr(self, "_giant_cols", max_cols)
        lens = np.array([len(s) for s in self._unit_seqs], dtype=np.int64)
        self._giant_ids = np.nonzero(lens > gc)[0].astype(np.int64)
        self._normal_ids = np.nonzero(lens <= gc)[0].astype(np.int64)
        self._giant_seqs = [self._unit_seqs[i] for i in self._giant_ids]
        self._norm_lens = lens[self._normal_ids]
        self._carry_packs: dict[int, list] = {}
        self._stream_packs: dict[int, list] = {}
        self._dev_stream: dict[int, list] = {}
        self._seg_packs: dict[tuple, tuple] = {}
        self._dev_seg: dict[tuple, list] = {}
        self._flow_packs: dict[int, list] = {}
        self._dev_flow: dict[int, list] = {}
        if self.backend in ("stream", "stream_interpret"):
            # flow-routed databases never touch the plain lane pack;
            # build it only when the flow heuristic passes on it
            self.chunks = None if self._flow_cols(nseqs) is not None \
                else self._stream_chunks(nseqs)
            self._seg_chunks = None
        else:
            self.chunks = pack_database(
                [self._unit_seqs[i] for i in self._normal_ids],
                nseqs=nseqs, max_cols=max_cols, seqnos=self._normal_ids)
            self._seg_chunks = self.chunks

    @property
    def unit_count(self) -> int:
        """Number of (seqno, strand, frame) scoring units in the database."""
        return len(self.unit_meta)

    # the query-tiled (long) path carries 4 HBM boundary planes of
    # 4 bytes per db column per lane per slot; smaller chunks bound them
    LONG_MAX_COLS = 16384

    def _stream_chunks(self, nseqs: int, max_cols: int | None = None):
        """Lane-packed chunks for the stream kernel at a lane count
        (giant units excluded — they score via the carry series)."""
        key = (nseqs, max_cols or self._max_cols)
        if key not in self._stream_packs:
            self._stream_packs[key] = pack_stream(
                [self._unit_seqs[i] for i in self._normal_ids],
                nseqs=key[0], max_cols=key[1], seqnos=self._normal_ids)
        return self._stream_packs[key]

    # flow packing engages when single-chunk lane packing would pad every
    # lane to the tallest member: occupancy ceiling = mean_lane/longest,
    # which collapses on heavy length tails over SMALL databases (large
    # ones have mean lane >> longest and LPT stays ~0.95+).  Below
    # FLOW_MIN_AVG_LANE columns of mean lane load the absolute waste is
    # negligible and the plain single-dispatch pack stays (the flow
    # series costs one launch + state DMA per chunk).
    FLOW_TAIL_RATIO = 1.25
    FLOW_MIN_AVG_LANE = 512

    def _flow_cols(self, nseqs: int) -> int | None:
        """Full-chunk height for the flow route, or None to keep the
        plain lane pack (pack_stream)."""
        if self._norm_lens.size == 0:
            return None
        total = int(self._norm_lens.sum())
        longest = int(self._norm_lens.max())
        avg_lane = total / nseqs
        if avg_lane < self.FLOW_MIN_AVG_LANE \
                or longest <= self.FLOW_TAIL_RATIO * avg_lane:
            return None
        mc = (int(avg_lane) // 2 + 64) // 128 * 128
        return min(max(mc, 256), self._max_cols)

    def _flow_chunks(self, nseqs: int):
        """Flow-series chunks (built lazily; see pack_stream_flow)."""
        from .batching import pack_stream_flow
        if nseqs not in self._flow_packs:
            self._flow_packs[nseqs] = pack_stream_flow(
                [self._unit_seqs[i] for i in self._normal_ids],
                nseqs=nseqs, max_cols=self._flow_cols(nseqs),
                drain_cols=128, seqnos=self._normal_ids)
        return self._flow_packs[nseqs]

    def _dev_flow_chunks(self, nseqs: int):
        """Device arrays per flow chunk (score-gather coordinates in
        reverse tie order, like _dev_stream_chunks)."""
        import jax.numpy as jnp

        def prep(c):
            order = reverse_tie_order(self.unit_meta[c.seqnos])
            return (jnp.asarray(c.data_t).T, jnp.asarray(c.start),
                    jnp.asarray(c.carry_src),
                    jnp.asarray(c.end_block[order]),
                    jnp.asarray(c.lane[order]),
                    c.seqnos[order], c.nseqs,
                    jnp.asarray(c.seqnos[order].astype(np.int32)))

        chunks = self._flow_chunks(nseqs)
        total = sum(c.data_t.size for c in chunks)
        if total <= self.DEVICE_CACHE_BYTES:
            if nseqs not in self._dev_flow:
                self._dev_flow[nseqs] = [prep(c) for c in chunks]
            yield from self._dev_flow[nseqs]
        else:
            for c in chunks:
                yield prep(c)

    def _segment_chunks(self) -> list[PackedChunk]:
        """Segment-packed chunks for the fallback path (built lazily)."""
        if self._seg_chunks is None:
            self._seg_chunks = pack_database(
                [self._unit_seqs[i] for i in self._normal_ids],
                nseqs=512, max_cols=16384, seqnos=self._normal_ids)
        return self._seg_chunks

    def _carry_chunks(self, nseqs: int):
        """Carry-series chunks for chromosome-scale units (built lazily).

        The series streams each giant unit through bounded fixed-height
        chunks with H/E/S carried between them — the TPU equivalent of
        the reference's O(qlen)-state unbounded db streaming
        (search7.cc:787, database.cc:1082-1131)."""
        from .batching import pack_stream_carry
        if nseqs not in self._carry_packs:
            self._carry_packs[nseqs] = pack_stream_carry(
                self._giant_seqs, nseqs=nseqs, max_cols=self._max_cols,
                seqnos=self._giant_ids)
        return self._carry_packs[nseqs]

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
        return self.search_batch([query], timings)[0]

    def search_batch(self, queries: list[Query],
                     timings: SearchTimings | None = None) -> list[HitList]:
        """Search a batch of queries in one kernel pass per db chunk.

        All (query, strand, frame) variants share the kernel's query grid
        axis, so batching amortizes dispatch and db-streaming costs
        (BASELINE configs 3-4).  Returns one finalized+aligned HitList per
        query, in order.
        """
        p = self.params
        hitlists = []
        for query in queries:
            evmodel = EvalueModel(
                p.symtype, query.length, self.db.seqcount_masked(),
                self.db.symcount_masked(),
                matrixname=p.matrixname if p.symtype != 0 else None,
                matchscore=p.matchscore, mismatchscore=p.mismatchscore,
                gapopen=p.gapopen, gapextend=p.gapextend,
                effdbsize=p.effdbsize)
            hitlists.append(
                HitList(p.descriptions, p.alignments, p.minscore,
                        p.maxscore, p.minexpect, p.expect, evmodel, self.db,
                        p.symtype, p.querystrands))

        # flat (hitlist, qstrand, qframe, codes) slots across the batch
        slots = []
        for query, hits in zip(queries, hitlists):
            for qstrand, qframe, codes in self.query_frames(query):
                slots.append((hits, qstrand, qframe, codes))

        if slots:
            if timings is not None:
                timings.begin()
            backend = self.backend
            if backend in ("stream", "stream_interpret") \
                    and self.matrix.fits_int8:
                interp = backend == "stream_interpret"
                # group slots by length so one long query doesn't push the
                # whole batch onto a slower configuration; hit entry is
                # per-slot so scoring order doesn't matter
                slots_sorted = sorted(slots, key=lambda s: len(s[3]))
                groups: list[tuple] = []
                caps = dict(self.STREAM_CONFIGS)
                for s in slots_sorted:
                    qlen_pad = self.qlen_bucket(len(s[3]))
                    if self._forced_nseqs is not None \
                            and qlen_pad <= caps[self._forced_nseqs]:
                        nseqs = self._forced_nseqs
                    else:
                        nseqs = next((n for n, cap in self.STREAM_CONFIGS
                                      if qlen_pad <= cap), None)
                    if nseqs is None:
                        qlen_pad = -(-len(s[3]) // 512) * 512
                        cfg = (qlen_pad, 1024, True)
                    else:
                        cfg = (qlen_pad, nseqs, False)
                    if groups and groups[-1][0] == cfg:
                        groups[-1][1].append(s)
                    else:
                        groups.append((cfg, [s]))
                for (qlen_pad, nseqs, long), group in groups:
                    self._search_stream(group, qlen_pad, nseqs, timings,
                                        interpret=interp, long=long)
            else:
                # non-int8 matrices or explicit segment backends; only the
                # lax path scores matrices outside int8 range
                fb = backend
                if backend in ("stream", "stream_interpret") \
                        or not self.matrix.fits_int8:
                    fb = "lax"
                self._search_segments(slots, max(len(s[3]) for s in slots),
                                      timings, self._scores_fn(fb),
                                      self._segment_chunks())
            if timings is not None:
                timings.end_batch(self.db.symcount_masked(), queries,
                                  p.symtype, p.querystrands)

        # align phase: the hint pass is hoisted ACROSS the whole batch —
        # all (query, qstrand, qframe) bins ride one grid dispatch set
        # (ops.align_hint.hint_endpoints_grid; a per-bin dispatch would
        # pay the remote tunnel's latency queries x frames times; the
        # reference's per-thread search16s never paid a per-bin cost,
        # swipe.cc:339-414)
        from .ops.align_hint import hint_endpoints_grid
        prepared = []
        jobs = []
        for query, hits in zip(queries, hitlists):
            hits.finalize()
            shown, bins = hits.align_prepare(
                query, self.matrix.scorelimit_16)
            prepared.append((query, hits, shown, bins))
            for qseq, items in bins:
                jobs.append((qseq, [h.dseq for _, h in items]))
        res = hint_endpoints_grid(jobs, self.matrix.matrix, p.gapopen,
                                  p.gapextend)
        k = 0
        for query, hits, shown, bins in prepared:
            hints: dict[int, tuple[int, int, int]] = {}
            for qseq, items in bins:
                for (i, h), (score, bestq, bestpos) in zip(items, res[k]):
                    if bestq > 0 and bestpos:
                        hints[i] = (score, bestq, bestpos)
                k += 1
            hits.align_finish(query, self.matrix.matrix, p.gapopen,
                              p.gapextend, shown, hints,
                              threads=p.threads)
        return hitlists

    @staticmethod
    def qlen_bucket(L: int) -> int:
        """Compiled query-row bucket for a query of length L: short
        queries bucket to 32 rows so the query group (shared-dprofile)
        packs more members under the VMEM row cap; longer ones keep the
        coarse 128 buckets (bounded compile-cache shapes).  Shared with
        the CLI's --prime sweep, which compiles one shape class per
        distinct bucket."""
        if L <= 128:
            return max(32, -(-L // 32) * 32)
        return -(-L // 128) * 128

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

    # packed chunks are kept resident on the device up to this budget;
    # larger databases (e.g. NR-scale) stream per search instead — the
    # reference equivalently re-reads its mmap per query (database.cc)
    DEVICE_CACHE_BYTES = 8 << 30

    def _dev_stream_chunks(self, nseqs: int, max_cols: int | None = None):
        """Device arrays per stream chunk, with the score-gather coordinates
        sorted by unit id so score columns ascend in unit order (the exact
        tie-break the device-side top-K relies on).  Yields lazily; chunks
        are cached on device only while the total stays under
        DEVICE_CACHE_BYTES."""
        import jax.numpy as jnp

        def prep(c):
            order = reverse_tie_order(self.unit_meta[c.seqnos])
            # upload lane-major and transpose on device (the host-side
            # transpose of a multi-hundred-MB chunk is the slow part);
            # the trailing device copy of the unit ids feeds the fused
            # walk as an ARGUMENT (closed-over arrays embed in the
            # lowered module at ~200 s/MB — see _stream_walk)
            return (jnp.asarray(c.data_t).T, jnp.asarray(c.start),
                    jnp.asarray(c.end_block[order]),
                    jnp.asarray(c.lane[order]),
                    c.seqnos[order],
                    jnp.asarray(c.seqnos[order].astype(np.int32)))

        chunks = self._stream_chunks(nseqs, max_cols)
        key = (nseqs, max_cols or self._max_cols)
        total = sum(c.data_t.size for c in chunks)
        if total <= self.DEVICE_CACHE_BYTES:
            if key not in self._dev_stream:
                self._dev_stream[key] = [prep(c) for c in chunks]
            yield from self._dev_stream[key]
        else:
            for c in chunks:
                yield prep(c)

    # slots scored per kernel pass: bounds the [nslots, nblocks, nseqs]
    # per-block dump (1k-query batches would otherwise exhaust HBM).  The
    # long-query path additionally carries 4 HBM boundary planes of
    # nslots x nblocks x KSEG x SUB x NL x 4B, so its group is smaller.
    SLOT_BATCH = 16
    SLOT_BATCH_LONG = 4
    # chunks in flight before syncing the oldest (async dispatch with no
    # backpressure would keep every upload + dump buffer live at once)
    CHUNK_WINDOW = 4

    def _search_stream(self, slots, qlen_pad, nseqs, timings,
                       interpret=False, long=False):
        """Score all (hitlist, strand, frame) slots with the stream kernel
        (ops.sw_stream); the slot index is the kernel's query grid axis,
        processed SLOT_BATCH at a time.  ``long`` switches to the
        query-tiled variant (boundary planes in HBM) for queries beyond
        one VMEM tile."""
        step = self.SLOT_BATCH_LONG if long else self.SLOT_BATCH
        for i in range(0, len(slots), step):
            # the tail group pads to its own power of two, NOT the full
            # step: a dead slot still pays the per-(slot, block) profile
            # DMA (qlen 0 skips only the row loop), which round-5
            # attribution measured at ~half a full group's wall for a
            # 4-of-16 tail (tools/profile_cfg4.py: 1.14 s vs 2.26 s).
            # The price is one extra compiled walk shape per distinct
            # tail size — amortized by the persistent compile cache
            # (round 5's --prime / argument-passing fix); before that
            # fix a mid-search tail compile cost ~40 s, which is why
            # this used to force the full-step shape
            self._search_stream_group(slots[i:i + step],
                                      qlen_pad, nseqs, timings,
                                      interpret=interpret, long=long)

    def _search_stream_group(self, slots, qlen_pad, nseqs, timings,
                             interpret=False, long=False):
        import jax.numpy as jnp

        from .ops.sw_stream import build_matrix8, build_qcodes
        p = self.params
        qc, ql = build_qcodes([s[3] for s in slots], qlen_pad)
        # bucket the slot count to a power of two: bounded compiled
        # shapes ({1,2,4,...,SLOT_BATCH} per config), and a dead slot's
        # padding cost is its per-(slot, block) profile DMA only (qlen 0
        # skips the row loop)
        nslots = len(slots)
        nslots_pad = 1
        while nslots_pad < nslots:
            nslots_pad *= 2
        if nslots_pad != nslots:
            from .ops.sw_pallas import PAD_SYMBOL
            qc = np.concatenate(
                [qc, np.full((nslots_pad - nslots, qlen_pad), PAD_SYMBOL,
                             qc.dtype)], axis=0)
            ql = np.concatenate(
                [ql, np.zeros(nslots_pad - nslots, ql.dtype)], axis=0)
        qc, ql = jnp.asarray(qc), jnp.asarray(ql)
        m8 = jnp.asarray(build_matrix8(self.matrix.matrix))
        # dead padding slots get INT32_MAX thresholds: they count no
        # hits, mask nothing, and their all-zero scores never reach the
        # tier limits — the host ignores their payload rows anyway
        pad_hi = [2**31 - 1] * (nslots_pad - nslots)
        init_thr = jnp.asarray(
            [max(min(s[0].init_threshold, 2**31 - 1), -2**31)
             for s in slots] + pad_hi, jnp.int32)
        # upper cutoff (-u/-k): _chunk_reduce_impl masks scores above it on
        # device, so the top-K stays exact (hits.cc:168-180 semantics)
        upper_thr = jnp.asarray(
            [max(min(s[0].upperscorethreshold, 2**31 - 1), -2**31)
             for s in slots] + pad_hi, jnp.int32)
        kbase = max(s[0].keephits for s in slots) + 64

        def drain(item):
            units, payload, reduced = item
            self._enter_chunk(slots, units, payload, reduced, timings)

        # dprofile precompute (build_dprofile_series): the block profiles
        # are db-only, built once per chunk per slot group and STREAMED
        # into the kernel — the inline build was the whole measured fixed
        # cost.  The profile blocks take VMEM the inline path spent on
        # row state, so the row cap shrinks (STREAM_ROWS_DPROF); queries
        # beyond that cap keep the inline build rather than fall to the
        # much slower long path.
        dcap = dict(self.STREAM_ROWS_DPROF)[nseqs]
        dcap16 = dict(self.STREAM_ROWS_DPROF_I16)[nseqs]
        use_dprof = False
        if self.USE_DPROF and not long:
            if qlen_pad <= dcap:
                use_dprof = "i32"
            elif qlen_pad <= dcap16:
                use_dprof = "i16"

        # heavy length tails over small databases route through the flow
        # series (state-carrying chunks at ~full occupancy) instead of
        # the single-chunk lane pack; giants still go to the carry /
        # segmented routes below
        if not long and self._flow_cols(nseqs) is not None:
            self._search_flow_group(slots, qc, ql, m8, init_thr, upper_thr,
                                    kbase, nseqs, qlen_pad, timings,
                                    interpret, drain, use_dprof)
            self._score_carry_series(
                slots, qlen_pad, timings,
                kind="stream_interpret" if interpret else "stream")
            return

        # short-query dprofile amortization: members of a query group
        # share one dprofile build per db block; the group's row states
        # must fit the config's VMEM row cap (STREAM_CONFIGS).  With
        # STREAMED profiles there is no build to amortize and the
        # residual member pairing measured NEGATIVE (the kernel
        # saturates the VPU's 2-wide issue at 2048 lanes -- round-4
        # config table, BASELINE.md), so dprof mode runs qgroup=1.
        qgroup = 1
        if not long and not use_dprof:
            cap = dict(self.STREAM_CONFIGS)[nseqs]
            # bound by the PADDED count so a padded tail group keeps the
            # main groups' kernel shape
            qgroup = min(max(cap // qlen_pad, 1), nslots_pad)
            # even qgroups run members pairwise-interleaved in the row
            # loop (+16% with the inline build, mostly build
            # amortization)
            if qgroup >= 2:
                qgroup &= ~1
        # v4/v5p: split query groups across the chip's two TensorCores
        from .ops.sw_stream import is_megacore
        megacore = not interpret and is_megacore()
        # device-cached multi-chunk databases run as ONE jitted walk with
        # a single packed result (one tunnel round-trip per slot group;
        # per-chunk drains cost ~40 ms each — measured ~0.8 s of the
        # full config-4 wall).  Streaming-mode databases keep the
        # windowed per-chunk loop: dispatch is async so device work
        # overlaps the host-side hit entry, but unbounded issue would
        # keep every upload + dump buffer live at once.
        mc_key = (nseqs, (self.LONG_MAX_COLS if long else None)
                  or self._max_cols)
        chunks_dev = list(self._dev_stream_chunks(
            nseqs, self.LONG_MAX_COLS if long else None))
        if mc_key in self._dev_stream and len(chunks_dev) > 1:
            self._search_stream_fused(slots, qc, ql, m8, init_thr,
                                      upper_thr, kbase, timings,
                                      (long, interpret, qgroup, megacore,
                                       mc_key, qlen_pad, use_dprof),
                                      chunks_dev)
        else:
            pending = []
            for data, start, end_block, lane, units, _ud in chunks_dev:
                use_topk = kbase < units.shape[0]
                step = _fused_stream_step(
                    long, interpret, p.gapopenextend, p.gapextend, qgroup,
                    megacore, nslots_pad, use_topk, kbase,
                    self.matrix.scorelimit_7, self.matrix.scorelimit_16,
                    use_dprof=self._dprof_ok(use_dprof, data))
                payload = _dispatch_with_retry(
                    step, qc, ql, m8, data, start, end_block, lane,
                    init_thr, upper_thr)
                pending.append((units, payload, use_topk))
                if len(pending) >= self.CHUNK_WINDOW:
                    drain(pending.pop(0))
            for item in pending:
                drain(item)
        # chromosome-scale units stream through the bounded carry series
        # (queries beyond one VMEM tile use its tiled-carry variant)
        self._score_carry_series(
            slots, qlen_pad, timings,
            kind="stream_interpret" if interpret else "stream")

    def _stream_walk(self, cfg, nq, kbase):
        """One-dispatch walk over a device-cached plain-pack chunk list
        (the independent-chunk twin of _flow_walk): every chunk scores,
        gathers, and reduces on device; results pack into one int32
        array [nq, 2*K + 4] = [scores | unit ids | totalh | obvious |
        n16 | n63].

        The chunk buffers ride as a PYTREE ARGUMENT, never a closure: a
        closed-over jax.Array embeds in the lowered module as a constant
        at a measured ~200 s/MB on this host — that embedding WAS the
        entire round-4 cold-start wall (a cfg-1 first search paid ~240 s
        of lowering that the persistent compile cache cannot skip).  As
        arguments the walk lowers in milliseconds and one jitted walk
        re-binds to any same-shaped database."""
        key = ("stream", cfg, nq, kbase)
        cache = getattr(self, "_flow_walk_cache", None)
        if cache is None:
            cache = self._flow_walk_cache = {}
        if key in cache:
            return cache[key]
        import jax
        import jax.numpy as jnp

        from .ops.sw_stream import (build_dprofile_series, gather_scores,
                                    sw_scores_stream,
                                    sw_scores_stream_long)
        long, interpret, qgroup, megacore, _, _, use_dprof = cfg
        p = self.params
        sl7 = self.matrix.scorelimit_7
        sl16 = self.matrix.scorelimit_16

        @jax.jit
        def walk(qc, ql, m8, init_thr, upper, chunks):
            vals_parts, unit_parts = [], []
            totalh = jnp.zeros((nq,), jnp.int32)
            obvious = jnp.zeros((nq,), jnp.int32)
            n16 = jnp.int32(0)
            n63 = jnp.int32(0)
            for i, (data, start, eb, ln, ud) in enumerate(chunks):
                if long:
                    out = sw_scores_stream_long(
                        qc, ql, m8, data, start,
                        gapopenextend=p.gapopenextend,
                        gapextend=p.gapextend, interpret=interpret)
                else:
                    # profiles are built per chunk inside the walk: one
                    # build serves the whole slot group, and XLA frees
                    # each chunk's profile buffer after its kernel
                    tok = self._dprof_ok(use_dprof, data)
                    dp = build_dprofile_series(
                        m8, data, interpret=interpret,
                        dtype=jnp.int16 if tok == "i16" else None) \
                        if tok else None
                    out = sw_scores_stream(
                        qc, ql, m8, data, start,
                        gapopenextend=p.gapopenextend,
                        gapextend=p.gapextend, interpret=interpret,
                        qgroup=qgroup, megacore=megacore, dprof=dp)
                sc = gather_scores(out, eb, ln)
                totalh = totalh + (sc >= init_thr[:, None]).sum(
                    axis=1).astype(jnp.int32)
                obvious = obvious + (sc > upper[:, None]).sum(
                    axis=1).astype(jnp.int32)
                n16 = n16 + (sc >= sl7).sum().astype(jnp.int32)
                n63 = n63 + (sc >= sl16).sum().astype(jnp.int32)
                sc = jnp.where(sc > upper[:, None], -1, sc)
                if kbase < sc.shape[1]:
                    rev = sc[:, ::-1]
                    v, ridx = jax.lax.top_k(rev, kbase)
                    idx = sc.shape[1] - 1 - ridx
                    u = ud[idx] + v * 0
                else:
                    v = sc
                    u = jnp.broadcast_to(ud[None, :], sc.shape) + v * 0
                vals_parts.append(v)
                unit_parts.append(u)
            V = jnp.concatenate(vals_parts, axis=1)
            U = jnp.concatenate(unit_parts, axis=1)
            return jnp.concatenate(
                [V, U, totalh[:, None], obvious[:, None],
                 jnp.full((nq, 1), 1, jnp.int32) * n16,
                 jnp.full((nq, 1), 1, jnp.int32) * n63], axis=1)

        cache[key] = walk
        return walk

    def _search_stream_fused(self, slots, qc, ql, m8, init_thr, upper_thr,
                             kbase, timings, cfg, chunks_dev):
        """One dispatch + one fetch for a device-cached plain-pack chunk
        list (see _stream_walk)."""
        walk = self._stream_walk(cfg, int(qc.shape[0]), kbase)
        chunks = tuple((d, st, eb, ln, ud)
                       for d, st, eb, ln, _u, ud in chunks_dev)
        packed = np.asarray(_dispatch_with_retry(
            walk, qc, ql, m8, init_thr, upper_thr, chunks))
        self._enter_packed(slots, packed,
                           sum(u.shape[0] for *_, u, _ud in chunks_dev),
                           timings)

    def _enter_packed(self, slots, packed, n_units, timings):
        """Unpack one [nq, 2K+4] walk result and enter all hits."""
        K = (packed.shape[1] - 4) // 2
        V, U = packed[:, :K], packed[:, K:2 * K]
        totalh = packed[:, 2 * K]
        obvious = packed[:, 2 * K + 1]
        n16, n63 = int(packed[0, 2 * K + 2]), int(packed[0, 2 * K + 3])
        for fi, (hits, qstrand, qframe, _) in enumerate(slots):
            sel = V[fi] >= 0
            meta = self.unit_meta[U[fi][sel]]
            hits.enter_batch(meta[:, 0], V[fi][sel], qstrand, qframe,
                             meta[:, 1], meta[:, 2],
                             counts=(int(totalh[fi]), int(obvious[fi])))
        if timings is not None:
            timings.compute[7] += n_units * len(slots)
            timings.compute[16] += n16
            timings.compute[63] += n63
            timings.rounds[7] += len(slots)
            if n16:
                timings.rounds[16] += len(slots)
            if n63:
                timings.rounds[63] += len(slots)

    def _search_flow_group(self, slots, qc, ql, m8, init_thr, upper_thr,
                           kbase, nseqs, qlen_pad, timings, interpret,
                           drain, use_dprof=False):
        """Score one slot group through the flow series.

        When the whole series is device-cached (the common case), ALL
        chunks run as ONE jitted walk whose single packed result crosses
        the host link once (_flow_walk): a per-chunk drain costs a ~40 ms
        tunnel round-trip, which dominated small searches (measured:
        cfg2 at 1 GCUPS from ~11 chunk syncs).  Streaming-mode databases
        (beyond the device cache) keep the per-chunk step loop with a
        CHUNK_WINDOW of pending payloads."""
        from .ops.sw_stream import make_stream_state
        p = self.params
        chunks_dev = list(self._dev_flow_chunks(nseqs))
        if nseqs in self._dev_flow:
            self._search_flow_fused(slots, qc, ql, m8, init_thr,
                                    upper_thr, kbase, nseqs, qlen_pad,
                                    timings, interpret, chunks_dev,
                                    use_dprof)
            return
        state = None
        pending = []
        for data, start, src, eb, ln, units, w, _ud in chunks_dev:
            first = state is None
            if first:
                state = make_stream_state(qc.shape[0], qlen_pad, w)
            has_ends = units.shape[0] > 0
            use_topk = has_ends and kbase < units.shape[0]
            step = _fused_flow_step(
                first, has_ends, interpret, p.gapopenextend, p.gapextend,
                int(qc.shape[0]), use_topk, kbase,
                self.matrix.scorelimit_7, self.matrix.scorelimit_16,
                use_dprof=self._dprof_ok(use_dprof, data))
            out = _dispatch_with_retry(
                step, qc, ql, m8, data, start, src, *state, eb, ln,
                init_thr, upper_thr)
            state = out[:3]
            if has_ends:
                payload = out[3] if not use_topk else out[3:]
                pending.append((units, payload, use_topk))
                if len(pending) >= self.CHUNK_WINDOW:
                    drain(pending.pop(0))
        for item in pending:
            drain(item)

    def _flow_walk(self, nseqs, nq, qlen_pad, kbase, interpret,
                   use_dprof=False):
        """Build (and cache) the one-dispatch walk over a device-cached
        flow series: state threads through every chunk in one jit; each
        chunk's ending units reduce to (score, GLOBAL unit id) rows on
        device; everything packs into ONE int32 array
        [nq, 2*K + 4] = [scores | unit ids | totalh | obvious | n16 | n63]
        so exactly one buffer crosses the tunnel per slot group.

        The chunk buffers ride as a PYTREE ARGUMENT (a tuple of
        (data, start, src, eb, ln, ud) tuples), never a closure: a
        closed-over jax.Array embeds in the lowered module as a constant
        at a measured ~200 s/MB — that embedding was the round-4
        cold-start wall (see _stream_walk)."""
        key = (nseqs, nq, qlen_pad, kbase, interpret, use_dprof)
        cache = getattr(self, "_flow_walk_cache", None)
        if cache is None:
            cache = self._flow_walk_cache = {}
        if key in cache:
            return cache[key]
        import jax
        import jax.numpy as jnp

        from .ops.sw_stream import (build_dprofile_series, gather_scores,
                                    make_stream_state,
                                    permute_stream_state,
                                    sw_scores_stream_carry)
        p = self.params
        sl7 = self.matrix.scorelimit_7
        sl16 = self.matrix.scorelimit_16

        @jax.jit
        def walk(qc, ql, m8, init_thr, upper, chunks):
            h = e = s = None
            vals_parts, unit_parts = [], []
            totalh = jnp.zeros((nq,), jnp.int32)
            obvious = jnp.zeros((nq,), jnp.int32)
            n16 = jnp.int32(0)
            n63 = jnp.int32(0)
            for i, (data, start, src, eb, ln, ud) in \
                    enumerate(chunks):
                w = data.shape[1]
                if i == 0:
                    h, e, s = make_stream_state(nq, qlen_pad, w)
                else:
                    h, e, s = permute_stream_state(h, e, s, src)
                tok = self._dprof_ok(use_dprof, data)
                dp = build_dprofile_series(
                    m8, data, interpret=interpret,
                    dtype=jnp.int16 if tok == "i16" else None) \
                    if tok else None
                # NARROW chunks (the flow series' drains: 1024 lanes = one
                # vreg per op, half the VPU's 2-wide issue) interleave TWO
                # stream queries per grid step: the drain's mandatory
                # full-width pass is paid once per query pair.  Measured
                # in drift-cancelling rotation (round 4, BASELINE.md
                # config table): drain minter=2 + the head/tail DMA trim
                # below = +4.8% whole-series; deeper interleave (minter=4,
                # any ru) and 2048-lane pairing both REGRESS — the wide
                # chunks already saturate the VPU's 2-wide issue and
                # minter x ru > 8 live row-states spills registers.
                minter = 2 if (w <= 1024 and qlen_pad <= 512
                               and nq % 2 == 0) else 1
                out, h, e, s = sw_scores_stream_carry(
                    qc, ql, m8, data, start, h, e, s,
                    gapopenextend=p.gapopenextend,
                    gapextend=p.gapextend, interpret=interpret, dprof=dp,
                    minter=minter, carry_in=i > 0,
                    carry_out=i < len(chunks) - 1)
                if ud.shape[0] == 0:
                    continue
                sc = gather_scores(out, eb, ln)
                totalh = totalh + (sc >= init_thr[:, None]).sum(
                    axis=1).astype(jnp.int32)
                obvious = obvious + (sc > upper[:, None]).sum(
                    axis=1).astype(jnp.int32)
                n16 = n16 + (sc >= sl7).sum().astype(jnp.int32)
                n63 = n63 + (sc >= sl16).sum().astype(jnp.int32)
                sc = jnp.where(sc > upper[:, None], -1, sc)
                if kbase < sc.shape[1]:
                    rev = sc[:, ::-1]
                    v, ridx = jax.lax.top_k(rev, kbase)
                    idx = sc.shape[1] - 1 - ridx
                    u = ud[idx] + v * 0
                else:
                    v = sc
                    u = jnp.broadcast_to(ud[None, :], sc.shape) + v * 0
                vals_parts.append(v)
                unit_parts.append(u)
            V = jnp.concatenate(vals_parts, axis=1)
            U = jnp.concatenate(unit_parts, axis=1)
            return jnp.concatenate(
                [V, U, totalh[:, None], obvious[:, None],
                 jnp.full((nq, 1), 1, jnp.int32) * n16,
                 jnp.full((nq, 1), 1, jnp.int32) * n63], axis=1)

        cache[key] = walk
        return walk

    def _search_flow_fused(self, slots, qc, ql, m8, init_thr, upper_thr,
                           kbase, nseqs, qlen_pad, timings, interpret,
                           chunks_dev, use_dprof=False):
        """One dispatch + one fetch for the whole device-cached flow
        series (see _flow_walk)."""
        walk = self._flow_walk(nseqs, int(qc.shape[0]), qlen_pad, kbase,
                               interpret, use_dprof)
        chunks = tuple((d, st, src, eb, ln, ud)
                       for d, st, src, eb, ln, _u, _w, ud in chunks_dev)
        packed = np.asarray(_dispatch_with_retry(
            walk, qc, ql, m8, init_thr, upper_thr, chunks))
        self._enter_packed(slots, packed,
                           sum(u.shape[0] for *_, u, _w, _ud in chunks_dev),
                           timings)

    def _score_carry_series(self, slots, qlen_pad, timings, *, kind):
        """Score the giant units against all slots via the carry series.

        Each chunk of the series is one kernel call; the per-lane DP
        state (H/E rows + running S) flows chunk to chunk on device, so a
        100 Mbp sequence runs in nseqs x max_cols memory — the transpose
        of sw_scores_stream_long's query tiling, matching the reference's
        unbounded-db-length semantics (search7.cc:787).

        Slots are processed SLOT_BATCH at a time for the same reason the
        stream path batches them: the carried H/E state and the per-chunk
        dump scale with the slot count, and some callers (the segment
        fallback) pass the whole batch at once."""
        step = self.SLOT_BATCH if qlen_pad <= 1024 else self.SLOT_BATCH_LONG
        for i in range(0, len(slots), step):
            group = slots[i:i + step]
            pending = []
            for units, sc in self._iter_carry_scores(group, qlen_pad, kind):
                pending.append((units, sc))
                if len(pending) >= self.CHUNK_WINDOW:
                    u, s = pending.pop(0)
                    self._enter_chunk(group, u, s, False, timings)
            for u, s in pending:
                self._enter_chunk(group, u, s, False, timings)

    def _iter_carry_scores(self, slots, qlen_pad, kind):
        """Walk the carry series, yielding (unit_ids, device scores
        [nslots, n]) per chunk as each chunk's sequences end.

        Consumers delay the host sync (np.asarray) by a chunk window so
        kernel dispatches overlap with hit entry."""
        if self._giant_ids.size == 0:
            return
        import jax.numpy as jnp

        from .ops.sw_stream import (build_matrix8, build_matrix_wide,
                                    build_qcodes, gather_scores,
                                    make_stream_state, make_stream_state_lax,
                                    make_stream_state_long,
                                    sw_scores_stream_carry,
                                    sw_scores_stream_carry_long,
                                    sw_scores_stream_lax_carry)
        p = self.params
        stream_kind = (kind in ("stream", "stream_interpret")
                       and self.matrix.fits_int8)
        interpret = kind == "stream_interpret"
        # chromosome-scale units normally score via exact overlapped
        # segmentation on the full-occupancy stream kernel (a positive-
        # score local alignment has bounded db-span, so a piece overlap
        # of that bound makes max-over-pieces exact); pathological
        # scoring parameters (huge maxS/R) blow the bound up, in which
        # case a FEW giants go to the wavefront kernel (intra-pair
        # parallelism) and many giants lane-pack into the carry series
        if stream_kind and qlen_pad <= 1024:
            V = self._overlap_bound(qlen_pad)
            if self.SEGMENT_GIANTS and V <= self._max_cols // 2:
                yield from self._iter_segmented_giants(
                    slots, qlen_pad, V, interpret)
                return
            if len(self._giant_ids) <= self.WAVEFRONT_MAX_GIANTS:
                yield from self._iter_wavefront_scores(slots, qlen_pad,
                                                       interpret)
                return
        # queries within one VMEM tile run the plain carry kernel;
        # longer ones the tiled-carry variant (512-row tile passes with
        # inter-tile boundary planes per chunk); non-int8 matrices and
        # non-stream backends use the lax twin
        mode = ("pallas" if stream_kind and qlen_pad <= 1024 else
                "pallas_long" if stream_kind else "lax")
        # chunks come back compact (only the lanes that hold data); the
        # pallas wrappers PAD-expand to their 1024-lane minimum on
        # device, the lax twin runs at the compact width directly
        chunks = self._carry_chunks(1024)
        if not chunks:
            return
        nseqs = 1024 if mode != "lax" else chunks[0].nseqs
        if mode == "pallas_long":
            qlen_pad = round_up(qlen_pad, 512)
        qc, ql = build_qcodes([s[3] for s in slots], qlen_pad)
        qc, ql = jnp.asarray(qc), jnp.asarray(ql)
        if self.matrix.fits_int8:
            mat = jnp.asarray(build_matrix8(self.matrix.matrix))
        else:
            mat = jnp.asarray(build_matrix_wide(self.matrix.matrix))
        nq = len(slots)
        if mode == "pallas":
            h, e, s = make_stream_state(nq, qlen_pad, nseqs)
        elif mode == "pallas_long":
            h, e, s, bh0c = make_stream_state_long(nq, qlen_pad, nseqs)
        else:
            h, e, s = make_stream_state_lax(nq, qlen_pad, nseqs)
        for ch in chunks:
            data = jnp.asarray(ch.data_t).T
            startd = jnp.asarray(ch.start)
            if mode == "pallas":
                out, h, e, s = sw_scores_stream_carry(
                    qc, ql, mat, data, startd, h, e, s,
                    gapopenextend=p.gapopenextend, gapextend=p.gapextend,
                    interpret=interpret)
            elif mode == "pallas_long":
                out, h, e, s, bh0c = sw_scores_stream_carry_long(
                    qc, ql, mat, data, startd, h, e, s, bh0c,
                    gapopenextend=p.gapopenextend, gapextend=p.gapextend,
                    interpret=interpret)
            else:
                out, h, e, s = sw_scores_stream_lax_carry(
                    qc, ql, mat, data, startd, h, e, s,
                    gapopenextend=p.gapopenextend, gapextend=p.gapextend)
            if len(ch.seqnos):
                sc = gather_scores(out, jnp.asarray(ch.end_block),
                                   jnp.asarray(ch.lane))
                yield ch.seqnos, sc

    # giants at or below this count score via the wavefront kernel; above
    # it they lane-pack into the carry series (which amortizes once
    # enough giants keep its 1024 lanes busy).  Only reached when the
    # segmentation overlap bound is pathological (huge maxS/gapextend).
    WAVEFRONT_MAX_GIANTS = 64
    SEGMENT_GIANTS = True      # tests pin the carry/wavefront routes off this

    def _overlap_bound(self, qlen_pad: int) -> int:
        """Upper bound on the db-span of any positive-score local
        alignment (ops.align_hint._span_bound — shared with the
        segmented hint pass and the hinted align window).  Pieces of a
        giant sequence cut with this much overlap contain every scoring
        alignment whole, so max-over-pieces is EXACT.  All-negative
        matrices admit no positive alignment at all (any overlap is
        exact); free gap extension makes the span unbounded — return a
        bound the `V <= max_cols // 2` gate always rejects, routing
        giants to the carry/wavefront paths instead."""
        from .ops.align_hint import _span_bound
        maxS = int(self.matrix.matrix.max())
        if maxS <= 0:
            return qlen_pad
        V = _span_bound(qlen_pad, maxS, self.params.gapextend)
        return (1 << 62) if V is None else V

    def _iter_segmented_giants(self, slots, qlen_pad, V, interpret):
        """Score giant units via overlapped segmentation on the stream
        kernel: pieces of stride S and length S + V lane-pack at full
        occupancy (the reference's channel machine has no equivalent —
        its chromosome throughput is one SSE lane); a unit's score is
        the max over its pieces, exact by the _overlap_bound argument."""
        import jax.numpy as jnp

        from .ops.sw_stream import (build_matrix8, build_qcodes,
                                    gather_scores, sw_scores_stream)
        p = self.params
        nseqs = 2048 if qlen_pad <= dict(self.STREAM_CONFIGS)[2048] \
            else 1024
        owner, dev_chunks = self._seg_giant_chunks(nseqs, V)
        qc, ql = build_qcodes([s[3] for s in slots], qlen_pad)
        qc, ql = jnp.asarray(qc), jnp.asarray(ql)
        m8 = jnp.asarray(build_matrix8(self.matrix.matrix))
        best = np.zeros((len(slots), len(self._giant_ids)), dtype=np.int64)
        pending = []

        def fold(item):
            snos, sc = item
            sc = np.asarray(sc)
            np.maximum.at(best, (slice(None), owner[snos]), sc)

        for data, start, end_block, lane, snos in dev_chunks:
            out = sw_scores_stream(qc, ql, m8, data, start,
                                   gapopenextend=p.gapopenextend,
                                   gapextend=p.gapextend,
                                   interpret=interpret)
            sc = gather_scores(out, end_block, lane)
            pending.append((snos, sc))
            if len(pending) >= self.CHUNK_WINDOW:
                fold(pending.pop(0))
        for item in pending:
            fold(item)
        yield self._giant_ids, best

    def _seg_giant_chunks(self, nseqs: int, V: int):
        """Owner map + device arrays of the giant-piece pack, cached per
        (nseqs, V): slot groups and repeated queries re-walk the same
        pieces, and re-slicing + re-uploading a genome-scale pack per
        group would dominate wall clock (cf. _dev_stream_chunks)."""
        import jax.numpy as jnp

        from .batching import pack_stream
        key = (nseqs, V)
        if key not in self._seg_packs:
            # stride adapts to the giant payload so mid-size genomes
            # still fill the lanes (a few long pieces would idle most of
            # them); piece length S+V always fits one chunk
            total = sum(len(s) for s in self._giant_seqs)
            S = max(total // (4 * nseqs), V, 1024)
            S = min(S, self._max_cols - V)
            pieces, owner = [], []
            for gi, seq in enumerate(self._giant_seqs):
                for pos in range(0, max(len(seq) - V, 1), S):
                    pieces.append(seq[pos: pos + S + V])
                    owner.append(gi)
            self._seg_packs[key] = (
                np.asarray(owner, dtype=np.int64),
                pack_stream(pieces, nseqs=nseqs, max_cols=self._max_cols,
                            seqnos=np.arange(len(pieces), dtype=np.int64)))
        owner, chunks = self._seg_packs[key]

        def prep(ch):
            # lane-major upload + device transpose (host transposes of
            # multi-hundred-MB chunks are the slow part; cf.
            # _dev_stream_chunks)
            return (jnp.asarray(ch.data_t).T, jnp.asarray(ch.start),
                    jnp.asarray(ch.end_block), jnp.asarray(ch.lane),
                    ch.seqnos)

        # share the device-cache budget with _dev_stream_chunks AND the
        # giant-piece packs already cached under other (nseqs, V) keys
        # (all hold HBM-resident int8 packs for the engine's lifetime)
        cached = sum(sum(c.data_t.size for c in self._stream_packs[k])
                     for k in self._dev_stream if k in self._stream_packs)
        cached += sum(sum(c.data_t.size for c in self._seg_packs[k][1])
                      for k in self._dev_seg if k in self._seg_packs)
        total = sum(c.data_t.size for c in chunks)
        if key in self._dev_seg or \
                cached + total <= self.DEVICE_CACHE_BYTES:
            if key not in self._dev_seg:
                self._dev_seg[key] = [prep(c) for c in chunks]
            return owner, self._dev_seg[key]
        return owner, (prep(c) for c in chunks)

    def _iter_wavefront_scores(self, slots, qlen_pad, interpret):
        """Score each giant unit with the anti-diagonal wavefront kernel
        (ops.sw_wavefront): full-width VPU steps on ONE (query, sequence)
        pair, streamed through fixed-width segments."""
        import jax.numpy as jnp

        from .ops.sw_stream import build_matrix8, build_qcodes
        from .ops.sw_wavefront import build_mq, sw_wavefront_scores
        p = self.params
        qc, _ = build_qcodes([s[3] for s in slots], qlen_pad)
        mq = jnp.asarray(build_mq(qc, build_matrix8(self.matrix.matrix)))
        for gid, seq in zip(self._giant_ids, self._giant_seqs):
            sc = sw_wavefront_scores(
                mq, seq, gapopenextend=p.gapopenextend,
                gapextend=p.gapextend, interpret=interpret)
            yield np.array([gid], dtype=np.int64), sc[:, None]

    def _enter_chunk(self, slots, units, payload, reduced, timings):
        if reduced:
            vals, idx, totalh, obvious, n16, n63 = map(np.asarray, payload)
            for fi, (hits, qstrand, qframe, _) in enumerate(slots):
                # drop upper-cutoff-masked slots (-1, below any SW score)
                sel = vals[fi] >= 0
                meta = self.unit_meta[units[idx[fi][sel]]]
                hits.enter_batch(meta[:, 0], vals[fi][sel], qstrand, qframe,
                                 meta[:, 1], meta[:, 2],
                                 counts=(int(totalh[fi]), int(obvious[fi])))
            if timings is not None:
                timings.compute[7] += units.shape[0] * len(slots)
                timings.compute[16] += int(n16)
                timings.compute[63] += int(n63)
                timings.rounds[7] += len(slots)
                if int(n16):
                    timings.rounds[16] += len(slots)
                if int(n63):
                    timings.rounds[63] += len(slots)
        else:
            # [NSLOTS_PAD, n_chunk_units]: drop dead padding rows (their
            # zero scores would inflate the exact compute7 counter)
            sc = np.asarray(payload)[:len(slots)]
            meta = self.unit_meta[units]
            for fi, (hits, qstrand, qframe, _) in enumerate(slots):
                hits.enter_batch(meta[:, 0], sc[fi], qstrand, qframe,
                                 meta[:, 1], meta[:, 2])
            self._count_tiers(timings, sc, len(slots))

    def _search_segments(self, slots, max_qlen, timings, scores_fn, chunks):
        """Score all (hitlist, strand, frame) slots with a segment-packed
        kernel (lax/tiled/v1)."""
        import jax.numpy as jnp

        p = self.params
        qlen_pad = max(64, -(-max_qlen // 64) * 64)
        dtype = np.int8 if self.matrix.fits_int8 else np.int32
        qpt = jnp.asarray(build_qpt([s[3] for s in slots],
                                    self.matrix.matrix, qlen_pad,
                                    dtype=dtype))
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
            for fi, (hits, qstrand, qframe, _) in enumerate(slots):
                flat = out[fi].reshape(-1)[valid]
                flats.append(flat)
                hits.enter_batch(meta[:, 0], flat, qstrand, qframe,
                                 meta[:, 1], meta[:, 2])
            self._count_tiers(timings, np.stack(flats), len(slots))
        self._score_carry_series(slots, qlen_pad, timings, kind="lax")
