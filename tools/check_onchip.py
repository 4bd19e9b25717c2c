"""On-chip exactness check: the production TPU kernels vs the NumPy oracle.

The test suite proves kernel LOGIC on CPU (Pallas interpret mode and the
lax twins, tests/conftest.py forces JAX_PLATFORMS=cpu); what it cannot
prove there is the MOSAIC-COMPILED artifact on real hardware — layout
choices, relayouts, DMA semantics and the int16 streamed-profile path
only exist on-chip.  This tool drives ``SearchEngine`` with its
production stream backend through every scoring route on the attached
TPU — plain LPT pack with streamed int32 dprofiles, the flow series
(drain interleave + head/tail DMA trim), the int16 streamed-profile
tier (query rows past STREAM_ROWS_DPROF), the 1024-lane config, the
long-query tiled route, and the chromosome-scale carry/segmentation
route — on random corpora, then byte-compares every returned hit score
against the scalar oracle (``ops.sw_ref.sw_numpy_many`` ==
/root/reference/search63.cc fullsw) and checks the kept set is exactly
the oracle's top-N multiset.

Usage: python tools/check_onchip.py [SEED]   (needs the TPU attached)
Prints one line per route; exits nonzero on any mismatch.
"""

import os
import sys
import io
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AA = list("ARNDCQEGHILKMFPSTWYV")

#        name          nseq   lenrange    qlen  options
CASES = [
    ("plain_q200",     2000, (30, 500),   200, {}),
    ("flow_q120",       800, (50, 2900),  120, {"flow": True}),
    ("i16_dprof_q300", 1200, (30, 500),   300, {}),
    ("lanes1024_q600",  900, (30, 400),   600, {}),
    ("long_q1300",      600, (30, 400),  1300, {}),
    ("giant_carry",      40, (50, 200),    90, {"giant": 30_000}),
    # blastn: nt16 codes + synthesized match/mismatch matrix exercise a
    # different dprofile alphabet slice on-chip (plus strand, so the
    # oracle needs no strand max)
    ("blastn_q500",    1500, (40, 900),   500, {"nt": True}),
    # VMEM-budget boundaries: the exact row caps of the streamed-profile
    # tiers (STREAM_ROWS_DPROF_I16) — the shape class where an over-VMEM
    # kernel kills the remote compile helper (round-4 cfg3 regression)
    ("cap2048_q512",   1200, (30, 500),   512, {}),
    ("cap1024_q1024",   700, (30, 400),  1024, {}),
    # multi-group batch with a pow2 TAIL group (round 5: 18 slots ->
    # 16-slot group + 2-slot tail shape; dead slots skip the row loop
    # but still ride the walk) — every query's hits vs its own oracle
    ("batch18_q150",   1000, (30, 500),   150, {"batch": 18}),
]


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    import jax

    from swipe_tpu import native
    from swipe_tpu.alphabet import MAP_NCBI_AA, MAP_NCBI_NT16, encode
    from swipe_tpu.cli import _enable_compile_cache
    from swipe_tpu.io.db import FastaDatabase
    from swipe_tpu.io.fasta import preprocess_query
    from swipe_tpu.ops.sw_ref import sw_numpy_many
    from swipe_tpu.pipeline import SearchEngine, SearchParams

    if jax.default_backend() == "cpu":
        print("check_onchip: no TPU attached (backend=cpu) — nothing to "
              "check that the test suite doesn't already cover")
        return 0
    _enable_compile_cache()
    native.tune_malloc()

    rng = np.random.default_rng(seed)
    failed = 0
    for name, nseq, (lo, hi), qlen, opt in CASES:
        nt = bool(opt.get("nt"))
        alpha = list("ACGT") if nt else AA
        strs = ["".join(rng.choice(alpha, int(L)))
                for L in rng.integers(lo, hi, size=nseq)]
        if opt.get("giant"):
            strs.append("".join(rng.choice(alpha, opt["giant"])))
        fasta = "".join(f">s{i} c{i}\n{s}\n" for i, s in enumerate(strs))
        db = FastaDatabase(io.StringIO(fasta), "nt" if nt else "aa",
                           title=name)
        if nt:
            params = SearchParams(symtype=0, matchscore=1,
                                  mismatchscore=-3, gapopen=5, gapextend=2,
                                  querystrands=1, descriptions=len(strs),
                                  alignments=0, expect=1e12)
        else:
            params = SearchParams(symtype=1, gapopen=11, gapextend=1,
                                  descriptions=len(strs), alignments=0,
                                  expect=1e12)
        eng = SearchEngine(db, params)          # auto -> stream on TPU
        if opt.get("flow"):
            eng.FLOW_MIN_AVG_LANE = 0           # force the flow series
        nq = int(opt.get("batch", 1))
        qs = [preprocess_query(f"q{k}", "".join(rng.choice(alpha, qlen)),
                               params.symtype, params.querystrands)
              for k in range(nq)]
        t0 = time.time()
        hitlists = eng.search_batch(qs) if nq > 1 else [eng.search(qs[0])]
        wall = time.time() - t0
        cmap = MAP_NCBI_NT16 if nt else MAP_NCBI_AA
        codes = [encode(s, cmap) for s in strs]
        bad, nhits = [], 0
        multiset_ok = True
        for q, hits in zip(qs, hitlists):
            want = sw_numpy_many(q.nt[0] if nt else q.aa[0], codes,
                                 eng.matrix.matrix, params.gapopen,
                                 params.gapextend)
            bad += [(h.seqno, h.score, int(want[h.seqno]))
                    for h in hits.hits if h.score != want[h.seqno]]
            # completeness: the kept scores must be exactly the oracle's
            # top-N multiset (a silently dropped high scorer shows up
            # here even if every reported score is individually correct)
            got_scores = sorted((h.score for h in hits.hits),
                                reverse=True)
            top_oracle = sorted(want, reverse=True)[: len(got_scores)]
            multiset_ok &= got_scores == [int(s) for s in top_oracle]
            nhits += hits.count
        ok = not bad and multiset_ok and nhits > 0
        failed += 0 if ok else 1
        print(f"{name}: {'OK' if ok else 'FAIL'} hits={nhits} "
              f"wall={wall:.2f}s"
              + ("" if not bad else f" first_bad={bad[:3]}")
              + ("" if multiset_ok else " top-N multiset mismatch"))
    print(f"check_onchip: {len(CASES) - failed}/{len(CASES)} routes exact")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
