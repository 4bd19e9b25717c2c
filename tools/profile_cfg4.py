"""Phase-level timing of the config-4 batch search (BASELINE config 4).

Answers "where does cfg4's wall clock go" on the real chip: engine init
(pack), device upload of the packed chunks, per-group kernel walls, and
the host-side drain (hit entry).  Run when the TPU tunnel is up:

    python tools/profile_cfg4.py [nq] [ndb]

Prints one line per phase plus the derived GCUPS so regressions in any
phase are attributable (cf. bench_configs.config4, which only reports
the end-to-end number).
"""

import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AA = list("ARNDCQEGHILKMFPSTWYV")


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ndb = int(sys.argv[2]) if len(sys.argv) > 2 else 570_000

    from swipe_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    from swipe_tpu.io.db import FastaDatabase
    from swipe_tpu.io.fasta import preprocess_query
    from swipe_tpu.pipeline import SearchEngine, SearchParams, SearchTimings

    rng = np.random.default_rng(2)

    def fa(n, lo, hi):
        out = []
        for i in range(n):
            L = int(rng.integers(lo, hi))
            out.append(f">s{i} seq {i}\n" + "".join(rng.choice(AA, L)))
        return "\n".join(out) + "\n"

    t0 = time.time()
    db = FastaDatabase(io.StringIO(fa(ndb, 120, 700)), "aa", title="cfg4")
    t_db = time.time() - t0
    queries = [preprocess_query(f"q{i}", "".join(rng.choice(AA, 200)), 1, 3)
               for i in range(nq)]

    t0 = time.time()
    eng = SearchEngine(db, SearchParams(symtype=1, gapopen=11, gapextend=1,
                                        alignments=0, descriptions=100))
    t_init = time.time() - t0          # includes pack_stream

    # force the device upload + compile outside the timed window, exactly
    # like bench_configs.config4's warm-up, but time it separately
    t0 = time.time()
    eng.search_batch(queries[:16])
    if nq % 16:
        eng.search_batch(queries[:nq % 16])   # tail-group pow2 shape
    t_warm = time.time() - t0

    # timed run with a per-group breakdown: wrap _search_stream_group
    group_walls = []
    orig = eng._search_stream_group

    def timed_group(*a, **kw):
        g0 = time.time()
        r = orig(*a, **kw)
        group_walls.append(time.time() - g0)
        return r

    eng._search_stream_group = timed_group
    t = SearchTimings()
    t0 = time.time()
    eng.search_batch(queries, t)
    wall = time.time() - t0

    work = sum(len(q.aa[0]) for q in queries) * db.symcount_masked()
    print(f"db build        {t_db:8.2f} s   ({ndb} seqs, "
          f"{db.symcount_masked()/1e6:.1f} M residues)")
    print(f"engine init     {t_init:8.2f} s   (pack_stream)")
    print(f"warm-up         {t_warm:8.2f} s   (compile + device upload, "
          f"16-slot group)")
    print(f"timed search    {wall:8.2f} s   -> "
          f"{work/wall/1e9:.1f} GCUPS  (meter: {t.speed/1e9:.1f})")
    print(f"  groups: {len(group_walls)} walls "
          + " ".join(f"{g:.2f}" for g in group_walls))
    other = wall - sum(group_walls)
    print(f"  outside groups  {other:8.2f} s   (evalue models, finalize, "
          f"align_all at -b 0)")


if __name__ == "__main__":
    main()
