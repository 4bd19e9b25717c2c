"""One cfg-1 single-query search, end-to-end, in a fresh process.

bench.py runs this twice: the FIRST run (driver rounds start with a
cold persistent compile cache) measures the true cold-start wall a
first-time user pays — engine build, trace+lower, remote backend
compile, profile build, search, align; the SECOND run measures a fresh
process against the now-warm on-disk cache (the `--prime`d steady
state).  Prints one JSON line on stdout.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from swipe_tpu import native
    from swipe_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    native.tune_malloc()

    import io

    from bench_corpus import swissprot_fasta, swissprot_letters
    from swipe_tpu.io.db import FastaDatabase
    from swipe_tpu.io.fasta import preprocess_query
    from swipe_tpu.pipeline import SearchEngine, SearchParams

    rng = np.random.default_rng(0)
    t0 = time.time()
    db = FastaDatabase(io.StringIO(swissprot_fasta(10_000, rng)), "aa",
                       title="coldchild")
    q = preprocess_query("q", swissprot_letters(200, rng), 1, 3)
    t_db = time.time() - t0
    t0 = time.time()
    eng = SearchEngine(db, SearchParams(symtype=1, gapopen=11, gapextend=1,
                                        alignments=100, descriptions=100))
    t_eng = time.time() - t0
    t0 = time.time()
    hits = eng.search(q)
    t_search = time.time() - t0
    assert hits.count > 0 and hits.hits[0].alignment
    t0 = time.time()
    eng.search(q)
    t_repeat = time.time() - t0
    walks = getattr(eng, "_flow_walk_cache", {})
    print(json.dumps({
        "db_build_s": round(t_db, 2),
        "engine_s": round(t_eng, 2),
        "search_s": round(t_search, 2),
        "repeat_search_s": round(t_repeat, 3),
        "walk_shape_classes": len(walks),
    }))


if __name__ == "__main__":
    main()
