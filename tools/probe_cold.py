"""Cold-start attribution: where do the minutes of a first-run search go?

Runs a BASELINE cfg-1-shaped single-query search end-to-end with a
FRESH (empty) persistent compile cache, logging every XLA compile with
its wall time, then repeats the search warm.  The driver starts every
round with a cold cache, so this wall is what a first-time user (and
the round's own bench warm-up) actually pays; the reference binary
starts instantly (/root/reference/swipe.cc:2507).

Usage: python tools/probe_cold.py [--db N] [--keep-cache DIR]
"""

import io
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_LOG_COMPILES", "1")

_cache = None
for a in sys.argv[1:]:
    if a.startswith("--keep-cache="):
        _cache = a.split("=", 1)[1]
if _cache is None:
    _cache = tempfile.mkdtemp(prefix="swipe_cold_probe_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
print(f"cache dir: {_cache}", file=sys.stderr)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ndb = 10_000
for a in sys.argv[1:]:
    if a.startswith("--db="):
        ndb = int(a.split("=", 1)[1])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import logging
    compiles = []
    t_start = time.time()

    class Cap(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            compiles.append((round(time.time() - t_start, 2), msg[:140]))

    logging.getLogger("jax._src.dispatch").addHandler(Cap())
    logging.getLogger("jax._src.dispatch").setLevel(logging.DEBUG)
    logging.getLogger("jax._src.interpreters.pxla").addHandler(Cap())
    logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.DEBUG)

    from bench_corpus import swissprot_fasta, swissprot_letters
    from swipe_tpu.io.db import FastaDatabase
    from swipe_tpu.io.fasta import preprocess_query
    from swipe_tpu.pipeline import SearchEngine, SearchParams

    rng = np.random.default_rng(0)
    t0 = time.time()
    db = FastaDatabase(io.StringIO(swissprot_fasta(ndb, rng)), "aa",
                       title="coldprobe")
    q = preprocess_query("q", swissprot_letters(200, rng), 1, 3)
    t_db = time.time() - t0

    eng = SearchEngine(db, SearchParams(symtype=1, gapopen=11, gapextend=1,
                                        alignments=100))
    t0 = time.time()
    h1 = eng.search(q)
    t_cold = time.time() - t0
    t0 = time.time()
    h2 = eng.search(q)
    t_warm = time.time() - t0
    assert h1.count > 0 and h2.count == h1.count

    # fresh process against the now-populated cache would measure the
    # primed path; here just report this process's numbers
    print(json.dumps({"db_build_s": round(t_db, 2),
                      "cold_search_s": round(t_cold, 2),
                      "warm_search_s": round(t_warm, 3),
                      "n_compiles": len(compiles)}))
    for t, msg in compiles:
        print(f"  [{t:8.2f}s] {msg}", file=sys.stderr)


if __name__ == "__main__":
    main()
