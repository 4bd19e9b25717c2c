"""Attribute the cold first-search wall: JAX lowering vs XLA compile.

probe_cold.py measured a 239 s cold single-query search of which the
recorded XLA compilation was only 7.7 s — the rest is host-side work
between trace and compile.  This probe times the stages of the
production flow walk separately on the real backend:

  trace   jax.jit(walk).trace(*args)        (jaxpr)
  lower   traced.lower()                    (StableHLO + Mosaic serialization)
  compile lowered.compile()                 (backend / tunnel compile)

and repeats `lower` for a single standalone kernel at each distinct
chunk shape, to see whether the cost is per-instance and whether
same-shape instances dedup.
"""

import io
import json
import os
import sys
import tempfile
import time

os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="swipe_lower_probe_")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench_corpus import swissprot_fasta, swissprot_letters
    from swipe_tpu.io.db import FastaDatabase
    from swipe_tpu.io.fasta import preprocess_query
    from swipe_tpu.pipeline import SearchEngine, SearchParams

    rng = np.random.default_rng(0)
    db = FastaDatabase(io.StringIO(swissprot_fasta(10_000, rng)), "aa",
                       title="lowerprobe")
    q = preprocess_query("q", swissprot_letters(200, rng), 1, 3)
    eng = SearchEngine(db, SearchParams(symtype=1, gapopen=11, gapextend=1,
                                        alignments=0, descriptions=100))

    # reproduce exactly what _search_stream does for this query to get
    # the walk callable + args without dispatching it
    nseqs = 2048
    chunks = list(eng._dev_flow_chunks(nseqs))
    print(f"flow series: {len(chunks)} chunks, shapes "
          f"{[tuple(c[0].shape) for c in chunks]}", file=sys.stderr)

    from swipe_tpu.ops.sw_stream import build_matrix8, build_qcodes
    m8 = jnp.asarray(build_matrix8(eng.matrix.matrix))
    qc, ql = build_qcodes([q.frames()[0][2]], 256)
    qc, ql = jnp.asarray(qc), jnp.asarray(ql)

    kbase = 164                 # keephits 100 + 64, the production value
    walk = eng._flow_walk(nseqs, 1, 256, kbase, False, use_dprof="i32")
    chunk_arg = tuple((d, st, src, eb, ln, ud)
                      for d, st, src, eb, ln, _u, _w, ud in chunks)
    args = (qc, ql, m8, jnp.asarray([0], jnp.int32),
            jnp.asarray([1 << 30], jnp.int32), chunk_arg)

    t0 = time.time()
    traced = walk.trace(*args)
    t_trace = time.time() - t0
    t0 = time.time()
    lowered = traced.lower()
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(json.dumps({"trace_s": round(t_trace, 2),
                      "lower_s": round(t_lower, 2),
                      "compile_s": round(t_compile, 2),
                      "n_chunks": len(chunks)}))
    del compiled


if __name__ == "__main__":
    main()
