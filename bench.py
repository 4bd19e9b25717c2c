"""Benchmark: single-chip Smith-Waterman database-search throughput (GCUPS).

Measurement config 1 of BASELINE.md: ~200aa protein queries, BLOSUM62
gap 11/1, vs a 10k-sequence protein database (Swiss-Prot-fitted length
AND composition statistics), exact int32 scores, top-100 per query.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline compares against the reference's published aggregate
throughput (~106 GCUPS on a dual 6-core Xeon X5650; Rognes 2011, cited
in /root/reference/README:40-41) — the whole-machine number, not
per-core.

What the headline measures (see BASELINE.md "accounting"): MARGINAL
per-query throughput of a query STREAM on a resident, profiled
database —
* the block score profiles depend only on the DATABASE and are built
  once on device (build_dprofile_series; wall and HBM cost reported as
  `profile_build_s` / `profile_hbm_mb` so the amortization is
  auditable), as the reference amortizes dprofile_fill across its SIMD
  channels (/root/reference/search7.cc:50-51);
* a whole query batch rides ONE jitted walk over the flow series
  (drain chunks interleave two stream queries per grid step — the
  round-4 amortization of the drain's mandatory 1024-lane width);
* the timed chain is ONE dispatch; the fixed dispatch+sync cost is
  cancelled exactly by timing two batch sizes and taking the slope:
  t_query = (T_big - T_small) / (R_big - R_small) (the round-3
  methodology; see BASELINE.md "variance");
* distinct queries per rep and per timed call (the tunnel memoizes
  identical dispatches); minimum wall of three trials per size
  (tunnel stalls are one-sided noise).

`pack_occupancy` is the AREA occupancy of the dispatched slots
(residues / lane-columns) — pinned at ~0.73 by the corpus length tail
meeting the kernel's 1024-lane width floor (the lower-bound argument in
BASELINE.md); the drain interleave reduces the WALL those padded slots
cost, which the headline already reflects.
"""

import json
import os
import time

import numpy as np

BASELINE_GCUPS = 106.0  # reference machine aggregate (Rognes 2011)

R_SMALL = 4
R_BIG = 24
TRIALS = 3


def _backend_reachable(timeout: float = 900.0) -> bool:
    """Probe backend init in a CHILD process: when the remote TPU tunnel
    is down, jax.devices() blocks forever inside the plugin (observed:
    >90 min), which would hang the whole bench run.  A child can be
    killed; the parent then reports a parseable failure line instead."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_subbenches(budget_s: float) -> dict:
    """The non-headline BASELINE configs, each in a CHILD process under
    one wall budget (VERDICT r4 item 2: a kernel/align regression in
    cfg-2/3/4, the cold path, or the sharded step must move a
    driver-visible number).  Priority order: the cold/warm cfg-1 pair
    (r4 item 1 — the reference binary starts instantly, swipe.cc:2507),
    then the big-batch configs, then the sharded 1-chip step.

    cold = a fresh process against an EMPTY compile-cache dir (the
    true first-run wall: trace + lower + remote backend compile +
    search + align); warm = a second fresh process against the SAME
    now-populated cache dir (the `--prime`d steady state every later
    process on the machine sees)."""
    import os
    import subprocess
    import sys
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    out = {}
    t_start = time.time()

    def left():
        return budget_s - (time.time() - t_start)

    def run(name, argv, timeout, env_extra=None, multi=False, tries=1):
        # tries>1 retries a failed/hung child once: tunnel stalls are
        # one-sided noise (a warm 10 s child was observed hanging >600 s
        # in one rehearsal while every neighbor ran clean)
        for attempt in range(tries):
            # under ~2 min of budget a config child cannot finish its
            # db build + warm-up — record the skip instead of a doomed
            # truncated attempt that reads as "timeout"
            if left() < 120:
                out[name] = {"skipped": "budget"}
                return
            env = dict(os.environ)
            env.update(env_extra or {})
            try:
                r = subprocess.run(
                    [sys.executable] + argv, cwd=here, env=env,
                    timeout=min(timeout, max(left(), 30)),
                    capture_output=True, text=True)
            except subprocess.TimeoutExpired:
                out[name] = {"error": "timeout"}
                continue
            lines = [ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")]
            if r.returncode != 0 or not lines:
                out[name] = {"error": (r.stderr or r.stdout).strip()[-300:]}
            elif multi:
                for ln in lines:
                    d = json.loads(ln)
                    out[d.pop("metric", name)] = d
                return
            else:
                out[name] = json.loads(lines[-1])
                return

    cachedir = tempfile.mkdtemp(prefix="swipe_cold_cache_")
    try:
        run("cfg1_cold", ["tools/bench_cold_child.py"], 1200,
            {"JAX_COMPILATION_CACHE_DIR": cachedir})
        run("cfg1_warm_process", ["tools/bench_cold_child.py"], 300,
            {"JAX_COMPILATION_CACHE_DIR": cachedir}, tries=2)
    finally:
        # the cold child populates a full multi-MB compile cache here;
        # leaking one per bench run would grow /tmp without bound
        import shutil
        shutil.rmtree(cachedir, ignore_errors=True)
    run("cfg4", ["bench_configs.py", "--full", "--cfg=4"], 1200, multi=True)
    run("cfg3", ["bench_configs.py", "--full", "--cfg=3"], 1200, multi=True)
    run("cfg2", ["bench_configs.py", "--cfg=2"], 900, multi=True)
    run("sharded_1chip", ["bench_scaling.py"], 900)
    out["subbench_wall_s"] = round(time.time() - t_start, 1)
    return out


def main():
    if not _backend_reachable():
        print(json.dumps({
            "metric": "GCUPS_1chip_blastp_10kseq",
            "value": 0.0,
            "unit": "GCUPS",
            "vs_baseline": 0.0,
            "error": "backend unreachable (TPU tunnel down?)",
        }))
        return

    import jax
    import jax.numpy as jnp

    # persistent XLA compile cache: the first stream-kernel compile takes
    # minutes through the remote TPU tunnel; cached reruns start in
    # seconds (same cache the CLI uses)
    from swipe_tpu import native
    from swipe_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    native.tune_malloc()

    from swipe_tpu.batching import pack_database
    from swipe_tpu.matrices import ScoreMatrix
    from swipe_tpu.ops.sw_pallas import build_qpt, sw_scores_lax

    from bench_corpus import swissprot_lengths, swissprot_query, swissprot_seqs

    rng = np.random.default_rng(0)
    m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    # Swiss-Prot-fitted lengths AND residue composition (bench_corpus):
    # BASELINE config 1 names Swiss-Prot; composition affects dprofile
    # statistics, the length tail affects lane occupancy
    lens = swissprot_lengths(10_000, rng)
    seqs = swissprot_seqs(10_000, rng, lens)
    qlen = 200
    # exactly what the run consumes: one warm-up pass + TRIALS timed
    # passes, each drawing R_SMALL + R_BIG distinct queries
    nquery = (TRIALS + 1) * (R_SMALL + R_BIG)
    queries = [swissprot_query(qlen, rng) for _ in range(nquery)]
    cells = qlen * int(lens.sum())

    on_tpu = jax.default_backend() not in ("cpu",)
    extra = {}

    if on_tpu:
        from swipe_tpu.batching import pack_stream_flow
        from swipe_tpu.ops.sw_stream import (build_dprofile_series,
                                             build_matrix8, build_qcodes,
                                             gather_scores,
                                             make_stream_state,
                                             permute_stream_state,
                                             sw_scores_stream_carry)
        m8 = jnp.asarray(build_matrix8(m.matrix))
        # FLOW packing: Swiss-Prot's length tail collapses single-chunk
        # lane packing to ~0.60 occupancy on a 10k-seq database (every
        # lane pads to the tallest); the flow series cuts sequences at
        # chunk capacity and carries H/E/S between launches, keeping the
        # full-width chunks ~99% occupied and retiring the tail chains
        # in one one-shot drain chunk.  max_cols targets the mean lane
        # load so the full-width chunks stay dense.
        mean_lane = int(lens.sum()) // 2048
        mc = max((mean_lane // 2 + 64) // 128 * 128, 256)
        chunks = pack_stream_flow(seqs, nseqs=2048, max_cols=mc,
                                  drain_cols=128)
        dev = [(jnp.asarray(c.data_t).T, jnp.asarray(c.start),
                jnp.asarray(c.end_block), jnp.asarray(c.lane),
                jnp.asarray(c.carry_src), c.nseqs, len(c.seqnos))
               for c in chunks]
        # the block score profiles depend only on the DATABASE: build
        # them once on device (build_dprofile_series) and stream them
        # into every rep's kernel — the inline per-(query, block) build
        # was the kernel's entire fixed cost (182 -> 244 GCUPS measured
        # in-process).  They are jit ARGUMENTS: closed-over arrays embed
        # in the HLO and overflow the remote compile request.  The
        # one-time build cost is reported so the resident-database
        # amortization is auditable.
        t0 = time.time()
        # dispatch every chunk's build, sync once (measured: the ~5 s
        # wall is genuine device build time for the 637 MB series —
        # per-chunk syncs did not add to it)
        dprofs = tuple(build_dprofile_series(m8, d) for (d, *_r) in dev)
        jax.block_until_ready(dprofs)
        extra["profile_build_s"] = round(time.time() - t0, 3)
        extra["profile_hbm_mb"] = round(
            sum(dp.size * dp.dtype.itemsize for dp in dprofs) / 1e6, 1)
        qlen_pad = 256
        qstacks = [build_qcodes([q], qlen_pad) for q in queries]
        qc_all = jnp.asarray(np.concatenate([qc for qc, _ in qstacks]))
        ql_all = jnp.asarray(np.concatenate([ql for _, ql in qstacks]))

        # one timed chain = ONE dispatch: the R-query batch walks the
        # whole flow series (drains interleaved minter=2, series
        # head/tail state DMA elided), top-100 per query on device, one
        # final top-100 across the batch — 100 ints cross the link.
        # EVERY device buffer (chunks AND profiles) rides as an
        # argument: a closed-over jax.Array embeds in the lowered module
        # at a measured ~200 s/MB (the round-4 cold-start wall)
        @jax.jit
        def chain_impl(qc, ql, chunks, dps):
            nq = qc.shape[0]
            h = e = s = None
            tops = None
            for i, (d, st, eb, ln, src) in enumerate(chunks):
                w = d.shape[1]
                if i == 0:
                    h, e, s = make_stream_state(nq, qlen_pad, w)
                else:
                    h, e, s = permute_stream_state(h, e, s, src)
                # drains: two interleaved stream queries per grid step
                # (+ the head/tail DMA trim) — measured +4.8% whole-
                # series in drift-cancelling rotation (round-4 config
                # table, BASELINE.md); deeper interleave regresses
                minter = 2 if (w <= 1024 and nq % 2 == 0) else 1
                out, h, e, s = sw_scores_stream_carry(
                    qc, ql, m8, d, st, h, e, s,
                    gapopenextend=12, gapextend=1, dprof=dps[i],
                    minter=minter, carry_in=i > 0,
                    carry_out=i < len(chunks) - 1)
                if eb.shape[0]:
                    sc = gather_scores(out, eb, ln)
                    part = jax.lax.top_k(sc, min(100, sc.shape[1]))[0]
                    tops = part if tops is None else \
                        jnp.concatenate([tops, part], axis=1)
            return jax.lax.top_k(tops.reshape(-1), 100)[0]

        chunks_arg = tuple((d, st, eb, ln, src)
                           for d, st, eb, ln, src, _w, _n in dev)

        def chain(qc, ql):
            return chain_impl(qc, ql, chunks_arg, dprofs)

        def stack(a, b):
            return qc_all[a:b], ql_all[a:b]

        extra["pack_occupancy"] = round(
            int(lens.sum()) / sum(int(d.size) for (d, *_r) in dev), 4)
    else:
        chunks = pack_database(seqs, nseqs=512)
        dev = [(jnp.asarray(c.data), jnp.asarray(c.seg_ids),
                c.seqnos.shape[0]) for c in chunks]
        qstacks = [(jnp.asarray(build_qpt([q], m.matrix, 256)),
                    jnp.zeros((1,), jnp.int32)) for q in queries]
        qc_all = jnp.stack([q[0] for q in qstacks])
        ql_all = jnp.stack([q[1] for q in qstacks])

        @jax.jit
        def chain(qc, ql):
            def body(_, xs):
                qp, _ql = xs
                sc = jnp.concatenate(
                    [sw_scores_lax(qp, d, s, nsegs=n, gapopenextend=12,
                                   gapextend=1).reshape(1, -1)
                     for d, s, n in dev], axis=1).reshape(-1)
                return 0, jax.lax.top_k(sc, 100)[0]
            _, tops = jax.lax.scan(body, 0, (qc, ql))
            return jax.lax.top_k(tops.reshape(-1), 100)[0]

        def stack(a, b):
            return qc_all[a:b], ql_all[a:b]

    # warm-up compiles + first-dispatch effects for BOTH chain shapes
    pos = 0
    np.asarray(chain(*stack(pos, pos + R_SMALL)))
    pos += R_SMALL
    top = np.asarray(chain(*stack(pos, pos + R_BIG)))
    pos += R_BIG
    assert top[-1] > 0, "top-100 scores must all be positive"

    # slope timing: walls for two batch sizes; the fixed per-dispatch +
    # sync cost cancels in the difference.  Distinct query stacks per
    # trial; minimum wall per size (tunnel stalls are one-sided noise).
    walls = {R_SMALL: [], R_BIG: []}
    for _ in range(TRIALS):
        for r in (R_SMALL, R_BIG):
            qs = stack(pos, pos + r)
            pos += r
            t0 = time.time()
            np.asarray(chain(*qs))
            walls[r].append(time.time() - t0)
    t_rep = (min(walls[R_BIG]) - min(walls[R_SMALL])) / (R_BIG - R_SMALL)
    t_rep = max(t_rep, 1e-9)

    gcups = cells / t_rep / 1e9

    def emit():
        print(json.dumps({
            "metric": "GCUPS_1chip_blastp_10kseq",
            "value": round(gcups, 3),
            "unit": "GCUPS",
            "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
            **extra,
        }), flush=True)

    if on_tpu:
        # the headline prints BEFORE the sub-benches so an external
        # timeout mid-sub-bench still leaves a parseable tail line,
        # then again enriched with the full config set
        emit()
        budget = float(os.environ.get("SWIPE_TPU_BENCH_BUDGET_S", "2400"))
        extra["configs"] = _run_subbenches(budget)
    emit()


if __name__ == "__main__":
    main()
