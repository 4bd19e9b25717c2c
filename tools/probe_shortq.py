"""Short-query fixed-cost re-attribution with STREAMED profiles (r4 item 4).

The BASELINE MFU table (round 3, inline profile builds) pinned qlen 104
at ~56% and qlen 200 at ~75% of the issue ceiling, blaming a ~10 us
per-(query, block) fixed cost.  Streamed profiles removed the dprofile
build from that cost; this probe re-measures the sweep under streamed
profiles and tests the candidate lever: qgroup>1 at short qlen (queries
share each block's grid step).

Measurement protocol (the only one that survives this tunnel, see
CLAUDE.md): ALL reps ride inside ONE jitted dispatch (lax.scan over
query batches), the slope of two chain lengths cancels the fixed
dispatch+sync cost, minimum wall of three trials per length absorbs
one-sided tunnel stalls, and configs rotate A/B/.../A/B inside one
process so chip-clock drift cannot masquerade as a config effect.
Separate-dispatch timing (this tool's first version) produced negative
slopes and 3x run-to-run swings on the same config — do not regress to
it.

Usage: python tools/probe_shortq.py [--trials N]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

NQ = 8          # queries per scanned batch
R_SMALL = 2     # chain lengths (batches per dispatch)
R_BIG = 8
TRIALS = 3
NSEQS = 2048


def main():
    trials = TRIALS
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    from swipe_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from bench_corpus import swissprot_query
    from swipe_tpu.batching import pack_stream
    from swipe_tpu.matrices import ScoreMatrix
    from swipe_tpu.ops import sw_stream
    from swipe_tpu.ops.sw_stream import (build_dprofile_series,
                                         build_matrix8, build_qcodes,
                                         gather_scores, sw_scores_stream)

    rng = np.random.default_rng(0)
    m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    # the round-3 MFU-table corpus: lognormal lengths, ~3.6M residues
    lens = np.clip(rng.lognormal(5.8, 0.5, 10_000).astype(int), 20, 3000)
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8) for L in lens]
    chunks = pack_stream(seqs, nseqs=NSEQS, max_cols=65536,
                         block=sw_stream.KSEG)
    res = int(lens.sum())
    nblocks = sum(c.data_t.shape[1] // sw_stream.KSEG for c in chunks)
    m8 = jnp.asarray(build_matrix8(m.matrix))
    dev = [(jnp.asarray(c.data_t).T, jnp.asarray(c.start),
            jnp.asarray(c.end_block), jnp.asarray(c.lane))
           for c in chunks]
    print(f"# chunks={[(c.nseqs, c.n_cols) for c in chunks]} "
          f"residues={res} blocks={nblocks}", file=sys.stderr)

    dprofs = {}
    for dt in (jnp.int32, jnp.int16):
        dprofs[dt] = tuple(
            jax.block_until_ready(build_dprofile_series(m8, d, dtype=dt))
            for (d, *_r) in dev)

    dev_arg = tuple(dev)

    def make_chain(qgroup, dt):
        # every device buffer rides as an ARGUMENT (a closed-over
        # jax.Array embeds in the lowered module as a constant —
        # CLAUDE.md; the round-4 cold-start wall)
        @jax.jit
        def chain_impl(qcs, qls, chunks, dps):
            def body(_, xs):
                qc, ql = xs
                acc = jnp.zeros((qc.shape[0],), jnp.int32)
                for i, (d, st, eb, ln) in enumerate(chunks):
                    out = sw_scores_stream(
                        qc, ql, m8, d, st, gapopenextend=12, gapextend=1,
                        qgroup=qgroup, dprof=dps[i])
                    acc = acc + gather_scores(out, eb, ln).max(axis=1)
                return 0, acc
            _, accs = jax.lax.scan(body, 0, (qcs, qls))
            return accs

        def chain(qcs, qls):
            return chain_impl(qcs, qls, dev_arg, dprofs[dt])
        return chain

    # (name, qlen, qgroup, dtype) — VMEM row budget: qgroup * qlen_pad
    # within STREAM_ROWS_DPROF (~288 rows, int32) / _I16 (512 rows) at
    # 2048 lanes; q200_g2_i32 (512 rows + int32) measured over-VMEM
    CONFIGS = [
        ("q104_g1_i32", 104, 1, jnp.int32),
        ("q104_g2_i16", 104, 2, jnp.int16),
        ("q104_g1_i16", 104, 1, jnp.int16),
        ("q200_g1_i32", 200, 1, jnp.int32),
        ("q200_g2_i16", 200, 2, jnp.int16),
        ("q384_g1_i32", 384, 1, jnp.int32),
    ]

    # one DISJOINT query pool per config: a repeated identical dispatch
    # can be memoized by the tunnel and poison the wall
    nreps = (trials + 1) * (R_SMALL + R_BIG)
    qsets, chains = {}, {}
    for name, qlen, qgroup, dt in CONFIGS:
        qlen_pad = -(-qlen // 128) * 128
        qcs, qls = [], []
        for _ in range(nreps):
            qs = [swissprot_query(qlen, rng) for _ in range(NQ)]
            qc, ql = build_qcodes(qs, qlen_pad)
            qcs.append(qc)
            qls.append(ql)
        qsets[name] = (jnp.asarray(np.stack(qcs)),
                       jnp.asarray(np.stack(qls)))
        try:
            c = make_chain(qgroup, dt)
            t0 = time.time()
            qcs_d, qls_d = qsets[name]
            np.asarray(c(qcs_d[:R_SMALL], qls_d[:R_SMALL]))
            np.asarray(c(qcs_d[:R_BIG], qls_d[:R_BIG]))
            chains[name] = (c, qlen)
            print(f"# {name} compiled in {time.time() - t0:.1f}s",
                  file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — survey tool
            print(json.dumps({"config": name,
                              "error": f"{type(exc).__name__}: "
                                       f"{str(exc)[:200]}"}), flush=True)

    pos = {name: R_SMALL + R_BIG for name in chains}
    walls = {name: {R_SMALL: [], R_BIG: []} for name in chains}
    for _ in range(trials):
        for name, (c, qlen) in chains.items():
            qcs_d, qls_d = qsets[name]
            a = pos[name]
            for r in (R_SMALL, R_BIG):
                t0 = time.time()
                np.asarray(c(qcs_d[a:a + r], qls_d[a:a + r]))
                walls[name][r].append(time.time() - t0)
                a += r
            pos[name] = a

    fit = []
    for name, qlen, qgroup, dt in CONFIGS:
        if name not in chains:
            continue
        w = walls[name]
        t_batch = (min(w[R_BIG]) - min(w[R_SMALL])) / (R_BIG - R_SMALL)
        t_q = t_batch / NQ
        cells = qlen * res
        gcups = cells / max(t_q, 1e-9) / 1e9
        print(json.dumps({
            "config": name, "qlen": qlen, "qgroup": qgroup,
            "dprof": str(np.dtype(dt)),
            "ms_per_query": round(t_q * 1e3, 3),
            "gcups": round(gcups, 1),
        }), flush=True)
        if qgroup == 1 and dt == jnp.int32:
            fit.append((qlen, t_q))
    if len(fit) >= 2:
        # t_q = per_row_s * qlen + fixed_s; the intercept spread over
        # the blocks is the per-(query, block) grid cost
        A = np.array([[q, 1.0] for q, _ in fit])
        y = np.array([t for _, t in fit])
        per_row, fixed = np.linalg.lstsq(A, y, rcond=None)[0]
        print(json.dumps({
            "fit": "g1_i32", "per_row_us": round(per_row * 1e6, 3),
            "fixed_ms_per_query": round(fixed * 1e3, 3),
            "fixed_us_per_block": round(fixed / nblocks * 1e6, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
