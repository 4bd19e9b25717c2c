"""A/B: qgroup pairing x streamed dprofiles in the GROUPED stream kernel.

The config-4 batch path (pipeline._stream_walk -> sw_scores_stream) ran
round 3 at 287 GCUPS with INLINE-built profiles + member pairing, and
within ~4% of that with STREAMED profiles + qgroup=1 (pairing no longer
fit VMEM beside the int32 profile buffers).  int16 profiles halve the
buffers, letting qgroup=2 (minter=2) compose with streaming — this tool
measures whether the composition actually pays on the cfg4 shape
(16 x 200aa batch, 2048-lane LPT chunk), with slope timing over two
batch sizes inside single dispatches.

Usage: python tools/bench_pair_grouped.py [config ...]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

NQ_SMALL = 8
NQ_BIG = 32
TRIALS = 3
NSEQS = 2048
MAX_COLS = 8192


def main(only=None):
    from swipe_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from bench_corpus import (swissprot_lengths, swissprot_query,
                              swissprot_seqs)
    from swipe_tpu.batching import pack_stream
    from swipe_tpu.matrices import ScoreMatrix
    from swipe_tpu.ops.sw_stream import (build_dprofile_series,
                                         build_matrix8, build_qcodes,
                                         gather_scores, sw_scores_stream)

    rng = np.random.default_rng(0)
    m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    # cfg4 regime: mean lane load >> longest member, so plain LPT packs
    # densely (clip the tail like a large database does naturally)
    lens = np.minimum(swissprot_lengths(60_000, rng), 2000)
    seqs = swissprot_seqs(60_000, rng, lens)
    chunks = pack_stream(seqs, nseqs=NSEQS, max_cols=MAX_COLS)
    chunks = chunks[:2]
    occ = sum(c.residues for c in chunks) / sum(c.data_t.size
                                                for c in chunks)
    res = sum(c.residues for c in chunks)
    print(f"# chunks: {[(c.nseqs, c.n_cols) for c in chunks]} "
          f"occ={occ:.3f}", file=sys.stderr)
    m8 = jnp.asarray(build_matrix8(m.matrix))
    dev = [(jnp.asarray(c.data_t).T, jnp.asarray(c.start),
            jnp.asarray(c.end_block), jnp.asarray(c.lane))
           for c in chunks]

    nquery = 2 * (NQ_SMALL + NQ_BIG) * (TRIALS + 1)

    def qbatch(qlen, qlen_pad):
        queries = [swissprot_query(qlen, rng) for _ in range(nquery)]
        qstacks = [build_qcodes([q], qlen_pad) for q in queries]
        return (jnp.asarray(np.concatenate([qc for qc, _ in qstacks])),
                jnp.asarray(np.concatenate([ql for _, ql in qstacks])))

    qsets = {}

    def make_walk(qgroup, dt):
        # profiles are jit ARGUMENTS (closed-over arrays embed in the
        # HLO and overflow the remote compile request — CLAUDE.md)
        dps = tuple(jax.block_until_ready(
            build_dprofile_series(m8, d, dtype=dt)) if dt else None
            for (d, *_r) in dev)
        has_dp = dt is not None

        @jax.jit
        def walk_impl(qc, ql, dps_arg):
            acc = jnp.zeros((qc.shape[0],), jnp.int32)
            for i, (d, st, eb, ln) in enumerate(dev):
                out = sw_scores_stream(
                    qc, ql, m8, d, st, gapopenextend=12, gapextend=1,
                    qgroup=qgroup, dprof=dps_arg[i] if has_dp else None)
                acc = acc + gather_scores(out, eb, ln).max(axis=1)
            return acc

        def walk(qc, ql):
            return walk_impl(qc, ql, dps if has_dp else ())
        return walk

    # (qgroup, dprof dtype | None for inline, qlen, qlen_pad)
    CONFIGS = {
        "g1_i32":    (1, jnp.int32, 200, 256),  # round-3 prod (dprof mode)
        "g2_i16":    (2, jnp.int16, 200, 256),  # pairing x streamed
        "g1_i16":    (1, jnp.int16, 200, 256),  # isolates int16 penalty
        "g2_inline": (2, None, 200, 256),       # round-3 pre-dprof prod
        # cfg3 shape (512-row blastn-scale queries): streamed int16
        # profiles newly FIT beside the 512-row state (int32 did not)
        "q512_inline": (1, None, 500, 512),     # round-3 cfg3 route
        "q512_i16":    (1, jnp.int16, 500, 512),
    }

    pos = [0]

    def take(n):
        a, b = pos[0], pos[0] + n
        pos[0] = b
        return qc_all[a:b], ql_all[a:b]

    for name, (qgroup, dt, qlen, qlen_pad) in CONFIGS.items():
        if only and name not in only:
            continue
        try:
            if (qlen, qlen_pad) not in qsets:
                qsets[(qlen, qlen_pad)] = qbatch(qlen, qlen_pad)
            qc_all, ql_all = qsets[(qlen, qlen_pad)]
            cells = qlen * res
            walk = make_walk(qgroup, dt)
            t0 = time.time()
            np.asarray(walk(*take(NQ_SMALL)))
            np.asarray(walk(*take(NQ_BIG)))
            warm = time.time() - t0
            walls = {NQ_SMALL: [], NQ_BIG: []}
            for _ in range(TRIALS):
                for nq in (NQ_SMALL, NQ_BIG):
                    qs = take(nq)
                    t0 = time.time()
                    np.asarray(walk(*qs))
                    walls[nq].append(time.time() - t0)
            t_q = (min(walls[NQ_BIG]) - min(walls[NQ_SMALL])) \
                / (NQ_BIG - NQ_SMALL)
            print(json.dumps({
                "config": name, "qgroup": qgroup, "qlen": qlen,
                "dprof": str(np.dtype(dt)) if dt else "inline",
                "ms_per_query": round(t_q * 1e3, 3),
                "gcups": round(cells / max(t_q, 1e-9) / 1e9, 1),
                "occ": round(occ, 3), "warm_wall_s": round(warm, 1),
            }), flush=True)
        except Exception as exc:  # noqa: BLE001 — survey tool
            print(json.dumps({
                "config": name,
                "error": f"{type(exc).__name__}: {str(exc)[:300]}",
            }), flush=True)
        pos[0] = 0


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
