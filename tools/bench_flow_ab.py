"""In-process A/B of config-1 flow-series schedules (run on real TPU).

The tunnel/chip clock state drifts between processes (BASELINE.md's
variance story), so packing-schedule candidates must be compared inside
ONE process with interleaved trials.  Each variant is a full config-1
rep (one query, whole flow series + drains, device top-100) timed by the
slope method; trials alternate A/B/A/B so clock drift cancels.

Usage: python tools/bench_flow_ab.py [nseqs ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R_SMALL, R_BIG, TRIALS = 2, 8, 3


def build_variant(seqs, lens, nseqs, mc, drain_cols, oneshot, queries,
                  qlen_pad, use_dprof=False):
    import jax
    import jax.numpy as jnp

    from swipe_tpu.batching import pack_stream_flow
    from swipe_tpu.matrices import ScoreMatrix
    from swipe_tpu.ops.sw_stream import (build_dprofile_series,
                                         build_matrix8, gather_scores,
                                         make_stream_state,
                                         permute_stream_state,
                                         sw_scores_stream_carry)
    m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    m8 = jnp.asarray(build_matrix8(m.matrix))
    chunks = pack_stream_flow(seqs, nseqs=nseqs, max_cols=mc,
                              drain_cols=drain_cols, oneshot_drain=oneshot)
    shape = [(c.data_t.shape, c.residues) for c in chunks]
    dev = [(jnp.asarray(c.data_t).T, jnp.asarray(c.start),
            jnp.asarray(c.end_block), jnp.asarray(c.lane),
            jnp.asarray(c.carry_src), c.nseqs, len(c.seqnos))
           for c in chunks]
    # db-only precompute, shared by every rep (see build_dprofile_series).
    # The profiles are PASSED into the jit (a closed-over 700+ MB array
    # is embedded into the HLO as a constant — the remote compile helper
    # rejects the request with HTTP 413).
    dprofs = tuple(jax.block_until_ready(build_dprofile_series(m8, d))
                   for (d, *_r) in dev) if use_dprof else \
        tuple(None for _ in dev)

    def rep_scores(qc, ql, dps):
        parts = []
        h = e = s = None
        for i, (d, st, eb, ln, src, w, nend) in enumerate(dev):
            if i == 0:
                h, e, s = make_stream_state(1, qlen_pad, w)
            else:
                h, e, s = permute_stream_state(h, e, s, src)
            out, h, e, s = sw_scores_stream_carry(
                qc, ql, m8, d, st, h, e, s, gapopenextend=12, gapextend=1,
                dprof=dps[i])
            if nend:
                parts.append(gather_scores(out, eb, ln))
        return jnp.concatenate(parts, axis=1).reshape(-1)

    @jax.jit
    def chain_impl(qcs, qls, dps):
        def body(_, xs):
            qc, ql = xs
            return 0, jax.lax.top_k(rep_scores(qc, ql, dps), 100)[0]
        _, tops = jax.lax.scan(body, 0, (qcs, qls))
        return jax.lax.top_k(tops.reshape(-1), 100)[0]

    def chain(qcs, qls):
        return chain_impl(qcs, qls, dprofs)

    return chain, shape


def main():
    from swipe_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from bench_corpus import (swissprot_lengths, swissprot_query,
                              swissprot_seqs)
    from swipe_tpu.ops.sw_stream import build_qcodes

    rng = np.random.default_rng(0)
    lens = swissprot_lengths(10_000, rng)
    seqs = swissprot_seqs(10_000, rng, lens)
    total = int(lens.sum())
    qlen, qlen_pad = 200, 256
    cells = qlen * total
    nq = 2 * TRIALS * (R_SMALL + R_BIG) + 2 * R_BIG
    queries = [swissprot_query(qlen, rng) for _ in range(nq)]
    qstacks = [tuple(map(jnp.asarray, build_qcodes([q], qlen_pad)))
               for q in queries]

    mean_lane = total // 2048
    mc0 = max((mean_lane // 2 + 64) // 128 * 128, 256)
    variants = {
        "oneshot mc/2": (2048, mc0, 128, True, False),
        "oneshot+dprof mc/2": (2048, mc0, 128, True, True),
        "oneshot+dprof mc768": (2048, 768, 128, True, True),
        "oneshot+dprof mc1152": (2048, 1152, 128, True, True),
    }
    chains = {}
    for name, (ns, mc, dc, oneshot, dp) in variants.items():
        chain, shape = build_variant(seqs, lens, ns, mc, dc, oneshot,
                                     queries, qlen_pad, use_dprof=dp)
        foot = sum(w * c for (w, c), _ in shape)
        print(f"{name}: chunks={[s for s, _ in shape]} occ={total/foot:.3f}",
              flush=True)
        chains[name] = chain

    def stack(qlist):
        return (jnp.stack([q[0] for q in qlist]),
                jnp.stack([q[1] for q in qlist]))

    for q in qstacks:
        jax.block_until_ready(q)
    # warm both shapes of every variant
    for name, chain in chains.items():
        np.asarray(chain(*stack(qstacks[:R_SMALL])))
        np.asarray(chain(*stack(qstacks[-R_BIG:])))
        print(f"warmed {name}", flush=True)

    walls = {n: {R_SMALL: [], R_BIG: []} for n in chains}
    pos = 0
    for t in range(TRIALS):
        for name, chain in chains.items():
            for r in (R_SMALL, R_BIG):
                qs = stack(qstacks[pos:pos + r])
                pos = (pos + r) % (len(qstacks) - R_BIG)
                t0 = time.time()
                np.asarray(chain(*qs))
                walls[name][r].append(time.time() - t0)
    for name in chains:
        w = walls[name]
        t_rep = (min(w[R_BIG]) - min(w[R_SMALL])) / (R_BIG - R_SMALL)
        print(f"{name}: {cells / t_rep / 1e9:7.1f} GCUPS  "
              f"walls small {['%.4f' % x for x in w[R_SMALL]]} "
              f"big {['%.4f' % x for x in w[R_BIG]]}")


if __name__ == "__main__":
    main()
