"""A/B measurement: member-interleaved carry kernel on the config-1 flow series.

Measures marginal per-query wall (slope between two query-stream sizes,
one jitted dispatch each — see CLAUDE.md timing rules) of the full flow
walk (pack_stream_flow chunks + permutes + carry kernel) under different
(minter, dprofile dtype) configurations, on the real chip:

  base      minter=1, int32 profiles  (round-3 production = BENCH_r03)
  i16       minter=1, int16 profiles  (isolates the widen/half-tile cost)
  pair16    minter=2 everywhere, int16 profiles
  pair_mix  minter=2, int16 on 2048-lane chunks / int32 on the 1024 drain
  pair_d4   minter=2 on 2048-lane chunks + minter=4 on the 1024 drain

VMEM-budgeted: minter=2 at 2048 lanes only fits beside STREAMED profiles
when they are int16 (int32 needs ~16.6 MB and is not attempted — an
over-VMEM remote compile can wedge the tunnel, NOTES_ROUND3 §9).

Usage: python tools/bench_pair_carry.py [config ...]
Prints one JSON line per configuration.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

NQ_SMALL = 8
NQ_BIG = 24
TRIALS = 3
QLEN = 200
QLEN_PAD = 256


def main(only=None):
    from swipe_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from bench_corpus import (swissprot_lengths, swissprot_query,
                              swissprot_seqs)
    from swipe_tpu.batching import pack_stream_flow
    from swipe_tpu.matrices import ScoreMatrix
    from swipe_tpu.ops.sw_pallas import PAD_SYMBOL
    from swipe_tpu.ops.sw_stream import (build_dprofile_series,
                                         build_matrix8, build_qcodes,
                                         gather_scores, make_stream_state,
                                         permute_stream_state,
                                         sw_scores_stream_carry)

    rng = np.random.default_rng(0)
    m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    lens = swissprot_lengths(10_000, rng)
    seqs = swissprot_seqs(10_000, rng, lens)
    mean_lane = int(lens.sum()) // 2048
    mc = max((mean_lane // 2 + 64) // 128 * 128, 256)
    chunks = pack_stream_flow(seqs, nseqs=2048, max_cols=mc,
                              drain_cols=128)
    cells = QLEN * int(lens.sum())
    m8 = jnp.asarray(build_matrix8(m.matrix))
    dev = [(jnp.asarray(c.data_t).T, jnp.asarray(c.start),
            jnp.asarray(c.end_block), jnp.asarray(c.lane),
            jnp.asarray(c.carry_src), c.nseqs, len(c.seqnos))
           for c in chunks]
    print(f"# series: {[(c.nseqs, c.n_cols) for c in chunks]}",
          file=sys.stderr)

    nquery = 6 * (NQ_SMALL + NQ_BIG) * (TRIALS + 2)
    queries = [swissprot_query(QLEN, rng) for _ in range(nquery)]
    qstacks = [build_qcodes([q], QLEN_PAD) for q in queries]
    qc_all = jnp.asarray(np.concatenate([qc for qc, _ in qstacks]))
    ql_all = jnp.asarray(np.concatenate([ql for _, ql in qstacks]))

    def dprofs_for(dtypes):
        out = []
        for (d, *_rest), dt in zip(dev, dtypes):
            out.append(jax.block_until_ready(
                build_dprofile_series(m8, d, dtype=dt)))
        return tuple(out)

    def make_walk(minters, rus=None, trim=False):
        """jit walk(qc [NQ, QLEN_PAD], ql [NQ], dprofs) -> [NQ] checksum.
        ``trim`` skips the series-head state load and series-tail state
        store (carry_in/carry_out)."""
        from swipe_tpu.ops.sw_stream import RU
        rus = rus or [RU] * len(dev)

        @jax.jit
        def walk(qc, ql, dps):
            nq = qc.shape[0]
            h = e = s = None
            acc = jnp.zeros((nq,), jnp.int32)
            for i, (d, st, eb, ln, src, w, nend) in enumerate(dev):
                if i == 0:
                    h, e, s = make_stream_state(nq, QLEN_PAD, w)
                else:
                    h, e, s = permute_stream_state(h, e, s, src)
                out, h, e, s = sw_scores_stream_carry(
                    qc, ql, m8, d, st, h, e, s, gapopenextend=12,
                    gapextend=1, dprof=dps[i], minter=minters[i],
                    ru=rus[i], carry_in=not (trim and i == 0),
                    carry_out=not (trim and i == len(dev) - 1))
                if nend:
                    acc = acc + gather_scores(out, eb, ln).max(axis=1)
            return acc
        return walk

    CONFIGS = {
        "base":      ([1, 1, 1, 1], ["i32"] * 4, None),
        "i16":       ([1, 1, 1, 1], ["i16"] * 4, None),
        "pair16":    ([2, 2, 2, 2], ["i16"] * 4, None),
        "pair_mix":  ([2, 2, 2, 2], ["i16", "i16", "i16", "i32"], None),
        "pair_d4":   ([2, 2, 2, 4], ["i16", "i16", "i16", "i32"], None),
        # drain-only interleave: full chunks stay at the untouched base
        # configuration; only the 1024-lane drain (1 vreg = 1 chain)
        # interleaves stream queries
        "drain2":    ([1, 1, 1, 2], ["i32"] * 4, None),
        "drain4":    ([1, 1, 1, 4], ["i32"] * 4, None),
        # register-pressure probe: paired members at ru=2 have the same
        # live-value count as single at RU=4 (the known no-spill point)
        "pair_ru2":  ([2, 2, 2, 4], ["i16", "i16", "i16", "i32"],
                      [2, 2, 2, 2]),
        "base_ru2":  ([1, 1, 1, 1], ["i32"] * 4, [2, 2, 2, 2]),
        # drain minter=4 at ru=2: 8 live row-states (the known no-spill
        # budget) vs drain4's 16 (spilled)
        "drain4_ru2": ([1, 1, 1, 4], ["i32"] * 4, [4, 4, 4, 2]),
        # drain2 plus series-head/tail state-DMA elision
        "drain2_trim": ([1, 1, 1, 2], ["i32"] * 4, None, True),
        # production candidate: drain minter=4 @ ru=2 + DMA trim
        "drain4_ru2_trim": ([1, 1, 1, 4], ["i32"] * 4, [4, 4, 4, 2], True),
        "drain4_ru1": ([1, 1, 1, 4], ["i32"] * 4, [4, 4, 4, 1]),
        "drain2_ru2": ([1, 1, 1, 2], ["i32"] * 4, [4, 4, 4, 2]),
    }
    DT = {"i32": jnp.int32, "i16": jnp.int16}

    pos = [0]

    def take(n):
        a, b = pos[0], pos[0] + n
        pos[0] = b
        return qc_all[a:b], ql_all[a:b]

    # --rotate: measure the named configs in interleaved rotation
    # (cfg1, cfg2, ..., cfg1, cfg2, ...) so chip clock drift between
    # measurements cancels in the per-config MINIMUM; single-pass mode
    # otherwise.  Ratios are only trustworthy within one process AND
    # within one rotation window.
    rotate = bool(only) and "--rotate" in only
    if rotate:
        only = {x for x in only if x != "--rotate"}
        names = [n for n in CONFIGS if n in only]
        walks = {}
        for name in names:
            minters, dts, rus = CONFIGS[name][:3]
            trim = bool(CONFIGS[name][3]) if len(CONFIGS[name]) > 3 else False
            dps = dprofs_for([DT[x] for x in list(dts[:len(dev)])])
            walks[name] = (make_walk(list(minters[:len(dev)]), rus, trim),
                           dps)
            np.asarray(walks[name][0](*take(NQ_SMALL), dps))
            np.asarray(walks[name][0](*take(NQ_BIG), dps))
        best = {n: {NQ_SMALL: [], NQ_BIG: []} for n in names}
        for _ in range(TRIALS + 1):
            for name in names:
                walk, dps = walks[name]
                for nq in (NQ_SMALL, NQ_BIG):
                    qs = take(nq)
                    t0 = time.time()
                    np.asarray(walk(*qs, dps))
                    best[name][nq].append(time.time() - t0)
        for name in names:
            t_q = (min(best[name][NQ_BIG]) - min(best[name][NQ_SMALL])) \
                / (NQ_BIG - NQ_SMALL)
            print(json.dumps({
                "config": name, "rotated": True,
                "ms_per_query": round(t_q * 1e3, 3),
                "gcups": round(cells / max(t_q, 1e-9) / 1e9, 1),
            }), flush=True)
        return

    for name, cfg in CONFIGS.items():
        if only and name not in only:
            continue
        minters, dts, rus = cfg[:3]
        trim = bool(cfg[3]) if len(cfg) > 3 else False
        minters = list(minters[:len(dev)])
        dts = list(dts[:len(dev)])
        try:
            dps = dprofs_for([DT[x] for x in dts])
            walk = make_walk(minters, rus, trim)
            # warm both shapes (compiles)
            t0 = time.time()
            np.asarray(walk(*take(NQ_SMALL), dps))
            np.asarray(walk(*take(NQ_BIG), dps))
            compile_wall = time.time() - t0
            walls = {NQ_SMALL: [], NQ_BIG: []}
            for _ in range(TRIALS):
                for nq in (NQ_SMALL, NQ_BIG):
                    qs = take(nq)
                    t0 = time.time()
                    np.asarray(walk(*qs, dps))
                    walls[nq].append(time.time() - t0)
            t_q = (min(walls[NQ_BIG]) - min(walls[NQ_SMALL])) \
                / (NQ_BIG - NQ_SMALL)
            print(json.dumps({
                "config": name, "minters": minters, "dprof": dts,
                "ru": rus,
                "ms_per_query": round(t_q * 1e3, 3),
                "gcups": round(cells / max(t_q, 1e-9) / 1e9, 1),
                "warm_wall_s": round(compile_wall, 1),
            }), flush=True)
        except Exception as exc:  # noqa: BLE001 — survey tool, keep going
            print(json.dumps({
                "config": name,
                "error": f"{type(exc).__name__}: {str(exc)[:300]}",
            }), flush=True)
        # reset query cursor so every config sees distinct-but-equal work
        pos[0] = 0


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
