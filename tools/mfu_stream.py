"""MFU / speed-of-light analysis for the stream kernel (run on real TPU).

Measures, with slope timing (two workload sizes; fixed dispatch+sync cost
cancels in the difference):

1. the VPU int32 ALU issue rate (a pallas microbenchmark of chained
   max/add chains — the op mix of the DP recurrence);
2. the stream kernel's cells/s at config-1 shapes (1 query x 10k seqs),
   plus a qlen sweep separating per-cell cost from per-block overhead
   (dprofile build + state traffic + grid step);
3. optional RU / KSEG variants (env SWIPE_TPU_RU / SWIPE_TPU_KSEG are
   applied by monkeypatching ops.sw_stream before any trace).

Usage:  python tools/mfu_stream.py [--quick]

The derived model: the recurrence runs ~10 int32 VPU ops per DP cell
(4 add/sub + 6 max — see ops/sw_stream.py _make_row_body), so

    ceiling_GCUPS = vpu_ops_per_sec / ops_per_cell / occupancy_factor

and MFU = measured / ceiling.  Results feed BASELINE.md's MFU table.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS_PER_CELL = 10  # 4 add/sub + 6 max in _make_row_body (excl. dprof load)


def slope_time(fn, small, big, trials=3):
    """Wall-clock slope between two workload sizes: returns seconds per
    unit at zero fixed cost.  fn(n) must dispatch-and-sync a workload of
    size n; distinct inputs per call defeat the tunnel's memoization."""
    walls = {small: [], big: []}
    fn(small), fn(big)                      # warm both shapes
    for _ in range(trials):
        for n in (small, big):
            t0 = time.time()
            fn(n)
            walls[n].append(time.time() - t0)
    return (min(walls[big]) - min(walls[small])) / (big - small), walls


def measure_vpu_peak(width=256):
    """Chained int32 max/add throughput on one core: the DP recurrence's
    op mix with no memory traffic — an upper bound for any VPU kernel.
    ``width`` sets the lane dimension: width // 128 vector registers form
    that many independent dependency chains, so sweeping width measures
    the latency-vs-issue-bound transition of the VPU."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHAIN = 256          # chained dependent op-pairs per loop iteration
    SHAPE = (8, width)

    def kernel(x_ref, o_ref, *, iters):
        def body(i, xy):
            x, y = xy
            for _ in range(CHAIN):
                x = jnp.maximum(x + 1, y)
                y = jnp.maximum(y - 1, x)
            return x, y
        x, y = jax.lax.fori_loop(
            0, iters, body, (x_ref[...], x_ref[...] + 1))
        o_ref[...] = x + y

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x, iters):
        return pl.pallas_call(
            functools.partial(kernel, iters=iters),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.zeros(SHAPE, jnp.int32)
    lanes = SHAPE[0] * SHAPE[1]
    ops_per_iter = CHAIN * 2 * 2 * lanes    # 2 ops per line, 2 lines

    def fn(iters):
        np.asarray(run(x, iters))

    # long chains: the slope difference must dwarf the ~1 ms tunnel
    # jitter (short 2k/10k runs produced 3x-scattered readings)
    sec_per_iter, walls = slope_time(fn, 10_000, 50_000)
    return ops_per_iter / sec_per_iter, walls


def measure_stream(qlen, nseqs=2048, reps_small=2, reps_big=8, seed=0):
    """Config-1-shaped stream-kernel rate at a given query length.
    Returns (cells_per_sec, true_cells_per_rep, padded_cells_per_rep)."""
    import jax
    import jax.numpy as jnp

    from swipe_tpu.batching import pack_stream
    from swipe_tpu.matrices import ScoreMatrix
    from swipe_tpu.ops import sw_stream
    from swipe_tpu.ops.sw_stream import (build_matrix8, build_qcodes,
                                         gather_scores, sw_scores_stream)

    rng = np.random.default_rng(seed)
    m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    lens = np.clip(rng.lognormal(5.8, 0.5, 10_000).astype(int), 20, 3000)
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8) for L in lens]
    chunks = pack_stream(seqs, nseqs=nseqs, max_cols=65536,
                         block=sw_stream.KSEG)
    dev = [(jnp.asarray(c.data_t).T, jnp.asarray(c.start),
            jnp.asarray(c.end_block), jnp.asarray(c.lane))
           for c in chunks]
    m8 = jnp.asarray(build_matrix8(m.matrix))
    nq_needed = 64
    qs = [rng.integers(1, 26, size=qlen, dtype=np.int8)
          for _ in range(nq_needed)]
    qlen_pad = -(-qlen // 128) * 128
    qstacks = [tuple(map(jnp.asarray, build_qcodes([q], qlen_pad)))
               for q in qs]

    @jax.jit
    def chain(qcs, qls):
        def body(_, xs):
            qc, ql = xs
            parts = [gather_scores(
                sw_scores_stream(qc, ql, m8, d, st, gapopenextend=12,
                                 gapextend=1), eb, ln)
                for d, st, eb, ln in dev]
            return 0, jax.lax.top_k(
                jnp.concatenate(parts, axis=1).reshape(-1), 8)[0]
        _, tops = jax.lax.scan(body, 0, (qcs, qls))
        return tops

    pos = [0]

    def fn(reps):
        sel = qstacks[pos[0] % (nq_needed - reps):][:reps]
        pos[0] += reps
        qcs = jnp.stack([q[0] for q in sel])
        qls = jnp.stack([q[1] for q in sel])
        np.asarray(chain(qcs, qls))

    sec_per_rep, walls = slope_time(fn, reps_small, reps_big)
    true_cells = qlen * int(lens.sum())
    padded_cells = qlen * sum(int(c.data_t.size) for c in chunks)
    nblocks = sum(c.data_t.shape[1] // sw_stream.KSEG for c in chunks)
    return true_cells / sec_per_rep, true_cells, padded_cells, nblocks, walls


def measure_batch(qlen=200, nq=16, qgroup=2, nseqs=2048, seed=1,
                  dprof=False):
    """Batch-throughput probe: nq queries through sw_scores_stream with a
    given qgroup (even qgroups interleave member pairs in the row loop).
    ``dprof`` streams precomputed block profiles (build_dprofile_series)
    instead of the inline build.  Returns true cells/s across the batch."""
    import jax
    import jax.numpy as jnp

    from swipe_tpu.batching import pack_stream
    from swipe_tpu.matrices import ScoreMatrix
    from swipe_tpu.ops import sw_stream
    from swipe_tpu.ops.sw_stream import (build_dprofile_series,
                                         build_matrix8, build_qcodes,
                                         gather_scores, sw_scores_stream)

    rng = np.random.default_rng(seed)
    m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    lens = np.clip(rng.lognormal(5.8, 0.5, 10_000).astype(int), 20, 1800)
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8) for L in lens]
    chunks = pack_stream(seqs, nseqs=nseqs, max_cols=65536,
                         block=sw_stream.KSEG)
    m8 = jnp.asarray(build_matrix8(m.matrix))
    dev = [(jnp.asarray(c.data_t).T, jnp.asarray(c.start),
            jnp.asarray(c.end_block), jnp.asarray(c.lane))
           for c in chunks]
    # profiles are jit ARGUMENTS: closed-over arrays embed into the HLO
    # as constants and the remote compile helper caps the request size
    dprofs = tuple(jax.block_until_ready(build_dprofile_series(m8, d))
                   for (d, *_r) in dev) if dprof else \
        tuple(None for _ in dev)
    qlen_pad = -(-qlen // 128) * 128
    nbatches = 24
    batches = []
    for _ in range(nbatches):
        qs = [rng.integers(1, 26, size=qlen, dtype=np.int8)
              for _ in range(nq)]
        batches.append(tuple(map(jnp.asarray, build_qcodes(qs, qlen_pad))))

    @jax.jit
    def chain_impl(qcs, qls, dps):
        def body(_, xs):
            qc, ql = xs
            parts = [gather_scores(
                sw_scores_stream(qc, ql, m8, d, st, gapopenextend=12,
                                 gapextend=1, qgroup=qgroup,
                                 dprof=dps[i]), eb, ln)
                for i, (d, st, eb, ln) in enumerate(dev)]
            return 0, jax.lax.top_k(
                jnp.concatenate(parts, axis=1).reshape(-1), 8)[0]
        _, tops = jax.lax.scan(body, 0, (qcs, qls))
        return tops

    def chain(qcs, qls):
        return chain_impl(qcs, qls, dprofs)

    def stack(bs):
        return (jnp.stack([b[0] for b in bs]), jnp.stack([b[1] for b in bs]))

    pos = [0]

    def fn(reps):
        sel = batches[pos[0] % (nbatches - reps):][:reps]
        pos[0] += reps
        np.asarray(chain(*stack(sel)))

    sec_per_rep, walls = slope_time(fn, 2, 8)
    cells = nq * qlen * int(lens.sum())
    return cells / sec_per_rep, walls


def main():
    quick = "--quick" in sys.argv
    from swipe_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax

    from swipe_tpu.ops import sw_stream

    ru = os.environ.get("SWIPE_TPU_RU")
    kseg = os.environ.get("SWIPE_TPU_KSEG")
    if ru:
        sw_stream.RU = int(ru)
    if kseg:
        sw_stream.KSEG = int(kseg)
        import swipe_tpu.batching  # block param passed explicitly above
    if os.environ.get("SWIPE_TPU_DPROF16"):
        # int16 dprofile: run in a FRESH process — DPROF_DTYPE is read at
        # trace time and jit caches don't key on it
        import jax.numpy as jnp
        sw_stream.DPROF_DTYPE = jnp.int16
    if "--nodprof" in sys.argv:
        # timing probe: skip the per-block dprofile build (results wrong)
        sw_stream._SKIP_DPROF = True
    print(f"# backend={jax.default_backend()} "
          f"RU={sw_stream.RU} KSEG={sw_stream.KSEG} "
          f"dprof={np.dtype(sw_stream.DPROF_DTYPE).name}")

    widths = [256] if quick else [128, 256, 512, 1024, 2048]
    ceiling = None
    for w in widths:
        vpu_ops, walls = measure_vpu_peak(w)
        print(f"VPU int32 chained max/add rate @ width {w:4d} "
              f"({w // 128} chains): {vpu_ops/1e12:.3f} Tops/s")
        if w == 256:
            ceiling = vpu_ops / OPS_PER_CELL
    print(f"-> recurrence ceiling at {OPS_PER_CELL} ops/cell "
          f"(2-chain rate): {ceiling/1e9:.1f} Gcells/s")

    if "--vpu-only" in sys.argv:
        return
    if "--batch" in sys.argv:
        dp = "--dprof" in sys.argv
        for qg in (1, 2):
            try:
                rate, walls = measure_batch(qgroup=qg, dprof=dp)
                print(f"batch nq=16 qlen=200 qgroup={qg} dprof={int(dp)} "
                      f"(interleave {2 if qg % 2 == 0 else 1}): "
                      f"{rate/1e9:7.1f} GCUPS "
                      f"walls {['%.4f' % w for w in walls[8]]}")
            except Exception as exc:
                print(f"batch qgroup={qg}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:200]}")
        return
    for qlen in ([200] if quick else [200, 104, 384]):
        rate, tc, pc, nblocks, walls = measure_stream(qlen)
        pad_rate = rate * pc / tc
        print(f"qlen {qlen:4d}: {rate/1e9:7.1f} GCUPS true "
              f"({pad_rate/1e9:7.1f} padded-cells/s, occ {tc/pc:.3f}, "
              f"{nblocks} blocks) "
              f"MFU(vs VPU ceiling) {pad_rate/ceiling:6.1%}  "
              f"walls {['%.4f' % w for w in walls[8]]}")


if __name__ == "__main__":
    main()
