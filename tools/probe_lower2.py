"""Per-kernel lowering cost: is the 142 s walk lowering per-instance,
and do same-shape instances dedup?  Times .lower() of a single
sw_scores_stream_carry call at each production chunk shape, twice each
(second time = any caching), plus a cProfile of one lower to find the
hot pass.
"""

import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from swipe_tpu.ops.sw_stream import (build_dprofile_series,
                                         build_matrix8, build_qcodes,
                                         make_stream_state,
                                         sw_scores_stream_carry)
    from swipe_tpu.matrices import ScoreMatrix

    m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    m8 = jnp.asarray(build_matrix8(m.matrix))
    rng = np.random.default_rng(0)
    qc, ql = build_qcodes([rng.integers(1, 21, 200).astype(np.int8)], 256)
    qc, ql = jnp.asarray(qc), jnp.asarray(ql)

    def make_fn(w, cols, minter, dprof):
        data = jnp.asarray(rng.integers(1, 21, (cols, w)).astype(np.int8))
        start = jnp.zeros((cols // 16, w), jnp.int32)
        h, e, s = make_stream_state(1, 256, w)
        dp = build_dprofile_series(m8, data) if dprof else None

        def fn(qc, ql):
            out, hh, ee, ss = sw_scores_stream_carry(
                qc, ql, m8, data, start, h, e, s, gapopenextend=12,
                gapextend=1, dprof=dp, minter=minter,
                carry_in=False, carry_out=True)
            return out, hh, ee, ss
        return fn

    shapes = [(2048, 896, 1, True), (2048, 128, 1, True),
              (1024, 1024, 2, True)]
    for (w, cols, minter, dp) in shapes:
        for rep in range(2):
            fn = make_fn(w, cols, minter, dp)
            t0 = time.time()
            traced = jax.jit(fn).trace(qc, ql)
            t_tr = time.time() - t0
            t0 = time.time()
            low = traced.lower()
            t_lo = time.time() - t0
            print(f"shape {w}x{cols} minter={minter} rep={rep}: "
                  f"trace {t_tr:.2f}s lower {t_lo:.2f}s", flush=True)

    # profile one fresh lower
    fn = make_fn(2048, 896, 1, True)
    traced = jax.jit(fn).trace(qc, ql)
    pr = cProfile.Profile()
    pr.enable()
    traced.lower()
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    st.print_stats(25)


if __name__ == "__main__":
    main()
