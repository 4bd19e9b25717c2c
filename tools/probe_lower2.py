"""Per-kernel lowering cost: where does the walk's 142 s lowering go?

Times .lower() of single sw_scores_stream_carry calls at production
chunk shapes with dprof passed as an ARGUMENT (as bench.py does) and as
an inline build (as pipeline._flow_walk does), twice each to expose
in-process caching, then cProfiles one fresh lower.
"""

import cProfile
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from swipe_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from swipe_tpu.matrices import ScoreMatrix
    from swipe_tpu.ops.sw_stream import (build_dprofile_series,
                                         build_matrix8, build_qcodes,
                                         make_stream_state,
                                         sw_scores_stream_carry)

    m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    m8 = jnp.asarray(build_matrix8(m.matrix))
    rng = np.random.default_rng(0)
    qc, ql = build_qcodes([rng.integers(1, 21, 200).astype(np.int8)] * 2, 256)
    qc, ql = jnp.asarray(qc), jnp.asarray(ql)

    def make_fn(w, cols, minter, mode):
        data = jnp.asarray(rng.integers(1, 21, (cols, w)).astype(np.int8))
        start = jnp.zeros((cols // 16, w), jnp.int32)
        h, e, s = make_stream_state(2, 256, w)
        dp_arg = build_dprofile_series(m8, data) if mode == "arg" else None

        def fn(qc, ql, dp):
            if mode == "inline":
                dp = build_dprofile_series(m8, data)
            out, hh, ee, ss = sw_scores_stream_carry(
                qc, ql, m8, data, start, h, e, s, gapopenextend=12,
                gapextend=1, dprof=dp, minter=minter,
                carry_in=False, carry_out=True)
            return out, hh, ee, ss
        return fn, dp_arg

    cases = [(2048, 896, 1, "arg"), (2048, 896, 1, "arg"),
             (2048, 896, 1, "inline"), (2048, 896, 1, "inline"),
             (2048, 128, 1, "inline"), (1024, 1024, 2, "inline"),
             (2048, 896, 1, "nodp")]
    for (w, cols, minter, mode) in cases:
        fn, dp = make_fn(w, cols, minter, mode)
        t0 = time.time()
        traced = jax.jit(fn).trace(qc, ql, dp)
        t_tr = time.time() - t0
        t0 = time.time()
        low = traced.lower()
        t_lo = time.time() - t0
        print(f"shape {w}x{cols} minter={minter} mode={mode}: "
              f"trace {t_tr:.2f}s lower {t_lo:.2f}s", flush=True)

    fn, dp = make_fn(2048, 768, 1, "inline")
    traced = jax.jit(fn).trace(qc, ql, dp)
    pr = cProfile.Profile()
    pr.enable()
    traced.lower()
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    st.print_stats(30)


if __name__ == "__main__":
    main()
