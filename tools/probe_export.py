"""AOT-export prototype: can a fresh process skip the 142 s JAX lowering?

Hypothesis (probe_cold/probe_lower attribution): the cold first-search
wall is host-side lowering of the fused walk (Mosaic kernel
serialization on a 1-vCPU host), which the persistent COMPILE cache
cannot skip because its key requires the lowered module.  jax.export
serializes the lowered StableHLO (with the Mosaic kernels already
embedded); deserializing it in a fresh process needs no trace and no
pallas lowering — only a backend compile, which the persistent compile
cache then memoizes across processes.

Phase A (--save DIR): build a production-shaped one-chunk stream call
with the db data/profile as ARGUMENTS, export, serialize to DIR, and
run it; prints build/lower/serialize times and blob size.
Phase B (--load DIR): fresh process: deserialize and run on the same
shapes; prints deserialize + first-call walls.  Run B twice: once with
the compile cache of A (warm) and once against an empty cache dir.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, COLS, QLEN = 2048, 896, 256


def build_args():
    import jax.numpy as jnp

    from swipe_tpu.matrices import ScoreMatrix
    from swipe_tpu.ops.sw_stream import (build_dprofile_series,
                                         build_matrix8, build_qcodes,
                                         make_stream_state)

    m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    m8 = jnp.asarray(build_matrix8(m.matrix))
    rng = np.random.default_rng(0)
    qc, ql = build_qcodes([rng.integers(1, 21, 200).astype(np.int8)] * 2,
                          QLEN)
    data = jnp.asarray(rng.integers(1, 21, (COLS, W)).astype(np.int8))
    start = jnp.zeros((COLS // 16, W), jnp.int32)
    h, e, s = make_stream_state(2, QLEN, W)
    dp = build_dprofile_series(m8, data)
    return (jnp.asarray(qc), jnp.asarray(ql), m8, data, start, dp, h, e, s)


def fn(qc, ql, m8, data, start, dp, h, e, s):
    from swipe_tpu.ops.sw_stream import sw_scores_stream_carry
    out, hh, ee, ss = sw_scores_stream_carry(
        qc, ql, m8, data, start, h, e, s, gapopenextend=12, gapextend=1,
        dprof=dp, minter=1, carry_in=False, carry_out=True)
    return out


def main():
    from swipe_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax
    from jax import export

    mode, path = sys.argv[1], sys.argv[2]
    os.makedirs(path, exist_ok=True)
    blob_path = os.path.join(path, "walk.jaxexport")

    if mode == "--save":
        t0 = time.time()
        args = build_args()
        t_args = time.time() - t0
        t0 = time.time()
        exp = export.export(jax.jit(fn))(*args)
        t_export = time.time() - t0
        t0 = time.time()
        blob = exp.serialize()
        t_ser = time.time() - t0
        with open(blob_path, "wb") as f:
            f.write(blob)
        t0 = time.time()
        out = np.asarray(exp.call(*args))
        t_run = time.time() - t0
        print(json.dumps({"mode": "save", "args_s": round(t_args, 2),
                          "export_s": round(t_export, 2),
                          "serialize_s": round(t_ser, 2),
                          "blob_mb": round(len(blob) / 1e6, 2),
                          "first_call_s": round(t_run, 2),
                          "out0": int(out.ravel()[0])}))
    else:
        t0 = time.time()
        args = build_args()
        t_args = time.time() - t0
        t0 = time.time()
        with open(blob_path, "rb") as f:
            exp = export.deserialize(f.read())
        t_de = time.time() - t0
        t0 = time.time()
        out = np.asarray(exp.call(*args))
        t_run = time.time() - t0
        t0 = time.time()
        out2 = np.asarray(exp.call(*args))
        t_run2 = time.time() - t0
        print(json.dumps({"mode": "load", "args_s": round(t_args, 2),
                          "deserialize_s": round(t_de, 2),
                          "first_call_s": round(t_run, 2),
                          "second_call_s": round(t_run2, 2),
                          "out0": int(out.ravel()[0]),
                          "out_match": bool((out == out2).all())}))


if __name__ == "__main__":
    main()
