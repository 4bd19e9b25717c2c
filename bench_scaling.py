"""Multi-chip scaling benchmark: GCUPS/chip at mesh sizes 1..N.

BASELINE.md target: >=0.8 scaling efficiency from 1 chip to a multi-host
slice.  The db's packed lanes shard over the mesh's "db" axis
(parallel.distributed.sharded_stream_topk) and the per-device top-K lists
merge with one all-gather — the communication volume is K records per
device per chunk, so efficiency is expected to be ~1.0 until the chunk is
too small to fill a device.

On this machine only one TPU chip is visible, so the harness measures the
1-chip point and, when run with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=N, validates the sharded path's
correctness/overheads on a virtual mesh (not a performance number).  On a
real v5p slice run it unmodified.

Prints one JSON line per mesh size.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from swipe_tpu.batching import pack_stream
    from swipe_tpu.matrices import ScoreMatrix
    from swipe_tpu.ops.sw_stream import build_matrix8, build_qcodes
    from swipe_tpu.parallel.distributed import (make_mesh,
                                                shard_stream_chunk,
                                                sharded_stream_topk)

    devices = jax.devices()
    on_tpu = jax.default_backend() not in ("cpu",)
    backend = "pallas" if on_tpu else "lax"
    nl_local = 2048 if on_tpu else 128

    rng = np.random.default_rng(0)
    m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    lens = np.clip(rng.lognormal(5.8, 0.5, 20_000).astype(int), 20, 3000)
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8) for L in lens]
    m8 = jnp.asarray(build_matrix8(m.matrix))
    qlen, reps = 200, 5
    qcs = [tuple(map(jnp.asarray, build_qcodes(
        [rng.integers(1, 26, size=qlen, dtype=np.int8)], 256)))
        for _ in range(2 * reps)]
    cells = qlen * int(lens.sum())

    sizes = []
    n = 1
    while n <= len(devices):
        sizes.append(n)
        n *= 2

    base = None
    for n_db in sizes:
        mesh = make_mesh(n_db=n_db, n_q=1, devices=devices[:n_db])
        ch = pack_stream(seqs, nseqs=nl_local * n_db, max_cols=262144)[0]
        eb, ln, un = shard_stream_chunk(ch, n_db=n_db)
        d = jnp.asarray(ch.data_t).T
        st = jnp.asarray(ch.start)
        eb, ln, un = map(jnp.asarray, (eb, ln, un))

        def run(qc):
            s, u, c = sharded_stream_topk(
                mesh, qc[0], qc[1], m8, d, st, eb, ln, un,
                gapopenextend=12, gapextend=1, k=100, backend=backend)
            return s

        def one_pass(sets):
            return np.asarray(
                jnp.concatenate([run(qc) for qc in sets]).max())

        one_pass(qcs[reps:])
        t0 = time.time()
        one_pass(qcs[:reps])
        dt = max(time.time() - t0 - 0.037, 1e-9) / reps
        gcups = cells / dt / 1e9
        if base is None:
            base = gcups
        print(json.dumps({
            "metric": f"GCUPS_{n_db}chip_sharded",
            "value": round(gcups, 3),
            "unit": "GCUPS",
            "per_chip": round(gcups / n_db, 3),
            "scaling_efficiency": round(gcups / (base * n_db), 3),
        }))


if __name__ == "__main__":
    main()
