"""Capture a remote-compile failure (HTTP 500) without wedging the session.

Round-3 finding (NOTES_ROUND3.md §9): compiling an over-VMEM Pallas
kernel through the remote TPU tunnel fails with an opaque HTTP 500, and
the failed compile can leave the backend wedged — later ``jax.devices()``
calls in OTHER processes hang until the stuck process is killed.  That
made every over-VMEM experiment a blind PID hunt.

This harness makes the failure diagnosable and self-contained:

1. the reproducer runs in a CHILD process (never the caller's), with the
   tunnel plugin's verbose logging enabled (``RUST_LOG=debug`` — the
   plugin is a Rust PJRT .so with env_logger semantics — plus jax's
   compiler logging), all output teed to a log file;
2. the child is hard-killed on timeout (a wedged compile never returns),
   which releases whatever the wedge holds — by construction we kill the
   EXACT pid, never a pattern;
3. afterwards the backend is probed from a fresh child (``jax.devices()``
   under its own timeout) and the health verdict is appended to the log.

Usage:
    python tools/capture_compile_failure.py [out.log] [-- reproducer.py]

Without a reproducer it compiles a deliberately over-VMEM stream kernel
(minter=2 at 2048 lanes with int32 streamed profiles: ~16.6 MB of
scratch+pipeline buffers vs the 16 MB VMEM) — the exact failure class
round 3 could not diagnose.  A captured sample lives at
``tools/compile_failure_sample.log``.
"""

import os
import subprocess
import sys
import time

REPRO = r"""
import numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, ".")
from swipe_tpu.ops.sw_stream import (build_dprofile_series, build_matrix8,
                                     build_qcodes, make_stream_state,
                                     sw_scores_stream_carry)
from swipe_tpu.matrices import ScoreMatrix

m = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
m8 = jnp.asarray(build_matrix8(m.matrix))
rng = np.random.default_rng(0)
db = jnp.asarray(rng.integers(1, 26, size=(128, 2048), dtype=np.int8))
start = jnp.zeros((8, 2048), jnp.int8)
qc, ql = build_qcodes([rng.integers(1, 26, size=200, dtype=np.int8)
                       for _ in range(2)], 256)
h, e, s = make_stream_state(2, 256, 2048)
dp = build_dprofile_series(m8, db, dtype=jnp.int32)   # 2x 4.2 MB buffers
print("compiling over-VMEM kernel (minter=2 @ 2048 lanes, int32 dprof)...",
      flush=True)
out = sw_scores_stream_carry(qc, ql, m8, db, start, h, e, s,
                             gapopenextend=12, gapextend=1,
                             dprof=dp, minter=2)
jax.block_until_ready(out)
print("UNEXPECTED: kernel compiled and ran", flush=True)
"""


def probe_backend(timeout=240.0) -> str:
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            timeout=timeout, capture_output=True, text=True)
        if r.returncode == 0:
            return f"backend healthy ({time.time() - t0:.0f}s): " \
                   f"{r.stdout.strip().splitlines()[-1]}"
        return f"backend probe rc={r.returncode}: {r.stderr[-500:]}"
    except subprocess.TimeoutExpired:
        return (f"backend WEDGED: jax.devices() hung > {timeout:.0f}s in a "
                "fresh process.  Recovery: find the compile child's pid in "
                "this log header and `kill <pid>` (exact pid, never a "
                "pattern), then re-probe.")


def main():
    argv = sys.argv[1:]
    out_path = "compile_failure.log"
    repro_file = None
    if "--" in argv:
        i = argv.index("--")
        repro_file = argv[i + 1]
        argv = argv[:i]
    if argv:
        out_path = argv[0]

    env = dict(os.environ)
    env.setdefault("RUST_LOG", "debug")          # tunnel plugin (Rust)
    env.setdefault("JAX_LOG_COMPILES", "1")
    env["PYTHONUNBUFFERED"] = "1"

    cmd = [sys.executable, repro_file] if repro_file \
        else [sys.executable, "-c", REPRO]
    with open(out_path, "w") as log:
        child = subprocess.Popen(cmd, env=env, stdout=log,
                                 stderr=subprocess.STDOUT)
        header = (f"# capture_compile_failure: child pid={child.pid} "
                  f"cmd={'file:' + repro_file if repro_file else 'builtin'}\n")
        print(header, end="")
        timeout = float(os.environ.get("CAPTURE_TIMEOUT", "900"))
        try:
            rc = child.wait(timeout=timeout)
            verdict = f"# child exited rc={rc}"
        except subprocess.TimeoutExpired:
            child.kill()                          # the exact pid, no pattern
            child.wait()
            verdict = (f"# child pid={child.pid} hung > {timeout:.0f}s "
                       "(wedged compile) — killed")
        print(verdict)
        health = probe_backend()
        print(health)
        log.write("\n" + header + verdict + "\n" + health + "\n")
    print(f"# log written to {out_path}")


if __name__ == "__main__":
    main()
