"""Multi-host execution: N-process CPU runs vs the single-process CLI.

Each spawned process is one "host" (jax.distributed.initialize over
gloo, 4 virtual CPU devices per host); rank 0's full CLI output must be
byte-identical to the single-process run — the acceptance bar the
reference's mpiswipe meets vs swipe.
"""

import io
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOLATILE = re.compile(
    r"^(Search started|Search completed|Elapsed|Speed|# SWIPE|"
    r"\s*<searchStarted>|\s*<searchCompleted>|\s*<searchElapsedTime>|"
    r"\s*<searchSpeed>)")


def _normalize(text: str) -> str:
    return "\n".join(l for l in text.splitlines() if not VOLATILE.match(l))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_single(args) -> str:
    from contextlib import redirect_stdout

    from swipe_tpu.cli import main
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(args + ["--backend", "lax"])
    assert rc == 0
    return buf.getvalue()


def _run_multi(tmp_path, args, nproc=2) -> str:
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("SWIPE_TPU_NO_COMPILE_CACHE", None)
    procs = []
    outfile = tmp_path / "multi.txt"
    for r in range(nproc):
        cmd = [sys.executable, "-m", "swipe_tpu.cli"] + args + [
            "--backend", "lax", "--mh-procs", str(nproc),
            "--mh-rank", str(r), "--mh-coord", f"localhost:{port}"]
        if r == 0:
            cmd += ["-o", str(outfile)]
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=str(tmp_path),
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE))
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=300)
        errs.append(err.decode()[-2000:])
        assert p.returncode == 0, errs
    return outfile.read_text()


@pytest.fixture(scope="module")
def mh_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(9)
    AA = list("ARNDCQEGHILKMFPSTWYV")
    NT = list("ACGT")
    qp = "".join(rng.choice(AA, 70))
    with open(d / "db.fa", "w") as f:
        for i in range(120):
            s = "".join(rng.choice(AA, int(rng.integers(40, 150))))
            if i == 17:
                s = qp[5:60]
            if i == 93:
                s = s[:20] + qp[10:45] + s[20:]
            f.write(f">s{i} multihost test {i}\n{s}\n")
    (d / "qp.fa").write_text(f">q mh query\n{qp}\n")
    qn = "".join(rng.choice(NT, 90))
    with open(d / "dbn.fa", "w") as f:
        for i in range(60):
            s = "".join(rng.choice(NT, int(rng.integers(60, 220))))
            if i == 11:
                s = s[:30] + qn + s[30:]
            f.write(f">n{i} nt multihost {i}\n{s}\n")
    (d / "qn.fa").write_text(f">qn mh nt query\n{qn}\n")
    return d


@pytest.mark.parametrize("case", [
    ["-p", "blastp", "-m", "0", "-d", "db.fa", "-i", "qp.fa"],
    ["-p", "tblastn", "-m", "9", "-e", "1000", "-d", "dbn.fa",
     "-i", "qp.fa"],
])
def test_multihost_output_identical(mh_db, case):
    args = case[:]
    for i, v in enumerate(args):
        if v in ("db.fa", "dbn.fa", "qp.fa", "qn.fa"):
            args[i] = str(mh_db / v)
    single = _normalize(_run_single(args))
    multi = _normalize(_run_multi(mh_db, args, nproc=2))
    assert multi == single


def test_multihost_chromosome_scale(mh_db, tmp_path):
    """A unit longer than max_cols (16384 on the lax backend) streams
    through the owning host's carry series; merged output must still be
    byte-identical to the single-process run."""
    rng = np.random.default_rng(21)
    NT = list("ACGT")
    qn = (mh_db / "qn.fa").read_text().splitlines()[1]
    with open(tmp_path / "dbg.fa", "w") as f:
        for i in range(24):
            s = "".join(rng.choice(NT, int(rng.integers(80, 200))))
            f.write(f">g{i} small {i}\n{s}\n")
        giant = "".join(rng.choice(NT, 20000))
        giant = giant[:9000] + qn + giant[9000:]
        f.write(f">gX giant contig\n{giant}\n")
    args = ["-p", "blastn", "-m", "9", "-e", "1000",
            "-d", str(tmp_path / "dbg.fa"), "-i", str(mh_db / "qn.fa")]
    single = _normalize(_run_single(args))
    multi = _normalize(_run_multi(tmp_path, args, nproc=2))
    assert multi == single
    assert "gX" in single


def test_multihost_blastn_strands(mh_db):
    args = ["-p", "blastn", "-m", "0", "-e", "1000",
            "-d", str(mh_db / "dbn.fa"), "-i", str(mh_db / "qn.fa")]
    single = _normalize(_run_single(args))
    multi = _normalize(_run_multi(mh_db, args, nproc=2))
    assert multi == single


def test_split_seqnos_volume_aligned(tmp_path):
    from swipe_tpu.alphabet import MAP_NCBI_AA, encode
    from swipe_tpu.io import blastdb
    from swipe_tpu.io.blastdb_writer import make_deflines, write_blastdb
    from swipe_tpu.parallel.multihost import split_seqnos
    rng = np.random.default_rng(3)
    AA = list("ARNDCQEGHILKMFPSTWYV")
    counts = (7, 5, 9)   # uneven volumes
    vols = []
    for v, n in enumerate(counts):
        seqs = [encode("".join(rng.choice(AA, 30)), MAP_NCBI_AA)
                for _ in range(n)]
        write_blastdb(str(tmp_path / f"v{v}"), seqs,
                      make_deflines([f"v{v}s{i}" for i in range(n)]), "aa",
                      title=f"vol{v}", date="Jan 1, 2026  12:00 AM")
        vols.append(f"v{v}")
    (tmp_path / "all.pal").write_text(
        "TITLE  split test\nDBLIST %s\n" % " ".join(vols))
    db = blastdb.BlastDatabase(str(tmp_path / "all"), "aa")
    ranges = split_seqnos(db, 2)
    # boundary snaps to a volume start (0, 7, 12 or 21)
    assert ranges[0][0] == 0 and ranges[-1][1] == 21
    assert ranges[0][1] in (7, 12)
    assert ranges[0][1] == ranges[1][0]

    # plain FASTA falls back to an even split covering everything
    from swipe_tpu.io.db import FastaDatabase
    fdb = FastaDatabase(io.StringIO(">a x\nARN\n>b y\nDCQ\n>c z\nEGH\n"),
                        "aa")
    r = split_seqnos(fdb, 2)
    assert r[0][0] == 0 and r[-1][1] == 3 and r[0][1] == r[1][0]


def test_pick_stream_mode_routes_long_queries():
    # queries beyond one VMEM tile must take the query-tiled kernel on
    # the multi-host path too (the plain kernel's scratch would exceed
    # the 16 MB VMEM budget at qlen_pad 2048 x 1024 lanes)
    from swipe_tpu.parallel.multihost import _pick_stream_mode
    assert _pick_stream_mode(False, 1024, 2048) == ("lax", 2048)
    assert _pick_stream_mode(True, 1024, 512) == ("stream", 512)
    assert _pick_stream_mode(True, 2048, 384) == ("stream", 384)
    assert _pick_stream_mode(True, 2048, 512) == ("stream_long", 512)
    mode, pad = _pick_stream_mode(True, 1024, 1152)
    assert mode == "stream_long" and pad % 512 == 0 and pad >= 1152
