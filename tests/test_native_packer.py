"""Native LPT packer (native/packer.cc) vs the Python pack_stream loop.

The native plan+fill must produce BYTE-IDENTICAL chunks — same LPT
assignment (heap tie order), same chunk splits and oversize handling,
same flush member order — because unit order feeds the tie-order
discipline downstream (hits.py insertion order).
"""

import numpy as np
import pytest

from swipe_tpu import native
from swipe_tpu.batching import _pack_stream_native, pack_stream

pytestmark = pytest.mark.skipif(not native.pack_available(),
                                reason="native packer not built")


def _python_pack(seqs, **kw):
    orig = native.pack_available
    native.pack_available = lambda: False
    try:
        return pack_stream(seqs, **kw)
    finally:
        native.pack_available = orig


def _native_pack(seqs, nseqs, max_cols, block=16):
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    return _pack_stream_native(
        seqs, lens, np.argsort(-lens, kind="stable"),
        np.arange(len(seqs), dtype=np.int64), nseqs, max_cols, block)


def _assert_chunks_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x.data_t, y.data_t)
        assert np.array_equal(x.start, y.start)
        assert np.array_equal(x.seqnos, y.seqnos)
        assert np.array_equal(x.lane, y.lane)
        assert np.array_equal(x.end_block, y.end_block)
        assert x.residues == y.residues


def test_native_pack_fuzz_equality():
    rng = np.random.default_rng(3)
    for trial in range(40):
        n = int(rng.integers(0, 300))
        lens = rng.choice([0, 1, 3, 15, 16, 17, 100, 257, 1000, 5000],
                          size=n,
                          p=[.02, .05, .1, .1, .1, .1, .3, .15, .05, .03])
        seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8)
                for L in lens]
        kw = dict(nseqs=int(rng.choice([8, 16, 1024])),
                  max_cols=int(rng.choice([64, 256, 4096])), block=16)
        _assert_chunks_equal(_python_pack(seqs, **kw),
                             _native_pack(seqs, kw["nseqs"],
                                          kw["max_cols"]))


def test_native_pack_oversized_member():
    """A sequence longer than max_cols stretches its chunk in both."""
    rng = np.random.default_rng(4)
    seqs = [rng.integers(1, 26, size=L, dtype=np.int8)
            for L in [700, 60, 20, 20, 700, 5]]
    a = _python_pack(seqs, nseqs=8, max_cols=128, block=16)
    b = _native_pack(seqs, 8, 128)
    _assert_chunks_equal(a, b)
    assert max(c.n_cols for c in a) >= 704


def test_pack_stream_routes_to_native_at_scale():
    """pack_stream itself uses the native path above the size gate."""
    rng = np.random.default_rng(5)
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8)
            for L in rng.integers(10, 120, 5000)]
    got = pack_stream(seqs, nseqs=1024, max_cols=4096)
    want = _python_pack(seqs, nseqs=1024, max_cols=4096)
    _assert_chunks_equal(want, got)
