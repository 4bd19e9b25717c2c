"""Stream SW kernel (lane-refill) + LPT packer vs the NumPy oracle."""

import numpy as np
import pytest

from swipe_tpu.batching import pack_stream
from swipe_tpu.matrices import ScoreMatrix
from swipe_tpu.ops.sw_ref import sw_numpy_many
from swipe_tpu.ops.sw_stream import (KSEG, build_matrix8, build_qcodes,
                                     gather_scores, sw_scores_stream)


@pytest.fixture(scope="module")
def m62():
    return ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)


def _rand_seqs(rng, n, lo, hi):
    return [rng.integers(1, 26, size=int(rng.integers(lo, hi)),
                         dtype=np.int8) for _ in range(n)]


def _run(queries, seqs, m, qlen_pad=128, nseqs=1024, max_cols=65536):
    chunks = pack_stream(seqs, nseqs=nseqs, max_cols=max_cols)
    qc, ql = build_qcodes(queries, qlen_pad)
    m8 = build_matrix8(m.matrix)
    got = np.zeros((len(queries), len(seqs)), dtype=np.int64)
    for ch in chunks:
        out = sw_scores_stream(qc, ql, m8, ch.data, ch.start,
                               gapopenextend=12, gapextend=1,
                               interpret=True)
        sc = np.asarray(gather_scores(out, ch.end_block, ch.lane))
        got[:, ch.seqnos] = sc
    return got, chunks


def test_stream_matches_oracle(m62):
    rng = np.random.default_rng(0)
    queries = _rand_seqs(rng, 2, 10, 50)
    seqs = _rand_seqs(rng, 2200, 1, 150)
    got, chunks = _run(queries, seqs, m62)
    want = np.stack([sw_numpy_many(q, seqs, m62.matrix, 11, 1)
                     for q in queries])
    assert np.array_equal(got, want)


def test_stream_multi_chunk_and_long_seqs(m62):
    # sequences spanning many blocks force cross-block H/E state carry;
    # a small max_cols forces several kernel launches
    rng = np.random.default_rng(1)
    queries = _rand_seqs(rng, 1, 30, 40)
    seqs = _rand_seqs(rng, 4000, 5, 6 * KSEG)
    got, chunks = _run(queries, seqs, m62, max_cols=KSEG * 8)
    assert len(chunks) > 1
    want = np.stack([sw_numpy_many(q, seqs, m62.matrix, 11, 1)
                     for q in queries])
    assert np.array_equal(got, want)


def test_stream_clamped_tier_saturates(m62):
    # identical long sequences score far beyond 127; clamp must stick
    rng = np.random.default_rng(2)
    s = rng.integers(1, 26, size=200, dtype=np.int8)
    seqs = [s] + _rand_seqs(rng, 1023, 10, 30)
    chunks = pack_stream(seqs, nseqs=1024)
    qc, ql = build_qcodes([s], 256)
    m8 = build_matrix8(m62.matrix)
    ch = chunks[0]
    out = sw_scores_stream(qc, ql, m8, ch.data, ch.start,
                           gapopenextend=12, gapextend=1, clamp=127,
                           interpret=True)
    sc = np.asarray(gather_scores(out, ch.end_block, ch.lane))
    got = {int(sn): int(v) for sn, v in zip(ch.seqnos, sc[0])}
    assert got[0] == 127  # saturated, flags escalation


def test_pack_stream_occupancy():
    rng = np.random.default_rng(3)
    lens = np.clip(rng.lognormal(5.8, 0.5, 20_000).astype(int), 20, 3000)
    seqs = [np.zeros(int(L), dtype=np.int8) for L in lens]
    chunks = pack_stream(seqs, nseqs=1024, max_cols=65536)
    occ = sum(c.residues for c in chunks) / sum(c.data.size for c in chunks)
    assert occ > 0.9
    # every sequence is placed exactly once
    all_ids = np.concatenate([c.seqnos for c in chunks])
    assert sorted(all_ids.tolist()) == list(range(len(seqs)))


def test_stream_lax_matches_oracle(m62):
    import jax.numpy as jnp

    from swipe_tpu.ops.sw_stream import sw_scores_stream_lax
    rng = np.random.default_rng(6)
    queries = _rand_seqs(rng, 2, 10, 50)
    seqs = _rand_seqs(rng, 300, 1, 150)
    chunks = pack_stream(seqs, nseqs=128)
    qc, ql = build_qcodes(queries, 64)
    m8 = build_matrix8(m62.matrix)
    got = np.zeros((2, len(seqs)), dtype=np.int64)
    for ch in chunks:
        out = sw_scores_stream_lax(
            jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(m8),
            jnp.asarray(ch.data), jnp.asarray(ch.start),
            gapopenextend=12, gapextend=1)
        sc = np.asarray(gather_scores(out, ch.end_block, ch.lane))
        got[:, ch.seqnos] = sc
    want = np.stack([sw_numpy_many(q, seqs, m62.matrix, 11, 1)
                     for q in queries])
    assert np.array_equal(got, want)


def test_stream_long_query_tiled(m62):
    import jax.numpy as jnp

    from swipe_tpu.ops.sw_stream import sw_scores_stream_long
    rng = np.random.default_rng(9)
    # queries longer than one tile: tile_rows=64 with qlen up to 250
    queries = [rng.integers(1, 26, size=int(L), dtype=np.int8)
               for L in (250, 40, 130)]
    seqs = _rand_seqs(rng, 1100, 1, 200)
    chunks = pack_stream(seqs, nseqs=1024)
    qc, ql = build_qcodes(queries, 256)
    m8 = build_matrix8(m62.matrix)
    got = np.zeros((3, len(seqs)), dtype=np.int64)
    for ch in chunks:
        out = sw_scores_stream_long(
            jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(m8),
            jnp.asarray(ch.data), jnp.asarray(ch.start),
            gapopenextend=12, gapextend=1, tile_rows=64, interpret=True)
        sc = np.asarray(gather_scores(out, ch.end_block, ch.lane))
        got[:, ch.seqnos] = sc
    want = np.stack([sw_numpy_many(q, seqs, m62.matrix, 11, 1)
                     for q in queries])
    assert np.array_equal(got, want)


def test_all_kernels_agree_randomized(m62):
    """Property test: stream (interpret), stream-lax, segmented-lax and the
    NumPy oracle agree on random shapes/penalties across several seeds."""
    import jax.numpy as jnp

    from swipe_tpu.batching import pack_database
    from swipe_tpu.ops.sw_pallas import build_qpt, sw_scores_lax
    from swipe_tpu.ops.sw_stream import sw_scores_stream_lax

    for seed in range(3):
        rng = np.random.default_rng(1000 + seed)
        go = int(rng.integers(5, 15))
        ge = int(rng.integers(1, 4))
        nq = int(rng.integers(1, 3))
        queries = _rand_seqs(rng, nq, 5, 80)
        seqs = _rand_seqs(rng, int(rng.integers(100, 400)), 1, 120)
        want = np.stack([sw_numpy_many(q, seqs, m62.matrix, go, ge)
                         for q in queries])
        qlen_pad = 128
        qc, ql = build_qcodes(queries, qlen_pad)
        m8 = build_matrix8(m62.matrix)

        # stream pallas (interpret) + stream lax on the lane packing
        for ch in pack_stream(seqs, nseqs=1024):
            a = sw_scores_stream(qc, ql, m8, ch.data, ch.start,
                                 gapopenextend=go + ge, gapextend=ge,
                                 interpret=True)
            b = sw_scores_stream_lax(
                jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(m8),
                jnp.asarray(ch.data), jnp.asarray(ch.start),
                gapopenextend=go + ge, gapextend=ge)
            sa = np.asarray(gather_scores(a, ch.end_block, ch.lane))
            sb = np.asarray(gather_scores(b, ch.end_block, ch.lane))
            assert np.array_equal(sa, want[:, ch.seqnos]), (seed, "stream")
            assert np.array_equal(sb, want[:, ch.seqnos]), (seed, "slax")

        # segmented lax on the segment packing
        for ch in pack_database(seqs, nseqs=16):
            qpt = build_qpt(queries, m62.matrix, qlen_pad)
            out = np.asarray(sw_scores_lax(
                qpt, ch.data, ch.seg_ids, nsegs=ch.seqnos.shape[0],
                gapopenextend=go + ge, gapextend=ge))
            for k in range(ch.seqnos.shape[0]):
                for lane in range(ch.nseqs):
                    sn = ch.seqnos[k, lane]
                    if sn >= 0:
                        assert (out[:, k, lane] == want[:, sn]).all(), seed


@pytest.mark.parametrize("qgroup", [2, 3, 5])
def test_stream_qgroup_matches_oracle(m62, qgroup):
    # query groups share one dprofile per block and co-resident state;
    # scores must be identical for any group size, including ragged tails
    rng = np.random.default_rng(40 + qgroup)
    queries = _rand_seqs(rng, 7, 10, 60)     # 7 queries: ragged vs 2/3/5
    seqs = _rand_seqs(rng, 1500, 1, 120)
    chunks = pack_stream(seqs, nseqs=1024)
    qc, ql = build_qcodes(queries, 64)
    m8 = build_matrix8(m62.matrix)
    got = np.zeros((len(queries), len(seqs)), dtype=np.int64)
    for ch in chunks:
        out = sw_scores_stream(qc, ql, m8, ch.data, ch.start,
                               gapopenextend=12, gapextend=1,
                               interpret=True, qgroup=qgroup)
        got[:, ch.seqnos] = np.asarray(
            gather_scores(out, ch.end_block, ch.lane))
    want = np.stack([sw_numpy_many(q, seqs, m62.matrix, 11, 1)
                     for q in queries])
    assert np.array_equal(got, want)


def test_stream_megacore_parallel_groups(m62, monkeypatch):
    # the megacore flag marks the group axis "parallel"; each group's
    # state is self-contained, so results must be identical (validated
    # exact on the real chip too; 2-core throughput needs v4/v5p)
    monkeypatch.setenv("SWIPE_TPU_MEGACORE", "1")
    from swipe_tpu.ops.sw_stream import is_megacore
    assert is_megacore()
    rng = np.random.default_rng(60)
    queries = _rand_seqs(rng, 5, 10, 60)
    seqs = _rand_seqs(rng, 900, 1, 120)
    ch = pack_stream(seqs, nseqs=1024)[0]
    qc, ql = build_qcodes(queries, 64)
    m8 = build_matrix8(m62.matrix)
    out = sw_scores_stream(qc, ql, m8, ch.data, ch.start,
                           gapopenextend=12, gapextend=1,
                           interpret=True, qgroup=2, megacore=True)
    got = np.asarray(gather_scores(out, ch.end_block, ch.lane))
    want = np.stack([sw_numpy_many(q, seqs, m62.matrix, 11, 1)
                     for q in queries])
    full = np.zeros_like(want)
    full[:, ch.seqnos] = got
    assert np.array_equal(full, want)


def test_pack_stream_carry_bounds_and_coverage():
    # every chunk footprint <= nseqs x max_cols regardless of member
    # length; every sequence ends exactly once; cuts at block multiples
    from swipe_tpu.batching import pack_stream_carry
    rng = np.random.default_rng(21)
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8)
            for L in [40000, 9000] + list(rng.integers(1, 300, size=500))]
    chunks = pack_stream_carry(seqs, nseqs=64, max_cols=1024)
    assert all(c.data_t.shape[1] <= 1024 for c in chunks[:-1])
    assert all(c.data_t.shape[0] == 64 for c in chunks)
    ends = np.concatenate([c.seqnos for c in chunks if len(c.seqnos)])
    assert sorted(ends.tolist()) == list(range(len(seqs)))
    # total start marks == number of sequences (each starts exactly once)
    assert sum(int(c.start.sum()) for c in chunks) == len(seqs)
    # residues conserved across pieces
    assert sum(c.residues for c in chunks) == sum(len(s) for s in seqs)


def test_stream_carry_matches_oracle(m62):
    # sequences cut across many carry chunks must score exactly like the
    # uncut oracle, through both the pallas (interpret) and lax twins
    import jax.numpy as jnp

    from swipe_tpu.batching import pack_stream_carry
    from swipe_tpu.ops.sw_stream import (make_stream_state,
                                         make_stream_state_lax,
                                         sw_scores_stream_carry,
                                         sw_scores_stream_lax_carry)
    rng = np.random.default_rng(22)
    queries = _rand_seqs(rng, 2, 20, 60)
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8)
            for L in [1500, 700] + list(rng.integers(1, 120, size=600))]
    chunks = pack_stream_carry(seqs, nseqs=1024, max_cols=256)
    assert len(chunks) >= 4   # giants must span several chunks
    want = np.stack([sw_numpy_many(q, seqs, m62.matrix, 11, 1)
                     for q in queries])
    qc, ql = build_qcodes(queries, 64)
    m8 = build_matrix8(m62.matrix)

    h, e, s = make_stream_state(2, 64, 1024)
    got = np.zeros((2, len(seqs)), dtype=np.int64)
    for ch in chunks:
        out, h, e, s = sw_scores_stream_carry(
            qc, ql, m8, ch.data, ch.start, h, e, s,
            gapopenextend=12, gapextend=1, interpret=True)
        if len(ch.seqnos):
            got[:, ch.seqnos] = np.asarray(
                gather_scores(out, ch.end_block, ch.lane))
    assert np.array_equal(got, want)

    # lax twin runs at the compact chunk width directly
    h, e, s = make_stream_state_lax(2, 64, chunks[0].nseqs)
    got = np.zeros((2, len(seqs)), dtype=np.int64)
    for ch in chunks:
        dumps, h, e, s = sw_scores_stream_lax_carry(
            jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(m8),
            jnp.asarray(ch.data), jnp.asarray(ch.start), h, e, s,
            gapopenextend=12, gapextend=1)
        if len(ch.seqnos):
            got[:, ch.seqnos] = np.asarray(
                gather_scores(dumps, ch.end_block, ch.lane))
    assert np.array_equal(got, want)


def test_stream_carry_long_matches_oracle(m62):
    # queries beyond one VMEM tile x sequences cut across carry chunks:
    # the tiled-carry kernel threads H/E row state, S, and the
    # tile-crossing diagonal plane through chunk boundaries; every
    # combination of (tile boundary, chunk cut, lane refill) must score
    # exactly like the uncut oracle
    from swipe_tpu.batching import pack_stream_carry
    from swipe_tpu.ops.sw_stream import (make_stream_state_long,
                                         sw_scores_stream_carry_long)
    rng = np.random.default_rng(29)
    # 3 tiles of 64 rows; the short query exercises rows=0 tail tiles
    queries = [rng.integers(1, 26, size=150, dtype=np.int8),
               rng.integers(1, 26, size=40, dtype=np.int8)]
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8)
            for L in [1400, 620] + list(rng.integers(1, 120, size=500))]
    chunks = pack_stream_carry(seqs, nseqs=1024, max_cols=256)
    assert len(chunks) >= 4
    want = np.stack([sw_numpy_many(q, seqs, m62.matrix, 11, 1)
                     for q in queries])
    qc, ql = build_qcodes(queries, 192)
    m8 = build_matrix8(m62.matrix)

    h, e, s, bh0c = make_stream_state_long(2, 192, 1024, tile_rows=64)
    got = np.zeros((2, len(seqs)), dtype=np.int64)
    for ch in chunks:
        out, h, e, s, bh0c = sw_scores_stream_carry_long(
            qc, ql, m8, ch.data, ch.start, h, e, s, bh0c,
            gapopenextend=12, gapextend=1, tile_rows=64, interpret=True)
        if len(ch.seqnos):
            got[:, ch.seqnos] = np.asarray(
                gather_scores(out, ch.end_block, ch.lane))
    assert np.array_equal(got, want)


def test_stream_carry_wide_matrix_lax():
    # non-int8 matrices route through build_matrix_wide + the lax twin
    import jax.numpy as jnp

    from swipe_tpu.batching import pack_stream_carry
    from swipe_tpu.matrices import ScoreMatrix
    from swipe_tpu.ops.sw_stream import (build_matrix_wide,
                                         make_stream_state_lax,
                                         sw_scores_stream_lax_carry)
    m = ScoreMatrix.nucleotide(200, -300, 400, 200)
    rng = np.random.default_rng(23)
    # nt16 codes 1..15
    queries = [rng.integers(1, 15, size=30, dtype=np.int8)]
    seqs = [rng.integers(1, 15, size=int(L), dtype=np.int8)
            for L in (900, 50, 70)]
    chunks = pack_stream_carry(seqs, nseqs=8, max_cols=256)
    want = np.stack([sw_numpy_many(q, seqs, m.matrix, 400, 200)
                     for q in queries])
    qc, ql = build_qcodes(queries, 32)
    mw = build_matrix_wide(m.matrix)
    h, e, s = make_stream_state_lax(1, 32, chunks[0].nseqs)
    got = np.zeros((1, len(seqs)), dtype=np.int64)
    for ch in chunks:
        dumps, h, e, s = sw_scores_stream_lax_carry(
            jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(mw),
            jnp.asarray(ch.data), jnp.asarray(ch.start), h, e, s,
            gapopenextend=600, gapextend=200)
        if len(ch.seqnos):
            got[:, ch.seqnos] = np.asarray(
                gather_scores(dumps, ch.end_block, ch.lane))
    assert np.array_equal(got, want)


def test_pack_stream_oversized_sequence(m62):
    # one sequence longer than max_cols becomes its own oversized chunk
    # and still scores exactly
    rng = np.random.default_rng(13)
    big = rng.integers(1, 26, size=3000, dtype=np.int8)
    seqs = [big] + _rand_seqs(rng, 200, 5, 60)
    chunks = pack_stream(seqs, nseqs=1024, max_cols=512)
    assert any(c.n_cols > 512 for c in chunks)
    qc, ql = build_qcodes([seqs[5]], 64)
    m8 = build_matrix8(m62.matrix)
    got = np.zeros(len(seqs), dtype=np.int64)
    for ch in chunks:
        out = sw_scores_stream(qc, ql, m8, ch.data, ch.start,
                               gapopenextend=12, gapextend=1,
                               interpret=True)
        got[ch.seqnos] = np.asarray(
            gather_scores(out, ch.end_block, ch.lane))[0]
    want = sw_numpy_many(seqs[5], seqs, m62.matrix, 11, 1)
    assert np.array_equal(got, want)


def test_megacore_env_override_parsing(monkeypatch):
    # the documented escape hatch must treat common falsey strings as
    # OFF ("false" used to silently enable the parallel group axis)
    from swipe_tpu.ops.sw_stream import is_megacore
    for v in ("0", "", "false", "False", "off", "no"):
        monkeypatch.setenv("SWIPE_TPU_MEGACORE", v)
        assert not is_megacore(), v
    for v in ("1", "true", "YES", "on"):
        monkeypatch.setenv("SWIPE_TPU_MEGACORE", v)
        assert is_megacore(), v


def test_stream_flow_matches_oracle(m62):
    """Flow series (pack_stream_flow): sequences cut at chunk capacity,
    continued next chunk on permuted lanes (permute_stream_state), with
    narrow drain chunks — scores must equal the NumPy oracle exactly."""
    import jax.numpy as jnp

    from swipe_tpu.batching import pack_stream_flow
    from swipe_tpu.ops.sw_stream import (make_stream_state,
                                         permute_stream_state,
                                         sw_scores_stream_carry)
    rng = np.random.default_rng(42)
    # heavy tail: forces multi-chunk cut chains and narrow drains
    lens = np.concatenate([rng.integers(5, 200, 600),
                           [900, 1400, 2000, 2600]])
    rng.shuffle(lens)
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8) for L in lens]
    queries = [rng.integers(1, 26, size=int(L), dtype=np.int8)
               for L in (37, 64)]
    chunks = pack_stream_flow(seqs, nseqs=1024, max_cols=256,
                              drain_cols=128)
    assert len(chunks) > 3          # the tail must actually chain
    qc, ql = build_qcodes(queries, 64)
    qc, ql = jnp.asarray(qc), jnp.asarray(ql)
    m8 = jnp.asarray(build_matrix8(m62.matrix))
    got = np.zeros((2, len(seqs)), dtype=np.int64)
    h = e = s = None
    for i, ch in enumerate(chunks):
        if i == 0:
            h, e, s = make_stream_state(2, 64, ch.nseqs)
        else:
            h, e, s = permute_stream_state(h, e, s,
                                           jnp.asarray(ch.carry_src))
        out, h, e, s = sw_scores_stream_carry(
            qc, ql, m8, jnp.asarray(ch.data), jnp.asarray(ch.start),
            h, e, s, gapopenextend=12, gapextend=1, interpret=True)
        if len(ch.seqnos):
            got[:, ch.seqnos] = np.asarray(
                gather_scores(out, jnp.asarray(ch.end_block),
                              jnp.asarray(ch.lane)))
    want = np.stack([sw_numpy_many(q, seqs, m62.matrix, 11, 1)
                     for q in queries])
    assert np.array_equal(got, want)


def test_stream_dprof_input_matches_oracle(m62):
    """Precomputed-dprofile path (build_dprofile_series + dprof= input):
    both the grouped and the carry kernel must equal the oracle exactly
    — the profile blocks are streamed from HBM instead of rebuilt per
    (query, block), which must not change a single score."""
    import jax.numpy as jnp

    from swipe_tpu.batching import pack_stream, pack_stream_flow
    from swipe_tpu.ops.sw_stream import (build_dprofile_series,
                                         make_stream_state,
                                         permute_stream_state,
                                         sw_scores_stream,
                                         sw_scores_stream_carry)
    rng = np.random.default_rng(21)
    lens = np.concatenate([rng.integers(5, 250, 250), [800, 1300]])
    rng.shuffle(lens)
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8) for L in lens]
    queries = [rng.integers(1, 26, size=int(L), dtype=np.int8)
               for L in (100, 57)]
    m8 = jnp.asarray(build_matrix8(m62.matrix))
    qc, ql = map(jnp.asarray, build_qcodes(queries, 128))
    want = np.stack([sw_numpy_many(q, seqs, m62.matrix, 11, 1)
                     for q in queries])

    # grouped kernel
    got = np.zeros((2, len(seqs)))
    for c in pack_stream(seqs, nseqs=1024, max_cols=4096):
        d = jnp.asarray(c.data_t).T
        dp = build_dprofile_series(m8, d, interpret=True)
        out = sw_scores_stream(qc, ql, m8, d, jnp.asarray(c.start),
                               gapopenextend=12, gapextend=1,
                               interpret=True, dprof=dp)
        got[:, c.seqnos] = np.asarray(gather_scores(
            out, jnp.asarray(c.end_block), jnp.asarray(c.lane)))
    assert np.array_equal(got, want)

    # carry kernel over a flow series (cut chains + narrow drains)
    got[:] = 0
    h = e = s = None
    chunks = pack_stream_flow(seqs, nseqs=1024, max_cols=256,
                              drain_cols=128)
    for i, ch in enumerate(chunks):
        if i == 0:
            h, e, s = make_stream_state(2, 128, ch.nseqs)
        else:
            h, e, s = permute_stream_state(h, e, s,
                                           jnp.asarray(ch.carry_src))
        d = jnp.asarray(ch.data)
        dp = build_dprofile_series(m8, d, interpret=True)
        out, h, e, s = sw_scores_stream_carry(
            qc, ql, m8, d, jnp.asarray(ch.start), h, e, s,
            gapopenextend=12, gapextend=1, interpret=True, dprof=dp)
        if len(ch.seqnos):
            got[:, ch.seqnos] = np.asarray(gather_scores(
                out, jnp.asarray(ch.end_block), jnp.asarray(ch.lane)))
    assert np.array_equal(got, want)


def test_stream_flow_matches_oracle_lax():
    """Same flow-series walk through the any-backend lax twin (3-D state
    layout through permute_stream_state)."""
    import jax.numpy as jnp

    from swipe_tpu.batching import pack_stream_flow
    from swipe_tpu.ops.sw_stream import (make_stream_state_lax,
                                         permute_stream_state,
                                         sw_scores_stream_lax_carry)
    m62 = ScoreMatrix.builtin("BLOSUM62", gapopen=11, gapextend=1)
    rng = np.random.default_rng(43)
    lens = np.concatenate([rng.integers(5, 120, 150), [700, 1100]])
    rng.shuffle(lens)
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8) for L in lens]
    q = rng.integers(1, 26, size=48, dtype=np.int8)
    chunks = pack_stream_flow(seqs, nseqs=1024, max_cols=128,
                              drain_cols=128)
    qc, ql = build_qcodes([q], 48)
    qc, ql = jnp.asarray(qc), jnp.asarray(ql)
    m8 = jnp.asarray(build_matrix8(m62.matrix))
    got = np.zeros(len(seqs), dtype=np.int64)
    h = e = s = None
    for i, ch in enumerate(chunks):
        if i == 0:
            h, e, s = make_stream_state_lax(1, 48, ch.nseqs)
        else:
            h, e, s = permute_stream_state(h, e, s,
                                           jnp.asarray(ch.carry_src))
        out, h, e, s = sw_scores_stream_lax_carry(
            qc, ql, m8, jnp.asarray(ch.data), jnp.asarray(ch.start),
            h, e, s, gapopenextend=12, gapextend=1)
        if len(ch.seqnos):
            got[ch.seqnos] = np.asarray(
                gather_scores(out, jnp.asarray(ch.end_block),
                              jnp.asarray(ch.lane)))[0]
    want = sw_numpy_many(q, seqs, m62.matrix, 11, 1)
    assert np.array_equal(got, want)


def test_stream_carry_minter_matches_oracle(m62):
    """Member-interleaved carry kernel (minter=2/4): consecutive queries
    of the batch share one pass over every chunk; scores and the carried
    state must equal the single-member walk exactly — including members
    of DIFFERENT lengths (a shorter member's overhang rows ride the PAD
    profile) and a flow series with lane permutes between chunks."""
    import jax.numpy as jnp

    from swipe_tpu.batching import pack_stream_flow
    from swipe_tpu.ops.sw_stream import (build_dprofile_series,
                                         make_stream_state,
                                         permute_stream_state,
                                         sw_scores_stream_carry)
    rng = np.random.default_rng(33)
    queries = [rng.integers(1, 26, size=int(L), dtype=np.int8)
               for L in (60, 23, 41, 64)]
    seqs = [rng.integers(1, 26, size=int(L), dtype=np.int8)
            for L in [900, 500] + list(rng.integers(1, 150, size=700))]
    chunks = pack_stream_flow(seqs, nseqs=1024, max_cols=128,
                              drain_cols=64)
    assert len(chunks) >= 3
    want = np.stack([sw_numpy_many(q, seqs, m62.matrix, 11, 1)
                     for q in queries])
    qc, ql = build_qcodes(queries, 64)
    m8 = build_matrix8(m62.matrix)

    for minter, dpdtype in ((2, None), (4, jnp.int16)):
        got = np.zeros((4, len(seqs)), dtype=np.int64)
        h = e = s = None
        for i, ch in enumerate(chunks):
            if i == 0:
                h, e, s = make_stream_state(4, 64, 1024)
            else:
                h, e, s = permute_stream_state(h, e, s,
                                               jnp.asarray(ch.carry_src))
            dp = None
            if dpdtype is not None:
                # profiles are built at the STATE's lane width (the
                # kernel PAD-expands compact chunks on device)
                from swipe_tpu.ops.sw_pallas import PAD_SYMBOL
                data = np.full((ch.n_cols, h.shape[2] * h.shape[3]),
                               PAD_SYMBOL, dtype=np.int8)
                data[:, :ch.nseqs] = ch.data
                dp = build_dprofile_series(jnp.asarray(m8),
                                           jnp.asarray(data),
                                           interpret=True, dtype=dpdtype)
            out, h, e, s = sw_scores_stream_carry(
                qc, ql, m8, ch.data, ch.start, h, e, s,
                gapopenextend=12, gapextend=1, interpret=True,
                minter=minter, dprof=dp)
            if len(ch.seqnos):
                got[:, ch.seqnos] = np.asarray(
                    gather_scores(out, ch.end_block, ch.lane))
        assert np.array_equal(got, want), f"minter={minter}"
