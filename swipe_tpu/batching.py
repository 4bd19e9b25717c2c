"""Host-side database batching: length-sorted segment packing.

TPU-native replacement for SWIPE's dynamic work structures (parity targets:
calc_chunks /root/reference/swipe.cc:441-525 and the in-kernel channel
refill machine /root/reference/search7.cc:830-957): because XLA wants
static shapes, sequences are length-sorted and packed ahead of time.

Packing model (matches swipe_tpu.ops.sw_pallas.sw_scores_segmented):

* a *segment* holds ``nseqs`` consecutive length-sorted sequences, one per
  lane, padded with PAD_SYMBOL to the segment length = the longest member
  rounded up to SEG_BLK columns;
* many segments are concatenated along the db axis into a *chunk* — one
  kernel launch — described by a block->segment map;
* chunks are capped at ``max_cols`` columns so very large databases become
  several launches (and shard naturally across devices).

Length sorting keeps co-resident lanes nearly equal in length: measured
occupancy on a Swiss-Prot-like length distribution is ~0.96.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .ops.sw_pallas import PAD_SYMBOL, SEG_BLK

__all__ = ["PackedChunk", "pack_database", "round_up"]


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class PackedChunk:
    """One packed multi-segment batch ready for the segmented SW kernel.

    data:    [L, nseqs] int8, PAD_SYMBOL-padded, L multiple of SEG_BLK
    seg_ids: [L // SEG_BLK + 1] int32 nondecreasing block->segment map
    seqnos:  [nsegs, nseqs] int64 original sequence numbers (-1 = empty lane)
    lengths: [nsegs, nseqs] int64 true lengths
    """

    data: np.ndarray
    seg_ids: np.ndarray
    seqnos: np.ndarray
    lengths: np.ndarray

    @property
    def nsegs(self) -> int:
        return self.seqnos.shape[0]

    @property
    def nseqs(self) -> int:
        return self.data.shape[1]

    @property
    def n_cols(self) -> int:
        return self.data.shape[0]

    @property
    def residues(self) -> int:
        return int(self.lengths.sum())

    @property
    def occupancy(self) -> float:
        return self.residues / (self.data.size or 1)


def pack_database(seqs: list[np.ndarray], nseqs: int = 512,
                  max_cols: int = 16384,
                  seqnos: np.ndarray | None = None) -> list[PackedChunk]:
    """Length-sort and pack sequences into segment chunks.

    ``max_cols`` caps a chunk's column count (VMEM-independent; controls
    launch granularity and device sharding units).  A single segment longer
    than max_cols still becomes its own (oversized) chunk.
    """
    if seqnos is None:
        seqnos = np.arange(len(seqs), dtype=np.int64)
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    order = np.argsort(-lens, kind="stable")  # longest first

    # split into segments of nseqs lanes
    segments = [order[i:i + nseqs] for i in range(0, len(order), nseqs)]

    chunks: list[PackedChunk] = []
    group: list[np.ndarray] = []
    group_cols = 0

    def flush():
        nonlocal group, group_cols
        if not group:
            return
        # bucket the chunk length to multiples of 512 (bounded compile-cache
        # shapes; full chunks are exactly max_cols); the padding columns
        # extend the last segment with PAD symbols
        L = round_up(group_cols, 512)
        data = np.full((L, nseqs), PAD_SYMBOL, dtype=np.int8)
        nsegs = len(group)
        # pad the segment-count axis to a power of two (few output shapes)
        nsegs_pad = 1
        while nsegs_pad < nsegs:
            nsegs_pad *= 2
        snos = np.full((nsegs_pad, nseqs), -1, dtype=np.int64)
        lengths = np.zeros((nsegs_pad, nseqs), dtype=np.int64)
        seg_ids = np.zeros(L // SEG_BLK + 1, dtype=np.int32)
        col = 0
        for k, idx in enumerate(group):
            seg_len = round_up(max(int(lens[idx].max()), 1), SEG_BLK)
            for lane, si in enumerate(idx):
                s = seqs[si]
                data[col: col + len(s), lane] = s
                snos[k, lane] = seqnos[si]
                lengths[k, lane] = len(s)
            seg_ids[col // SEG_BLK: (col + seg_len) // SEG_BLK] = k
            col += seg_len
        seg_ids[col // SEG_BLK:] = nsegs - 1
        chunks.append(PackedChunk(data, seg_ids, snos, lengths))
        group = []
        group_cols = 0

    for idx in segments:
        seg_len = round_up(max(int(lens[idx].max()), 1), SEG_BLK)
        if group and group_cols + seg_len > max_cols:
            flush()
        group.append(idx)
        group_cols += seg_len
        if group_cols >= max_cols:
            flush()
    flush()
    return chunks
