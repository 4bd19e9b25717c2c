"""Alignment-endpoint hint pass (the reference's search16s equivalent).

Parity target: /root/reference/search16s.cc:297-548.  For each hit that will
be displayed, the reference runs a CDEPTH=1 16-bit kernel that, whenever the
running maximum S strictly increases after a column, records

* ``bestpos`` — the 0-based db offset of that column (i.e. the FIRST column
  at which the final maximum is attained), and
* ``bestq``  — the SMALLEST query row whose H equals S in that column
  (the i loop scans qlen-1..0 and lets smaller i overwrite).

hits_align then skips the forward region pass and starts the reverse pass
from (bestq, bestpos) — but only when ``bestq > 0`` and ``bestpos != 0``
(hits.cc:587-595), and only when the score is below SCORELIMIT_16.  These
tie-breaking semantics differ from the forward region scan (which picks the
smallest query row overall), so reproducing them is required for alignment
parity when several optimal endpoints exist.

Host-side NumPy implementation (exact: the int16 kernel cannot saturate for
scores below SCORELIMIT_16); runs once per displayed hit.
"""

from __future__ import annotations

import numpy as np

__all__ = ["hint_endpoint"]

NEG = -(1 << 40)


def hint_endpoint(qseq: np.ndarray, dseq: np.ndarray, matrix: np.ndarray,
                  gapopen: int, gapextend: int
                  ) -> tuple[int, int, int]:
    """Return (score, bestq, bestpos) with search16s tie semantics."""
    q = np.asarray(qseq, dtype=np.int64)
    d = np.asarray(dseq, dtype=np.int64)
    mat = np.asarray(matrix, dtype=np.int64).reshape(32, 32)
    Q = gapopen + gapextend
    R = gapextend
    m = len(q)
    QP = mat[q, :].T  # (32, m)

    H = np.zeros(m, dtype=np.int64)
    E = np.full(m, NEG, dtype=np.int64)
    idxR = np.arange(m, dtype=np.int64) * R
    S = 0
    bestpos = 0
    bestq = -1
    for j, dj in enumerate(d):
        P = QP[dj]
        E = np.maximum(E - R, H - Q)
        diag = np.concatenate(([0], H[:-1]))
        hnof = np.maximum(np.maximum(diag + P, E), 0)
        A = np.maximum.accumulate(hnof + idxR)
        F = np.concatenate(([NEG], A[:-1])) - Q - idxR + R
        H = np.maximum(hnof, F)
        colmax = int(H.max())
        if colmax > S:
            S = colmax
            bestpos = j
            bestq = int(np.argmax(H == S))  # smallest row attaining S
    return S, bestq, bestpos
