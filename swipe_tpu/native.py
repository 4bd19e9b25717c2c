"""ctypes bindings to the native C++ runtime (native/libswipetpu.so).

The native library currently provides the gapped aligner (region reverse pass
+ Myers-Miller traceback).  When the shared object has not been built the
pure-NumPy implementations in :mod:`swipe_tpu.align` are used instead.
Build with ``make -C native`` (see native/Makefile).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_SO_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(__file__)),
                 "native", "libswipetpu.so"),
    os.path.join(os.path.dirname(__file__), "libswipetpu.so"),
]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _SO_PATHS:
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            lib.swtpu_align.restype = ctypes.c_long
            lib.swtpu_align.argtypes = [
                ctypes.POINTER(ctypes.c_int8), ctypes.c_long,   # a, M
                ctypes.POINTER(ctypes.c_int8), ctypes.c_long,   # b, N
                ctypes.POINTER(ctypes.c_long),                  # matrix 32x32
                ctypes.c_long, ctypes.c_long,                   # q, r
                ctypes.c_long,                                  # hint flag
                ctypes.POINTER(ctypes.c_long),                  # inout coords[5]
                ctypes.c_char_p, ctypes.c_long,                 # ops buf, cap
            ]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def align(a, b, matrix, q, r, hint=None):
    """Native gapped alignment; same contract as align.align_py."""
    lib = _load()
    a8 = np.ascontiguousarray(np.asarray(a), dtype=np.int8)
    b8 = np.ascontiguousarray(np.asarray(b), dtype=np.int8)
    m64 = np.ascontiguousarray(np.asarray(matrix), dtype=np.int64).reshape(-1)
    coords = np.zeros(5, dtype=np.int64)  # score, ab, bb, ae, be
    if hint is not None:
        coords[0], coords[3], coords[4] = hint
    # op string is <= 2*(M+N): runs of "X<len>" with sum(len) <= M+N and
    # digits(len) <= len.  (The old 16x cap zeroed multi-GB buffers for
    # chromosome-scale subjects on the hint-less blastn -S 2 path.)
    cap = 2 * (len(a8) + len(b8)) + 64
    buf = ctypes.create_string_buffer(cap)
    rc = lib.swtpu_align(
        a8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), len(a8),
        b8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), len(b8),
        m64.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        q, r, 1 if hint is not None else 0,
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        buf, cap,
    )
    if rc < 0:
        raise RuntimeError("Internal error in align function.")
    return (int(coords[0]), int(coords[1]), int(coords[2]),
            int(coords[3]), int(coords[4]), buf.value.decode())
