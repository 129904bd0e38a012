"""Spec inverse transforms (§7.13). Integer, stage-exact.

Currently: the lossless inverse Walsh-Hadamard (§7.13.3). The DCT/ADST
family follows as stage-exact int32 butterfly chains (next milestone);
until then lossy tx decode raises NotImplemented at the call site.
"""

from __future__ import annotations

import numpy as np


def inverse_wht4x4(dq: np.ndarray, shift: int = 2) -> np.ndarray:
    """§7.13.3: 4x4 inverse WHT; `dq` int array, input pre-shifted by
    `shift` (lossless dequant leaves a x4 factor the WHT removes)."""
    t = dq.astype(np.int64)
    out = np.zeros((4, 4), dtype=np.int64)
    # pass 1: rows
    for i in range(4):
        a = int(t[i, 0]) >> shift
        c = int(t[i, 1]) >> shift
        d = int(t[i, 2]) >> shift
        b = int(t[i, 3]) >> shift
        a += c
        d -= b
        e = (a - d) >> 1
        b = e - b
        c = e - c
        a -= b
        d += c
        out[i] = (a, b, c, d)
    # pass 2: columns
    res = np.zeros((4, 4), dtype=np.int64)
    for j in range(4):
        a = int(out[0, j])
        c = int(out[1, j])
        d = int(out[2, j])
        b = int(out[3, j])
        a += c
        d -= b
        e = (a - d) >> 1
        b = e - b
        c = e - c
        a -= b
        d += c
        res[:, j] = (a, b, c, d)
    return res.astype(np.int32)
