"""Coefficient scan orders.

The codec codes transform coefficients in a diagonal zigzag (low-frequency
first), the same role as AV1's default scan tables (spec §5.11.41). The
table is generated, not copied: plain anti-diagonal order with alternating
direction, cached per transform size.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def zigzag(n: int) -> np.ndarray:
    """Scan order for an n×n block: array of (row, col) pairs, shape (n*n, 2)."""
    coords = []
    for d in range(2 * n - 1):
        diag = [(r, d - r) for r in range(max(0, d - n + 1), min(d, n - 1) + 1)]
        if d % 2 == 0:
            diag.reverse()  # even diagonals walk up-right
        coords.extend(diag)
    return np.asarray(coords, dtype=np.int32)


@functools.lru_cache(maxsize=None)
def zigzag_flat(n: int) -> np.ndarray:
    """Flattened scan: index k -> row*n + col."""
    zz = zigzag(n)
    return (zz[:, 0] * n + zz[:, 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def inverse_zigzag_flat(n: int) -> np.ndarray:
    """Inverse permutation: flat position -> scan index."""
    fwd = zigzag_flat(n)
    inv = np.empty_like(fwd)
    inv[fwd] = np.arange(n * n, dtype=np.int32)
    return inv
