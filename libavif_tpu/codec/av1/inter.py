"""AV1 inter prediction: motion compensation (§7.11.3).

Translational block prediction with the 6-set subpel filter bank,
single-reference and compound (average / distance-weighted) paths.
The reference gets all of this from dav1d behind codec_dav1d.c:58;
here it is vectorized numpy on whole blocks (edge handling via clamped
index gathers — §7.11.3.3's sample clamping replicates frame edges).

MVs are (row, col) in 1/8 luma pel. Plane coordinates are in that
plane's pixels.
"""

from __future__ import annotations

import functools

import numpy as np

from . import tables as T
from . import refs as R

FILTER_BITS = 7

# Quant_Dist lookup (§7.11.3.15)
QUANT_DIST_WEIGHT = ((2, 3), (2, 5), (2, 7))
QUANT_DIST_LOOKUP = ((9, 7), (11, 5), (12, 4), (13, 3))


@functools.lru_cache(maxsize=1)
def _filters() -> np.ndarray:
    return np.load(T._NPZ)["subpel_filters"].astype(np.int64)


def _filter_row(interp_filter: int, size: int, frac: int) -> np.ndarray:
    """§7.11.3.4 filter selection: 4-tap variants for narrow blocks
    (REGULAR→4, SMOOTH→5, SHARP falls back to the 4-tap REGULAR)."""
    idx = interp_filter
    if size <= 4:
        idx = {0: 4, 1: 5, 2: 4, 3: 3}[interp_filter]
    return _filters()[idx][frac]


def _rounding(bit_depth: int, is_compound: bool):
    r0 = 5 if bit_depth == 12 else 3
    if is_compound:
        r1 = 7
    else:
        r1 = 9 if bit_depth == 12 else 11
    return r0, r1


def _round2(x, n: int):
    return (x + (1 << (n - 1))) >> n


def _mc_raw(
    ref: np.ndarray,
    x: int,
    y: int,
    w: int,
    h: int,
    mv,
    sub_x: int,
    sub_y: int,
    filters,
    bit_depth: int,
    is_compound: bool,
):
    """One reference block: returns int64 (h, w) — final pixels for the
    single path (after InterRound1), intermediate values for compound."""
    r0, r1 = _rounding(bit_depth, is_compound)
    src_x16 = (x << 4) + int(mv[1]) * (2 >> sub_x)
    src_y16 = (y << 4) + int(mv[0]) * (2 >> sub_y)
    ix = src_x16 >> 4
    iy = src_y16 >> 4
    fx = src_x16 & 15
    fy = src_y16 & 15
    fh = _filter_row(filters[1], w, fx)  # horizontal
    fv = _filter_row(filters[0], h, fy)  # vertical
    rh, rw = ref.shape
    rows = np.clip(np.arange(iy - 3, iy + h + 4), 0, rh - 1)
    cols = np.clip(np.arange(ix - 3, ix + w + 4), 0, rw - 1)
    patch = ref[np.ix_(rows, cols)].astype(np.int64)  # (h+7, w+7)
    horiz = np.lib.stride_tricks.sliding_window_view(patch, 8, axis=1) @ fh
    horiz = _round2(horiz, r0)  # (h+7, w)
    vert = (
        np.lib.stride_tricks.sliding_window_view(horiz, 8, axis=0) @ fv
    )  # (w, h)? sliding over axis 0 keeps (h, w, 8) -> dot gives (h, w)
    return _round2(vert, r1)


def predict_single(
    ref: np.ndarray, x, y, w, h, mv, sub_x, sub_y, filters, bit_depth
) -> np.ndarray:
    out = _mc_raw(ref, x, y, w, h, mv, sub_x, sub_y, filters, bit_depth, False)
    return np.clip(out, 0, (1 << bit_depth) - 1).astype(np.int32)


def distance_weights(d, ref0: int, ref1: int):
    """§7.11.3.15: (fwd, bck) 4-bit weights from order-hint distances."""
    hdr = d.hdr
    seq = d.seq
    dist = []
    for ref in (ref0, ref1):
        h = hdr.order_hints[ref]
        dist.append(min(31, abs(R.get_relative_dist(seq, h, hdr.order_hint))))
    d0 = dist[1]
    d1 = dist[0]
    order = d0 <= d1
    if d0 == 0 or d1 == 0:
        fwd = QUANT_DIST_LOOKUP[3][0 if order else 1]
        bck = QUANT_DIST_LOOKUP[3][1 if order else 0]
        return fwd, bck
    for i in range(3):
        c0 = QUANT_DIST_WEIGHT[i][0 if order else 1]
        c1 = QUANT_DIST_WEIGHT[i][1 if order else 0]
        if order:
            if d0 * c0 <= d1 * c1:
                break
        else:
            if d1 * c0 <= d0 * c1:
                break
    else:
        i = 3
    fwd = QUANT_DIST_LOOKUP[i][0 if order else 1]
    bck = QUANT_DIST_LOOKUP[i][1 if order else 0]
    return fwd, bck


def predict_compound(
    refs: list,
    x, y, w, h,
    mvs: list,
    sub_x, sub_y,
    filters,
    bit_depth: int,
    weights,
) -> np.ndarray:
    """Two-reference prediction; `weights` is (w0, w1) summing to 16
    (8, 8 for plain averaging with compound_idx=1)."""
    p0 = _mc_raw(refs[0], x, y, w, h, mvs[0], sub_x, sub_y, filters, bit_depth, True)
    p1 = _mc_raw(refs[1], x, y, w, h, mvs[1], sub_x, sub_y, filters, bit_depth, True)
    r0, r1 = _rounding(bit_depth, True)
    post = (2 * FILTER_BITS - r0 - r1) + 4  # carry bits + 4 weight bits
    out = _round2(p0 * weights[0] + p1 * weights[1], post)
    return np.clip(out, 0, (1 << bit_depth) - 1).astype(np.int32)
