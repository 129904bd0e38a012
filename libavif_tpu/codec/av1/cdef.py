"""CDEF — constrained directional enhancement filter (AV1 §7.15).

Applied after deblocking and before loop restoration, on a copy of the
deblocked frame (all taps read pre-CDEF samples). Per 64x64 unit, a
strength index (read in the block syntax) selects primary/secondary
strengths; each non-all-skip 8x8 block is filtered along an estimated
direction. Arithmetic mirrors dav1d cdef_tmpl.c bit-exactly.
"""

from __future__ import annotations

import numpy as np

CDEF_VERY_LARGE = 0x4000

# §7.15.3 Cdef_Directions[dir][k] = (dy, dx)
CDEF_DIRECTIONS = [
    [(-1, 1), (-2, 2)],
    [(0, 1), (-1, 2)],
    [(0, 1), (0, 2)],
    [(0, 1), (1, 2)],
    [(1, 1), (2, 2)],
    [(1, 0), (2, 1)],
    [(1, 0), (2, 0)],
    [(1, 0), (2, -1)],
]

DIV_TABLE = (840, 420, 280, 210, 168, 140, 120)


def _ulog2(x: int) -> int:
    return x.bit_length() - 1


def find_dir(block: np.ndarray, bd: int):
    """§7.15.2 direction search over one 8x8 luma block. Returns
    (dir, var)."""
    px = (block.astype(np.int64) >> (bd - 8)) - 128
    i = np.arange(8).reshape(-1, 1) * np.ones((1, 8), dtype=np.int64)
    j = np.ones((8, 1), dtype=np.int64) * np.arange(8).reshape(1, -1)
    i = i.astype(np.int64)
    j = j.astype(np.int64)

    def acc(idx, nbins):
        out = np.zeros(nbins, dtype=np.int64)
        np.add.at(out, idx.ravel(), px.ravel())
        return out

    partial = [
        acc(i + j, 15),
        acc(i + (j >> 1), 11),
        acc(i, 8),
        acc(3 + i - (j >> 1), 11),
        acc(7 + i - j, 15),
        acc(3 - (i >> 1) + j, 11),
        acc(j, 8),
        acc((i >> 1) + j, 11),
    ]
    cost = [0] * 8
    cost[2] = int((partial[2] ** 2).sum()) * 105
    cost[6] = int((partial[6] ** 2).sum()) * 105
    for d in (0, 4):
        p = partial[d]
        c = int(p[7] ** 2) * 105
        for n in range(7):
            c += (int(p[n] ** 2) + int(p[14 - n] ** 2)) * DIV_TABLE[n]
        cost[d] = c
    for n in range(4):
        d = n * 2 + 1
        p = partial[d]
        c = int((p[3:8] ** 2).sum()) * 105
        for m in range(3):
            c += (int(p[m] ** 2) + int(p[10 - m] ** 2)) * DIV_TABLE[2 * m + 1]
        cost[d] = c
    best = max(range(8), key=lambda k: cost[k])
    var = (cost[best] - cost[best ^ 4]) >> 10
    return best, var


def _constrain(diff: int, threshold: int, shift: int) -> int:
    if not threshold:
        return 0
    adiff = abs(diff)
    v = min(adiff, max(0, threshold - (adiff >> shift)))
    return v if diff >= 0 else -v


def _adjust_strength(strength: int, var: int) -> int:
    if not var:
        return 0
    i = min(_ulog2(var >> 6), 12) if (var >> 6) else 0
    return (strength * (4 + i) + 8) >> 4


def _constrain_vec(diff, threshold: int, shift: int):
    if not threshold:
        return np.zeros_like(diff)
    adiff = np.abs(diff)
    v = np.minimum(adiff, np.maximum(0, threshold - (adiff >> shift)))
    return np.where(diff >= 0, v, -v)


def _filter_block(dst, src, x0, y0, w, h, pri, sec, damping, dir_, bd,
                  bounds):
    """Filter one block in-place (vectorized over the block; taps gather
    from the pre-CDEF plane, CDEF_VERY_LARGE outside the decoded area)."""
    ph, pw = bounds
    pri_tap = [4 - ((pri >> (bd - 8)) & 1), 2 + ((pri >> (bd - 8)) & 1)]
    sec_tap = [2, 1]
    pri_shift = max(0, damping - _ulog2(pri)) if pri else 0
    sec_shift = damping - _ulog2(sec) if sec else 0
    pdirs = CDEF_DIRECTIONS[dir_]
    sdirs0 = CDEF_DIRECTIONS[(dir_ + 2) & 7]
    sdirs1 = CDEF_DIRECTIONS[(dir_ + 6) & 7]

    yy = y0 + np.arange(h).reshape(h, 1)
    xx = x0 + np.arange(w).reshape(1, w)
    px = src[y0 : y0 + h, x0 : x0 + w].astype(np.int64)
    s = np.zeros((h, w), np.int64)
    mn = px.copy()
    mx = px.copy()

    def gather(dy, dx):
        gy = yy + dy
        gx = xx + dx
        ok = (gy >= 0) & (gy < ph) & (gx >= 0) & (gx < pw)
        p = src[np.clip(gy, 0, ph - 1), np.clip(gx, 0, pw - 1)].astype(np.int64)
        return np.where(ok, p, CDEF_VERY_LARGE), ok

    taps = []
    if pri:
        for k in range(2):
            dy, dx = pdirs[k]
            for sgn in (1, -1):
                taps.append((sgn * dy, sgn * dx, pri_tap[k], pri, pri_shift))
    if sec:
        for k in range(2):
            for dirs in (sdirs0, sdirs1):
                dy, dx = dirs[k]
                for sgn in (1, -1):
                    taps.append((sgn * dy, sgn * dx, sec_tap[k], sec, sec_shift))
    for dy, dx, tap, strength, shift in taps:
        p, ok = gather(dy, dx)
        s += tap * _constrain_vec(np.where(ok, p - px, 0), strength, shift)
        mn = np.where(ok, np.minimum(mn, p), mn)
        mx = np.where(ok, np.maximum(mx, p), mx)
    v = px + ((8 + s - (s < 0).astype(np.int64)) >> 4)
    dst[y0 : y0 + h, x0 : x0 + w] = np.clip(v, mn, mx).astype(dst.dtype)


def apply_cdef(dec) -> None:
    """Filter the whole frame (§7.15.1)."""
    hdr = dec.hdr
    c = hdr.cdef
    if (
        hdr.coded_lossless
        or hdr.allow_intrabc
        or not dec.seq.enable_cdef
        or (
            not any(c.y_pri)
            and not any(c.y_sec)
            and not any(c.uv_pri)
            and not any(c.uv_sec)
        )
    ):
        return
    bd = dec.bd
    ctx = dec.ctx
    mi_rows, mi_cols = hdr.mi_rows, hdr.mi_cols
    sources = [p.copy() for p in dec.planes]
    # luma direction/variance per 8x8 computed from the pre-CDEF luma
    for ur in range(0, mi_rows, 16):
        for uc in range(0, mi_cols, 16):
            idx = int(dec.cdef_idx[ur, uc])
            if idx < 0:
                continue  # entirely-skip 64x64 unit: never coded
            for plane in range(dec.n_planes):
                sx = dec.ss_x if plane else 0
                sy = dec.ss_y if plane else 0
                if plane == 0:
                    pri0 = c.y_pri[idx] << (bd - 8)
                    sec0 = c.y_sec[idx] << (bd - 8)
                    damping = c.damping
                else:
                    pri0 = c.uv_pri[idx] << (bd - 8)
                    sec0 = c.uv_sec[idx] << (bd - 8)
                    damping = c.damping - 1
                if not pri0 and not sec0:
                    continue
                step4 = 2 << (0 if plane == 0 else 0)  # 8x8 luma blocks
                for br in range(ur, min(ur + 16, mi_rows), 2):
                    for bc in range(uc, min(uc + 16, mi_cols), 2):
                        # all-skip 8x8 -> unfiltered
                        r1 = min(br + 2, mi_rows)
                        c1 = min(bc + 2, mi_cols)
                        if ctx.skip_of[br:r1, bc:c1].all():
                            continue
                        dir_ = 0
                        var = 0
                        pri = pri0
                        if pri0:
                            ly, lx = br * 4, bc * 4
                            blk = sources[0][ly : ly + 8, lx : lx + 8]
                            if blk.shape == (8, 8):
                                dir_, var = find_dir(blk, bd)
                            if plane == 0:
                                pri = _adjust_strength(pri0, var)
                            else:
                                if dec.ss_x and not dec.ss_y:
                                    dir_ = (7, 0, 2, 4, 5, 6, 6, 6)[dir_]
                                elif dec.ss_y and not dec.ss_x:
                                    dir_ = (1, 2, 2, 2, 3, 4, 6, 0)[dir_]
                        if not pri and not sec0:
                            continue
                        x0 = (bc * 4) >> sx
                        y0 = (br * 4) >> sy
                        w = 8 >> sx
                        h = 8 >> sy
                        _filter_block(
                            dec.planes[plane], sources[plane],
                            x0, y0, w, h, pri, sec0, damping, dir_, bd,
                            (dec.ch[plane], dec.cw[plane]),
                        )
