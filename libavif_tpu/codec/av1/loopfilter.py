"""In-loop deblocking filter (AV1 §7.14), decoder side.

Frame-level reference implementation: all vertical edges of a plane are
filtered first, then all horizontal edges (using vertically-filtered
samples), exactly as the spec orders them. Edge placement derives from
the per-mi transform dims and block origins recorded during tile decode
(intra frames: every prediction edge is also a transform edge).
"""

from __future__ import annotations

import numpy as np

MAX_LOOP_FILTER = 63


def _thresholds(lvl: int, sharpness: int, bd: int):
    shift = 2 if sharpness > 4 else (1 if sharpness > 0 else 0)
    if sharpness > 0:
        limit = min(max(1, lvl >> shift), 9 - sharpness)
        limit = max(1, limit)
    else:
        limit = max(1, lvl)
    blimit = 2 * (lvl + 2) + limit
    thresh = lvl >> 4
    s = bd - 8
    return limit << s, blimit << s, thresh << s


def _clamp3(v, bd):
    lo = -(1 << (bd - 1))
    hi = (1 << (bd - 1)) - 1
    return max(lo, min(hi, v))


def _filter_edge(line, limit, blimit, thresh, size, bd):
    """Filter one 1D sample line across an edge. `line` is a list-like of
    2*7 samples [p6..p0, q0..q6] (entries may alias frame memory via the
    caller); returns the filtered samples (same length) or None."""
    F = 1 << (bd - 8)
    p = line[:7][::-1]  # p[0]=p0 ... p[6]=p6
    q = line[7:]
    # filter mask
    fm = (
        abs(p[1] - p[0]) <= limit
        and abs(q[1] - q[0]) <= limit
        and abs(p[0] - q[0]) * 2 + (abs(p[1] - q[1]) >> 1) <= blimit
    )
    if size > 4:
        fm = fm and abs(p[2] - p[1]) <= limit and abs(q[2] - q[1]) <= limit
    if size >= 8:
        fm = fm and abs(p[3] - p[2]) <= limit and abs(q[3] - q[2]) <= limit
    if not fm:
        return None
    out_p = list(p)
    out_q = list(q)
    flat8 = (
        abs(p[1] - p[0]) <= F and abs(q[1] - q[0]) <= F
        and abs(p[2] - p[0]) <= F and abs(q[2] - q[0]) <= F
    ) if size >= 6 else False
    if size >= 8:
        flat8 = flat8 and abs(p[3] - p[0]) <= F and abs(q[3] - q[0]) <= F
    flat_outer = (
        abs(p[6] - p[0]) <= F and abs(q[6] - q[0]) <= F
        and abs(p[5] - p[0]) <= F and abs(q[5] - q[0]) <= F
        and abs(p[4] - p[0]) <= F and abs(q[4] - q[0]) <= F
    ) if size == 14 else False
    if size == 14 and flat8 and flat_outer:
        p6, p5, p4, p3, p2, p1, p0 = p[6], p[5], p[4], p[3], p[2], p[1], p[0]
        q0, q1, q2, q3, q4, q5, q6 = q[0], q[1], q[2], q[3], q[4], q[5], q[6]
        out_p[5] = (p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0 + 8) >> 4
        out_p[4] = (p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0 + q1 + 8) >> 4
        out_p[3] = (p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 + q0 + q1 + q2 + 8) >> 4
        out_p[2] = (p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 + q0 + q1 + q2 + q3 + 8) >> 4
        out_p[1] = (p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 + q0 + q1 + q2 + q3 + q4 + 8) >> 4
        out_p[0] = (p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + q2 + q3 + q4 + q5 + 8) >> 4
        out_q[0] = (p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + q3 + q4 + q5 + q6 + 8) >> 4
        out_q[1] = (p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2 + q3 + q4 + q5 + q6 * 2 + 8) >> 4
        out_q[2] = (p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2 + q4 + q5 + q6 * 3 + 8) >> 4
        out_q[3] = (p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2 + q5 + q6 * 4 + 8) >> 4
        out_q[4] = (p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2 + q6 * 5 + 8) >> 4
        out_q[5] = (p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7 + 8) >> 4
    elif size >= 8 and flat8:
        p3, p2, p1, p0 = p[3], p[2], p[1], p[0]
        q0, q1, q2, q3 = q[0], q[1], q[2], q[3]
        out_p[2] = (p3 * 3 + p2 * 2 + p1 + p0 + q0 + 4) >> 3
        out_p[1] = (p3 * 2 + p2 + p1 * 2 + p0 + q0 + q1 + 4) >> 3
        out_p[0] = (p3 + p2 + p1 + p0 * 2 + q0 + q1 + q2 + 4) >> 3
        out_q[0] = (p2 + p1 + p0 + q0 * 2 + q1 + q2 + q3 + 4) >> 3
        out_q[1] = (p1 + p0 + q0 + q1 * 2 + q2 + q3 * 2 + 4) >> 3
        out_q[2] = (p0 + q0 + q1 + q2 * 2 + q3 * 3 + 4) >> 3
    elif size == 6 and flat8:
        # chroma 6-tap flat filter uses p2..q2
        p2, p1, p0 = p[2], p[1], p[0]
        q0, q1, q2 = q[0], q[1], q[2]
        out_p[1] = (p2 * 3 + p1 * 2 + p0 * 2 + q0 + 4) >> 3
        out_p[0] = (p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + 4) >> 3
        out_q[0] = (p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + 4) >> 3
        out_q[1] = (p0 + q0 * 2 + q1 * 2 + q2 * 3 + 4) >> 3
    else:
        # narrow filter4
        base = 0x80 << (bd - 8)
        ps1, ps0 = p[1] - base, p[0] - base
        qs0, qs1 = q[0] - base, q[1] - base
        hev = abs(p[1] - p[0]) > thresh or abs(q[1] - q[0]) > thresh
        f = _clamp3(ps1 - qs1, bd) if hev else 0
        f = _clamp3(f + 3 * (qs0 - ps0), bd)
        f1 = _clamp3(f + 4, bd) >> 3
        f2 = _clamp3(f + 3, bd) >> 3
        maxv = (1 << bd) - 1
        out_q[0] = max(0, min(maxv, qs0 - f1 + base))
        out_p[0] = max(0, min(maxv, ps0 + f2 + base))
        if not hev:
            f3 = (f1 + 1) >> 1
            out_q[1] = max(0, min(maxv, qs1 - f3 + base))
            out_p[1] = max(0, min(maxv, ps1 + f3 + base))
    return out_p[::-1] + out_q


def _flat_size6(p, q, F):
    return (
        abs(p[1] - p[0]) <= F and abs(q[1] - q[0]) <= F
        and abs(p[2] - p[0]) <= F and abs(q[2] - q[0]) <= F
    )


def loop_filter_frame(dec) -> None:
    """Apply the deblocking filter to all planes of a decoded frame."""
    hdr = dec.hdr
    lf = hdr.lf
    if hdr.coded_lossless or hdr.allow_intrabc:
        return
    if not any(lf.levels):
        return
    ctx = dec.ctx
    bd = dec.bd
    for plane in range(dec.n_planes):
        lvl_idx = (0, 2, 3)[plane]  # vertical-pass level index per plane
        for direction in (0, 1):  # 0 = vertical edges, 1 = horizontal
            if plane == 0:
                base_lvl = lf.levels[direction]
            else:
                base_lvl = lf.levels[2 if plane == 1 else 3]
            if base_lvl == 0 and not lf.delta_enabled:
                continue
            _filter_plane(dec, plane, direction, base_lvl, bd)


def _filter_plane(dec, plane, direction, base_lvl, bd):
    hdr = dec.hdr
    lf = hdr.lf
    ctx = dec.ctx
    sx = dec.ss_x if plane else 0
    sy = dec.ss_y if plane else 0
    frame = dec.planes[plane]
    pw = dec.cw[plane]
    ph = dec.ch[plane]
    # edges at or beyond the visible (cropped) frame are never filtered:
    # the mi grid is 8px-aligned but conformant decoders (dav1d lf_mask
    # covers ceil(w/4) units) stop at the crop, and filtering such an edge
    # would modify visible p-side samples.
    vis_w = dec.pw[plane]
    vis_h = dec.ph[plane]
    tx_w = ctx.tx_w if plane == 0 else ctx.uvtx_w
    tx_h = ctx.tx_h if plane == 0 else ctx.uvtx_h
    sharp = lf.sharpness

    lf_idx = direction if plane == 0 else plane + 1
    # SEG_LVL_ALT_LF_{Y_V,Y_H,U,V} = features 1..4
    seg_feature = (1 + direction) if plane == 0 else (plane + 3)

    def level_at(mr, mc):
        lvl = base_lvl
        if hdr.delta_lf_present:
            d = int(
                ctx.delta_lf_of[mr, mc, lf_idx if hdr.delta_lf_multi else 0]
            )
            lvl = max(0, min(MAX_LOOP_FILTER, lvl + d))
        if hdr.segmentation_enabled:
            sid = int(ctx.seg_of[mr, mc])
            if hdr.seg_feature_enabled[sid][seg_feature]:
                lvl = max(
                    0,
                    min(MAX_LOOP_FILTER, lvl + hdr.seg_feature_data[sid][seg_feature]),
                )
        if lf.delta_enabled:
            ref = int(dec.ref_frames_mi[mr, mc, 0])
            if ref <= 0:  # intra block (or intra frame)
                lvl += lf.ref_deltas[0] << (lvl >> 5)
            else:
                # mode delta slot 1 for all inter modes except GLOBALMV /
                # GLOBAL_GLOBALMV (aom mode_lf_lut)
                mode = int(ctx.y_modes[mr, mc])
                mtype = 0 if mode in (15, 23) else 1
                lvl += (lf.ref_deltas[ref] + lf.mode_deltas[mtype]) << (lvl >> 5)
        return max(0, min(MAX_LOOP_FILTER, lvl))

    step = 4
    if direction == 0:
        # vertical edges: iterate columns at 4px plane granularity
        for y in range(0, ph, step):
            mr = (y << sy) >> 2
            if mr >= hdr.mi_rows:
                break
            x = step
            while x < min(pw, vis_w):
                mc = (x << sx) >> 2
                if mc >= hdr.mi_cols:
                    break
                txw_cur = int(tx_w[mr, mc])
                if txw_cur == 0:
                    x += step
                    continue
                # edge only at tx boundaries, aligned to the block origin
                bx0 = (int(ctx.blk_c0[mr, mc]) << 2) >> sx
                if ((x - bx0) % txw_cur) != 0:
                    x += step
                    continue
                mc_prev = ((x - 1) << sx) >> 2
                txw_prev = int(tx_w[mr, mc_prev]) or txw_cur
                is_block_edge = int(ctx.blk_c0[mr, mc]) != int(ctx.blk_c0[mr, mc_prev])
                # interior-tx-edge skip shortcut applies to INTER skip
                # blocks only (aom loopfilter.c: skip_txfm && is_inter);
                # intra skip blocks still filter their interior tx edges
                skip_cur = int(ctx.skip_of[mr, mc]) and int(dec.ref_frames_mi[mr, mc, 0]) > 0
                skip_prev = int(ctx.skip_of[mr, mc_prev]) and int(dec.ref_frames_mi[mr, mc_prev, 0]) > 0
                if not is_block_edge and skip_cur and skip_prev:
                    x += step
                    continue
                lvl = level_at(mr, mc) or level_at(mr, mc_prev)
                if lvl == 0:
                    x += step
                    continue
                m = min(txw_cur, txw_prev)
                if plane == 0:
                    size = 14 if m >= 16 else (8 if m >= 8 else 4)
                else:
                    size = 6 if m >= 8 else 4
                limit, blimit, thresh = _thresholds(lvl, sharp, bd)
                for dy in range(step):
                    yy = y + dy
                    if yy >= ph:
                        break
                    seg = [int(frame[yy, max(0, x - 7 + k)]) if x - 7 + k >= 0 else int(frame[yy, 0]) for k in range(7)]
                    seg += [int(frame[yy, min(pw - 1, x + k)]) for k in range(7)]
                    outs = _filter_edge(seg, limit, blimit, thresh, size, bd)
                    if outs is None:
                        continue
                    n_mod = {4: 2, 6: 2, 8: 3, 14: 6}[size]
                    for k in range(n_mod):
                        if x - 1 - k >= 0:
                            frame[yy, x - 1 - k] = outs[6 - k]
                        if x + k < pw:
                            frame[yy, x + k] = outs[7 + k]
                x += step
    else:
        for x in range(0, pw, step):
            mc = (x << sx) >> 2
            if mc >= hdr.mi_cols:
                break
            y = step
            while y < min(ph, vis_h):
                mr = (y << sy) >> 2
                if mr >= hdr.mi_rows:
                    break
                txh_cur = int(tx_h[mr, mc])
                if txh_cur == 0:
                    y += step
                    continue
                by0 = (int(ctx.blk_r0[mr, mc]) << 2) >> sy
                if ((y - by0) % txh_cur) != 0:
                    y += step
                    continue
                mr_prev = ((y - 1) << sy) >> 2
                txh_prev = int(tx_h[mr_prev, mc]) or txh_cur
                is_block_edge = int(ctx.blk_r0[mr, mc]) != int(ctx.blk_r0[mr_prev, mc])
                skip_cur = int(ctx.skip_of[mr, mc]) and int(dec.ref_frames_mi[mr, mc, 0]) > 0
                skip_prev = int(ctx.skip_of[mr_prev, mc]) and int(dec.ref_frames_mi[mr_prev, mc, 0]) > 0
                if not is_block_edge and skip_cur and skip_prev:
                    y += step
                    continue
                lvl = level_at(mr, mc) or level_at(mr_prev, mc)
                if lvl == 0:
                    y += step
                    continue
                m = min(txh_cur, txh_prev)
                if plane == 0:
                    size = 14 if m >= 16 else (8 if m >= 8 else 4)
                else:
                    size = 6 if m >= 8 else 4
                limit, blimit, thresh = _thresholds(lvl, sharp, bd)
                for dx in range(step):
                    xx = x + dx
                    if xx >= pw:
                        break
                    seg = [int(frame[max(0, y - 7 + k), xx]) if y - 7 + k >= 0 else int(frame[0, xx]) for k in range(7)]
                    seg += [int(frame[min(ph - 1, y + k), xx]) for k in range(7)]
                    outs = _filter_edge(seg, limit, blimit, thresh, size, bd)
                    if outs is None:
                        continue
                    n_mod = {4: 2, 6: 2, 8: 3, 14: 6}[size]
                    for k in range(n_mod):
                        if y - 1 - k >= 0:
                            frame[y - 1 - k, xx] = outs[6 - k]
                        if y + k < ph:
                            frame[y + k, xx] = outs[7 + k]
                y += step
