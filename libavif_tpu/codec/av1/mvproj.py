"""Temporal motion-field projection (§7.9 motion_field_estimation).

Projects stored reference-frame motion onto the current frame's 8x8 grid
so find_mv_stack can add temporal candidates when use_ref_frame_mvs=1.
The reference store keeps per-8x8 condensed (mv, ref) pairs saved at
frame completion (§7.20; decode.py finish_motion_field).

Source priority and first-write-wins overwrite semantics follow the
spec's fixed processing order (LAST, BWDREF, ALTREF2, ALTREF, LAST2 with
the MFMV_STACK_SIZE budget); validated against dav1d on ref-frame-mvs
probe streams.
"""

from __future__ import annotations

import numpy as np

from . import refs as R

MAX_FRAME_DISTANCE = 31
MAX_OFFSET_WIDTH = 8
MAX_OFFSET_HEIGHT = 0
MFMV_STACK_SIZE = 3
INVALID = (1 << 15) - 1

# Div_Mult[d] = round(2^14 / d) (spec table)
DIV_MULT = (
    0, 16384, 8192, 5461, 4096, 3276, 2730, 2340, 2048, 1820, 1638, 1489,
    1365, 1260, 1170, 1092, 1024, 963, 910, 862, 819, 780, 744, 712, 682,
    655, 630, 606, 585, 564, 546, 528,
)


def _round2_signed(v: int, n: int) -> int:
    if v >= 0:
        return (v + (1 << (n - 1))) >> n
    return -((-v + (1 << (n - 1))) >> n)


def _mv_projection(mv, num: int, den: int):
    """§7.9.3 get_mv_projection."""
    den = min(MAX_FRAME_DISTANCE, den)
    num = max(-MAX_FRAME_DISTANCE, min(MAX_FRAME_DISTANCE, num))
    out = []
    for comp in mv:
        v = _round2_signed(int(comp) * num * DIV_MULT[den], 14)
        out.append(max(-(1 << 14) + 1, min((1 << 14) - 1, v)))
    return out


def _get_block_position(x8: int, y8: int, dst_sign: int, proj_mv, w8: int, h8: int):
    """§7.9.4 get_block_position."""
    pos_y8 = y8 + dst_sign * (proj_mv[0] >> 6)
    pos_x8 = x8 + dst_sign * (proj_mv[1] >> 6)
    if pos_y8 < 0 or pos_y8 >= h8 or pos_x8 < 0 or pos_x8 >= w8:
        return None
    # row band limit: the projected row must stay within the source row's
    # 64px superblock band (MAX_OFFSET_HEIGHT = 0 extension)
    if pos_y8 < (y8 & ~7) - (MAX_OFFSET_HEIGHT >> 3) or pos_y8 >= (
        (y8 & ~7) + 8 + (MAX_OFFSET_HEIGHT >> 3)
    ):
        return None
    if abs(pos_x8 - x8) > MAX_OFFSET_WIDTH:
        return None
    return pos_y8, pos_x8


def _project_source(d, out, written, src_ref: int, dst_sign: int) -> bool:
    """One source frame's projection pass (§7.9.2). Returns True if the
    source was usable."""
    hdr = d.hdr
    seq = d.seq
    slot = d.ref_planes[src_ref]
    if slot is None or slot.mvs is None or slot.ref_frames is None:
        return False
    if slot.mi_rows != hdr.mi_rows or slot.mi_cols != hdr.mi_cols:
        return False
    if slot.frame_type in (R.KEY_FRAME, R.INTRA_ONLY_FRAME):
        return False
    start_hint = hdr.order_hints[src_ref]
    src_to_cur = R.get_relative_dist(seq, start_hint, hdr.order_hint)
    if abs(src_to_cur) > MAX_FRAME_DISTANCE:
        return False
    h8 = hdr.mi_rows >> 1
    w8 = hdr.mi_cols >> 1
    saved_hints = slot.order_hints  # the source's own view of its refs
    mvs = slot.mvs  # (h8, w8, 2) condensed
    refs = slot.ref_frames  # (h8, w8) condensed
    for y8 in range(h8):
        for x8 in range(w8):
            sref = int(refs[y8, x8])
            if sref < R.LAST_FRAME:
                continue
            ref_to_start = R.get_relative_dist(
                seq, start_hint, int(saved_hints[sref])
            )
            if ref_to_start <= 0 or ref_to_start > MAX_FRAME_DISTANCE:
                continue
            mv = (int(mvs[y8, x8, 0]), int(mvs[y8, x8, 1]))
            proj = _mv_projection(mv, src_to_cur, ref_to_start)
            pos = _get_block_position(x8, y8, dst_sign, proj, w8, h8)
            if pos is None:
                continue
            py8, px8 = pos
            if written[py8, px8]:
                continue  # first-write-wins across sources
            written[py8, px8] = True
            for dst in range(R.LAST_FRAME, R.ALTREF_FRAME + 1):
                d2 = R.get_relative_dist(
                    seq, hdr.order_hints[dst], hdr.order_hint
                )
                pmv = _mv_projection(mv, d2, ref_to_start)
                out[dst][py8, px8, 0] = pmv[0]
                out[dst][py8, px8, 1] = pmv[1]
    return True


def motion_field_estimation(d) -> dict:
    """Returns {ref_frame: (h8, w8, 2) int32} with INVALID sentinels."""
    hdr = d.hdr
    seq = d.seq
    h8 = hdr.mi_rows >> 1
    w8 = hdr.mi_cols >> 1
    out = {
        ref: np.full((h8, w8, 2), INVALID, dtype=np.int32)
        for ref in range(R.LAST_FRAME, R.ALTREF_FRAME + 1)
    }
    written = np.zeros((h8, w8), dtype=bool)

    last_slot = d.ref_planes[R.LAST_FRAME]
    use_last = True
    if last_slot is not None and last_slot.order_hints is not None:
        last_alt_hint = int(last_slot.order_hints[R.ALTREF_FRAME])
        use_last = last_alt_hint != hdr.order_hints[R.GOLDEN_FRAME]
    if use_last:
        _project_source(d, out, written, R.LAST_FRAME, -1)
    ref_stamp = MFMV_STACK_SIZE - 2
    if R.get_relative_dist(seq, hdr.order_hints[R.BWDREF_FRAME], hdr.order_hint) > 0:
        if _project_source(d, out, written, R.BWDREF_FRAME, 1):
            ref_stamp -= 1
    if R.get_relative_dist(seq, hdr.order_hints[R.ALTREF2_FRAME], hdr.order_hint) > 0:
        if _project_source(d, out, written, R.ALTREF2_FRAME, 1):
            ref_stamp -= 1
    if (
        R.get_relative_dist(seq, hdr.order_hints[R.ALTREF_FRAME], hdr.order_hint) > 0
        and ref_stamp >= 0
    ):
        if _project_source(d, out, written, R.ALTREF_FRAME, 1):
            ref_stamp -= 1
    if ref_stamp >= 0:
        _project_source(d, out, written, R.LAST2_FRAME, -1)
    return out
