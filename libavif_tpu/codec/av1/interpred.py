"""Block-level inter prediction orchestration (§7.11.3.1 predict_inter).

Writes motion-compensated predictions into the frame buffers ahead of the
residual adds. Handles single/compound references, distance weighting and
the sub-8x8 chroma composition rule (a chroma block covering several 4x4
luma blocks is predicted per covered luma block with that block's own
mv/ref/filters). Warped motion, OBMC, masked compounds and inter-intra
land in later phases and raise cleanly until then.
"""

from __future__ import annotations

import numpy as np

from ...constants import AvifError, Result
from . import blocks as B
from . import inter as MC
from . import interdec as ID
from . import refs as R


def _ref_plane(d, ref: int, plane: int) -> np.ndarray:
    if ref == R.INTRA_FRAME:
        # intrabc: the current frame's in-progress reconstruction is the
        # reference (§7.11.4; DV legality keeps reads inside the decoded
        # region on conformant streams)
        return d.planes[plane]
    slot = d.ref_planes[ref]
    if slot is None:
        raise AvifError(Result.BMFF_PARSE_FAILED, "missing reference frame")
    return slot.planes[plane]


def _predict_one(d, plane, x, y, w, h, mvs, rf, filters, compound_idx):
    """One (sub-)prediction region with explicit mv/ref/filters."""
    sx = d.ss_x if plane else 0
    sy = d.ss_y if plane else 0
    is_compound = rf[1] > R.INTRA_FRAME
    if not is_compound:
        ref = _ref_plane(d, rf[0], plane)
        return MC.predict_single(ref, x, y, w, h, mvs[0], sx, sy, filters, d.bd)
    refs = [_ref_plane(d, rf[0], plane), _ref_plane(d, rf[1], plane)]
    if compound_idx:
        weights = (8, 8)
    else:
        weights = MC.distance_weights(d, rf[0], rf[1])
    return MC.predict_compound(
        refs, x, y, w, h, mvs, sx, sy, filters, d.bd, weights
    )


def predict_inter_block(d, plane, px, py, pw, ph):
    """Write the motion-compensated prediction for one plane region of the
    current block into d.planes[plane]."""
    b = d.block
    hdr = d.hdr
    r, c, bsize = b["r"], b["c"], b["bsize"]
    rf = b["ref_frames"]

    # unsupported reconstruction tools (syntax already consumed)
    if b["motion_mode"] != ID.SIMPLE:
        raise AvifError(Result.NOT_IMPLEMENTED, "OBMC/warped motion")
    if b["compound_type"] in (ID.COMPOUND_WEDGE, ID.COMPOUND_DIFFWTD):
        raise AvifError(Result.NOT_IMPLEMENTED, "masked compound")
    if b["interintra"]:
        raise AvifError(Result.NOT_IMPLEMENTED, "inter-intra")
    if (
        b["y_mode"] in (15, 23)  # GLOBALMV / GLOBAL_GLOBALMV
        and min(B.BLOCK_DIMS[bsize]) >= 8
        and any(
            hdr.gm_type[ref] > R.TRANSLATION
            for ref in rf
            if ref > R.INTRA_FRAME
        )
    ):
        raise AvifError(Result.NOT_IMPLEMENTED, "global warp prediction")

    sx = d.ss_x if plane else 0
    sy = d.ss_y if plane else 0
    bw4, bh4 = B.w4(bsize), B.h4(bsize)
    steps_r = 2 if (plane and bh4 == 1 and sy) else 1
    steps_c = 2 if (plane and bw4 == 1 and sx) else 1
    frame = d.planes[plane]
    if steps_r == 1 and steps_c == 1:
        pred = _predict_one(
            d, plane, px, py, pw, ph, b["mvs"], rf, b["filters"], b["compound_idx"]
        )
        frame[py : py + ph, px : px + pw] = pred
        return
    # sub-8x8 chroma: the 4x4-chroma block covers up to 2x2 luma blocks
    cand_r = (r >> sy) << sy
    cand_c = (c >> sx) << sx
    some_intra = False
    for i in range(steps_r):
        for j in range(steps_c):
            # NB: intrabc blocks record INTRA_FRAME, so in intra frames
            # this is always True and chroma uses the current block's DV
            if int(d.ref_frames_mi[cand_r + i, cand_c + j, 0]) == R.INTRA_FRAME:
                some_intra = True
    if some_intra:
        pred = _predict_one(
            d, plane, px, py, pw, ph, b["mvs"], rf, b["filters"], b["compound_idx"]
        )
        frame[py : py + ph, px : px + pw] = pred
        return
    sub_h = ph // steps_r
    sub_w = pw // steps_c
    for i in range(steps_r):
        for j in range(steps_c):
            mr, mc = cand_r + i, cand_c + j
            crf = [int(d.ref_frames_mi[mr, mc, 0]), int(d.ref_frames_mi[mr, mc, 1])]
            cmvs = [
                (int(d.mvs_mi[mr, mc, 0, 0]), int(d.mvs_mi[mr, mc, 0, 1])),
                (int(d.mvs_mi[mr, mc, 1, 0]), int(d.mvs_mi[mr, mc, 1, 1])),
            ]
            cfilt = [int(d.interp_mi[mr, mc, 0]), int(d.interp_mi[mr, mc, 1])]
            cidx = int(d.compound_idx_mi[mr, mc])
            x0 = px + j * sub_w
            y0 = py + i * sub_h
            pred = _predict_one(d, plane, x0, y0, sub_w, sub_h, cmvs, crf, cfilt, cidx)
            frame[y0 : y0 + sub_h, x0 : x0 + sub_w] = pred
