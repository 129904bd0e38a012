"""AV1 spec default tables: CDFs, scan orders, quantizer lookups.

The probability/quantizer constants are spec constants (AV1 §8/§7.12
defaults) extracted from the codec binaries installed in this image by
tools/extract_av1_tables.py into tables_data.npz (see that tool's
docstring for provenance and cross-validation). Scan orders are
*generated* here — the construction rules (alternating zigzag for square
transforms, fixed-direction diagonals for rectangular ones, plus
column/row scans) were verified byte-exact against libaom's tables.

Conventions: every CDF is an aom-style inverse CDF (icdf[i] = 32768 -
cumulative probability) stored as an (n+1)-slot uint16 row — n-1
descending probs, a terminal 0, and an adaptation counter initialised to
0 — exactly what models/av1/msac.py consumes.
"""

from __future__ import annotations

import functools
import os

import numpy as np

_NPZ = os.path.join(os.path.dirname(__file__), "tables_data.npz")


@functools.lru_cache(maxsize=1)
def _data():
    return dict(np.load(_NPZ))


def _cdf_rows(raw: np.ndarray, nsym: int) -> np.ndarray:
    """Trim/pad stored rows to msac layout: nsym+1 slots (probs, 0, counter)."""
    rows = np.zeros((raw.shape[0], nsym + 1), dtype=np.uint16)
    w = min(raw.shape[1], nsym - 1)
    rows[:, :w] = raw[:, :w]
    return rows


class DefaultCdfs:
    """Structured access to the default CDF tables.

    Every accessor returns a fresh, mutable copy shaped
    [...contexts..., nsym+1] so a decoder/encoder can adapt in place.
    """

    def __init__(self):
        d = _data()
        g = lambda k: d[k].astype(np.uint16)

        # ---- coefficient model (q_ctx selected by base_qindex, §8.3.2)
        self.txb_skip = _cdf_rows(g("txb_skip"), 2).reshape(4, 5, 13, 3)
        self.eob_extra = _cdf_rows(g("eob_extra"), 2).reshape(4, 5, 2, 9, 3)
        self.dc_sign = _cdf_rows(g("dc_sign"), 2).reshape(4, 2, 3, 3)
        self.coeff_base_eob = _cdf_rows(g("coeff_base_eob"), 3).reshape(4, 5, 2, 4, 4)
        self.coeff_base = _cdf_rows(g("coeff_base"), 4).reshape(4, 5, 2, 42, 5)
        self.coeff_br = _cdf_rows(g("coeff_br"), 4).reshape(4, 5, 2, 21, 5)
        # eob_pt_N: [4 qctx][2 planes][2 tx-class-2D?][nsym+1]
        self.eob_pt = {}
        for n, nsym in ((16, 5), (32, 6), (64, 7), (128, 8), (256, 9),
                        (512, 10), (1024, 11)):
            t = _cdf_rows(g(f"eob_pt_{n}"), nsym).reshape(4, 2, 2, nsym + 1)
            self.eob_pt[n] = t

        # ---- mode syntax
        self.kf_y_mode = _cdf_rows(g("kf_y_mode"), 13).reshape(5, 5, 14)
        self.y_mode = _cdf_rows(g("y_mode"), 13).reshape(4, 14)
        uv = g("uv_mode")
        self.uv_mode_nocfl = _cdf_rows(uv[:13], 13)          # [13][14]
        self.uv_mode_cfl = _cdf_rows(uv[13:], 14)            # [13][15]
        part = g("partition")
        self.partition_nsym = [4] * 4 + [10] * 12 + [8] * 4  # per context
        self.partition = _cdf_rows(part, 10)                 # [20][11]; 4/8-sym rows zero-padded
        self.skip = _cdf_rows(g("skip"), 2)                  # [3][3]
        self.skip_mode = _cdf_rows(g("skip_mode"), 2)
        self.angle_delta = _cdf_rows(g("angle_delta"), 7)    # [8][8]
        self.filter_intra_mode = _cdf_rows(g("filter_intra_mode"), 5)  # [1][6]
        self.use_filter_intra = np.zeros((22, 3), dtype=np.uint16)
        self.use_filter_intra[:, 0] = g("use_filter_intra")
        self.cfl_sign = _cdf_rows(g("cfl_sign").reshape(1, -1), 8)     # [1][9]
        self.cfl_alpha = _cdf_rows(g("cfl_alpha"), 16)       # [6][17]
        tx = g("tx_size")
        # cat0 rows are 2-symbol, cats 1-3 are 3-symbol; store in one
        # [cat][ctx][4] grid with tx_size_nsym giving the alphabet size
        self.tx_size = np.zeros((4, 3, 4), dtype=np.uint16)
        self.tx_size[0, :, :3] = _cdf_rows(tx[:3], 2)
        self.tx_size[1:] = _cdf_rows(tx[3:], 3).reshape(3, 3, 4)
        self.tx_size_nsym = [2, 3, 3, 3]
        ext1 = _cdf_rows(g("intra_ext_tx_set1"), 7).reshape(4, 13, 8)
        ext2 = _cdf_rows(g("intra_ext_tx_set2"), 5).reshape(4, 13, 6)
        self.intra_ext_tx = {1: ext1, 2: ext2}               # set -> [txs_cat][mode][n+1]
        self.seg_id = _cdf_rows(g("seg_id"), 8)              # [3][9]
        # loop-restoration bools/switch (raw region: switchable probs,
        # wiener bool, sgrproj bool — dav1d layout, see extractor)
        rr = g("restore_raw").astype(np.uint16)
        self.restore_switchable = np.zeros((1, 4), dtype=np.uint16)
        self.restore_switchable[0, :2] = rr[:2]
        self.restore_wiener = np.zeros((1, 3), dtype=np.uint16)
        self.restore_wiener[0, 0] = rr[4]
        self.restore_sgrproj = np.zeros((1, 3), dtype=np.uint16)
        self.restore_sgrproj[0, 0] = rr[6]
        self.delta_q = _cdf_rows(g("delta_q"), 4)            # [1][5]
        # delta_lf / delta_lf_multi share the delta_q default values
        self.delta_lf = _cdf_rows(g("delta_q"), 4)
        self.delta_lf_multi = np.tile(_cdf_rows(g("delta_q"), 4), (4, 1))
        self.intrabc = np.array([[int(g("intrabc")[0]), 0, 0]], dtype=np.uint16)

        # ---- palette
        self.palette_y_size = _cdf_rows(g("palette_y_size"), 7)
        self.palette_uv_size = _cdf_rows(g("palette_uv_size"), 7)
        pym = g("palette_y_mode").reshape(7, 3)
        self.palette_y_mode = np.zeros((7, 3, 3), dtype=np.uint16)
        self.palette_y_mode[:, :, 0] = pym
        puv = g("palette_uv_mode")
        self.palette_uv_mode = np.zeros((2, 3), dtype=np.uint16)
        self.palette_uv_mode[:, 0] = puv
        # color-index ladders, dict by palette size n -> [5 ctx][n+1]
        yci = g("palette_y_color_index")
        uci = g("palette_uv_color_index")
        self.palette_y_color_index = {}
        self.palette_uv_color_index = {}
        for k in range(7):
            n = k + 2
            self.palette_y_color_index[n] = _cdf_rows(yci[k * 5 : (k + 1) * 5], n)
            self.palette_uv_color_index[n] = _cdf_rows(uci[k * 5 : (k + 1) * 5], n)

    def copy(self) -> "DefaultCdfs":
        import copy as _c

        return _c.deepcopy(self)


@functools.lru_cache(maxsize=1)
def defaults() -> DefaultCdfs:
    """The immutable default set; call .copy() per frame/tile."""
    return DefaultCdfs()


# --------------------------------------------------------------- quantizer

def dc_q(qindex: int, depth: int = 8) -> int:
    """§7.12.2 dc_q: DC quantizer step for base_qindex."""
    key = {8: "dc_qlookup_8", 10: "dc_qlookup_10", 12: "dc_qlookup_12"}[depth]
    return int(_data()[key][np.clip(qindex, 0, 255)])


def ac_q(qindex: int, depth: int = 8) -> int:
    key = {8: "ac_qlookup_8", 10: "ac_qlookup_10", 12: "ac_qlookup_12"}[depth]
    return int(_data()[key][np.clip(qindex, 0, 255)])


# ------------------------------------------------------------------- scans

def _zigzag(w: int, h: int) -> list:
    """Square default scan: alternating (JPEG-style) zigzag."""
    pos = []
    for s in range(w + h - 1):
        d = [(r, s - r) for r in range(h) if 0 <= s - r < w]
        d.sort(key=lambda rc: rc[0], reverse=(s % 2 == 0))
        pos += d
    return [r * w + c for r, c in pos]


def _diag(w: int, h: int, up: bool) -> list:
    """Rectangular default scan: fixed-direction anti-diagonals."""
    pos = []
    for s in range(w + h - 1):
        d = [(r, s - r) for r in range(h) if 0 <= s - r < w]
        d.sort(key=lambda rc: rc[0], reverse=up)
        pos += d
    return [r * w + c for r, c in pos]


@functools.lru_cache(maxsize=None)
def default_scan(w: int, h: int) -> np.ndarray:
    """AV1 default (diagonal) scan for a w-wide, h-tall transform.
    Verified byte-exact against libaom's av1_default_scan tables."""
    if w == h:
        s = _zigzag(w, h)
    elif w > h:
        s = _diag(w, h, up=True)
    else:
        s = _diag(w, h, up=False)
    return np.array(s, dtype=np.int32)


@functools.lru_cache(maxsize=None)
def mcol_scan(w: int, h: int) -> np.ndarray:
    return np.array([r * w + c for c in range(w) for r in range(h)], dtype=np.int32)


@functools.lru_cache(maxsize=None)
def mrow_scan(w: int, h: int) -> np.ndarray:
    return np.arange(w * h, dtype=np.int32)


# --------------------------------------------------- quantizer matrices

# Offsets of each (w, h) <= 32x32 matrix inside one 3344-entry qm plane
# row (tx-size enum order, 64-dim sizes absent — qm never applies to them,
# spec 7.12.3 / aom av1_qm_init).
_QM_OFFSETS = {
    (4, 4): 0, (8, 8): 16, (16, 16): 80, (32, 32): 336,
    (4, 8): 1360, (8, 4): 1392, (8, 16): 1424, (16, 8): 1552,
    (16, 32): 1680, (32, 16): 2192,
    (4, 16): 2704, (16, 4): 2768, (8, 32): 2832, (32, 8): 3088,
}


@functools.lru_cache(maxsize=None)
def qm_matrix(level: int, plane_type: int, w: int, h: int):
    """Dequant weight matrix (h, w) for qm `level` (0-14; 15 = flat ->
    None) and plane type (0 luma / 1 chroma); None for 64-dim transforms.
    Source: spec Quantizer_Matrix via aom iwt_matrix_ref (extracted,
    cross-checked against dav1d's qm_tbl copies)."""
    if level >= 15 or (w, h) not in _QM_OFFSETS:
        return None
    row = _data()["qm_iq"].reshape(15, 2, 3344)[level][plane_type]
    off = _QM_OFFSETS[(w, h)]
    return row[off : off + w * h].astype(np.int64).reshape(h, w)
