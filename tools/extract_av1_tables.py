"""Extract the AV1 spec's default probability/quantizer constants from the
codec libraries installed in this image, into
libavif_tpu/codec/av1/tables_data.npz.

Why extraction: these are *specification constants* (AV1 §8.x default CDF
tables, §7.12 quantizer lookups) required bit-exactly by every conformant
AV1 codec. The reference (libavif) contains no codec and hence none of
these tables; the system libaom (libaom.so.3) and the dav1d statically
linked into Pillow's bundled libavif carry independent copies. We locate
each table structurally — an N-symbol CDF row is stored as N-1
monotonically non-increasing inverse-CDF uint16 probs followed by a zero
terminator and a zero adaptation counter — anchored by an 8-value
fingerprint, validate the full shape, and cross-check values between the
two independent copies where both exist.

Storage convention in the npz: aom-style inverse CDFs (icdf = 32768 -
cumulative_prob), one row per context, trimmed to `width` u16 slots as
found in the binary. Consumers slice/convert as needed (tables.py).

Run:  python tools/extract_av1_tables.py
"""

import glob
import os
import subprocess
import sys
import tempfile

import numpy as np

OUT = os.path.join(
    os.path.dirname(__file__), "..", "libavif_tpu", "codec", "av1", "tables_data.npz"
)


def rodata(path):
    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        subprocess.run(
            ["objcopy", "-O", "binary", "--only-section=.rodata", path, f.name],
            check=True,
        )
        return np.fromfile(f.name, dtype="<u2").astype(np.int64)


def find_aom():
    for p in ("/usr/lib/x86_64-linux-gnu/libaom.so.3", "/usr/lib/libaom.so.3"):
        if os.path.exists(p):
            return p
    raise FileNotFoundError("libaom.so.3")


def find_bundled_avif():
    import PIL

    hits = sorted(
        glob.glob(os.path.join(os.path.dirname(PIL.__file__), "../pillow.libs/libavif*.so*"))
    )
    if not hits:
        raise FileNotFoundError("pillow bundled libavif")
    return hits[0]


# ----------------------------------------------------------------- manifest
# (name, source, shape_rows [(n_rows, nsym), ...], width_u16, fingerprint)
# source 'A' = libaom.so.3 .rodata, 'B' = bundled libavif .rodata (dav1d).
# Fingerprints are the first 8 u16 of the table as stored (spec constants).
MANIFEST = [
    ("coeff_base_eob", "A", [(4 * 5 * 2 * 4, 3)], 4, [14931, 3713, 0, 0, 3168, 1322, 0, 0]),
    ("coeff_base", "A", [(4 * 5 * 2 * 42, 4)], 5, [28734, 23838, 20041, 0, 0, 14686, 3027, 891]),
    ("coeff_br", "A", [(4 * 5 * 2 * 21, 4)], 5, [18470, 12050, 8594, 0, 0, 20232, 13167, 8979]),
    ("eob_pt_1024", "A", [(16, 11)], 12, [32375, 32347, 32017, 31145, 29608, 26416, 19423, 14721]),
    ("eob_pt_512", "A", [(16, 10)], 11, [32127, 31785, 29061, 27338, 22534, 17810, 13980, 9356]),
    ("eob_pt_256", "A", [(16, 9)], 10, [32458, 32184, 30881, 29179, 26600, 24157, 21416, 17116]),
    ("eob_pt_128", "A", [(16, 8)], 9, [32549, 32286, 31628, 30677, 29088, 26740, 20182, 0]),
    ("eob_pt_64", "A", [(16, 7)], 8, [32439, 32270, 31667, 30984, 29503, 25010, 0, 0]),
    ("eob_pt_32", "A", [(16, 6)], 7, [32368, 32248, 31791, 30666, 26226, 0, 0, 32558]),
    ("eob_pt_16", "A", [(16, 5)], 6, [31928, 31729, 30788, 27873, 0, 0, 32398, 32097]),
    ("eob_extra", "A", [(4 * 5 * 2 * 9, 2)], 3, [15807, 0, 0, 15545, 0, 0, 25147, 0]),
    ("txb_skip", "A", [(4 * 5 * 13, 2)], 3, [919, 0, 0, 26876, 0, 0, 20656, 0]),
    ("dc_sign", "A", [(4 * 2 * 3, 2)], 3, [16768, 0, 0, 19712, 0, 0, 13952, 0]),
    # [3 sets][4 tx-size cats][13 intra modes]; set0 dummy-uniform (16 sym),
    # set1 7 symbols, set2 5 symbols. Fingerprint is all-zero (set0 row0 is
    # zeroed in the binary), so anchor on set1's first row instead.
    ("intra_ext_tx_set1", "A", [(52, 7)], 17, [31233, 24733, 23307, 20017, 9301, 4943, 0, 0]),
    ("intra_ext_tx_set2", "A", [(52, 5)], 17, [26214, 19661, 13107, 6554, 0, 0, 0, 0]),
    ("partition", "A", [(4, 4), (12, 10), (4, 8)], 11, [13636, 7258, 2376, 0, 0, 0, 0, 0]),
    ("uv_mode", "A", [(13, 13), (13, 14)], 15, [10137, 8616, 7390, 7107, 6782, 6248, 5713, 4845]),
    ("kf_y_mode", "A", [(25, 13)], 14, [17180, 15741, 13430, 12550, 12086, 11658, 10943, 9524]),
    ("palette_y_size", "A", [(7, 7)], 8, [24816, 19768, 14619, 11290, 7241, 3527, 0, 0]),
    ("palette_uv_size", "A", [(7, 7)], 8, [24055, 12789, 5640, 3159, 1437, 496, 0, 0]),
    # color-index ladders [7 sizes][5 ctx] in CDF_SIZE(8) storage: group k
    # holds (k+2)-symbol rows (padding zeros beyond). aom keeps uv before y.
    ("palette_y_color_index", "A",
     [(5, 2), (5, 3), (5, 4), (5, 5), (5, 6), (5, 7), (5, 8)], 9,
     [4058, 0, 0, 0, 0, 0, 0, 0]),
    ("palette_uv_color_index", "A",
     [(5, 2), (5, 3), (5, 4), (5, 5), (5, 6), (5, 7), (5, 8)], 9,
     [3679, 0, 0, 0, 0, 0, 0, 0]),
    ("angle_delta", "A", [(8, 7)], 8, [30588, 27736, 25201, 9992, 5779, 2551, 0, 0]),
    # spatial segment-id prediction [3 ctx][8 segments]
    ("seg_id", "A", [(3, 8)], 8, [27146, 24875, 16675, 14535, 4959, 4395, 235, 0]),
    ("y_mode", "A", [(4, 13)], 14, [9967, 9279, 8475, 8012, 7167, 6645, 6162, 5350]),
    ("skip_mode", "A", [(3, 2)], 3, [147, 0, 0, 12060, 0, 0, 24641, 0]),
    ("skip", "A", [(3, 2)], 3, [1097, 0, 0, 16253, 0, 0, 28192, 0]),
    ("tx_size", "A", [(3, 2), (9, 3)], 4, [12800, 0, 0, 0, 12800, 0, 0, 0]),
    ("delta_q", "A", [(1, 4)], 5, [4608, 648, 91, 0, 0, 4608, 648, 91]),
    # dav1d side (bundled libavif): tables whose aom 3.6 layout is irregular.
    ("cfl_alpha", "B", [(6, 16)], 16, [25131, 12049, 1367, 287, 111, 80, 76, 72]),
    ("cfl_sign", "B", [(1, 8)], 8, [31350, 30645, 19428, 14363, 5796, 4425, 474, 0]),
    ("filter_intra_mode", "B", [(1, 5)], 8, [23819, 19992, 15557, 3210, 0, 0, 0, 0]),
]

# raw byte-region extractions (layout documented in tables.py)
RAW_REGIONS = [
    # intrabc DV (nmv) defaults: joints[3 probs], then per-component
    # classes[10], class0_fp[2][3], fp[3], sign/class0/classN bools, bits[10],
    # class0_hp/hp — aom layout at this block, two components sequential.
    ("dv_block", "A", [28672, 21504, 13440, 0, 0, 4096, 1792, 910], 288),
    # dav1d palette color_map ladders: [y|uv][sizes 2..8][5 ctx], stride-2
    # bool rows for size 2, aligned 16-byte rows for sizes 3..8.
    ("pal_color_raw", "B", [0, 0, 0, 0, 5732, 0, 0, 0], 1088),
    # loop-restoration: switchable_restore[2 probs] pad, wiener bool, sgr bool
    ("restore_raw", "B", [23355, 10187, 0, 0, 21198, 0, 15913, 0], 16),
]

# single bools recorded directly (value verified in both copies/spec)
SCALARS = {
    "intrabc": 2237,  # icdf(30531)
    # default_palette_uv_mode_cdf = { AOM_CDF2(32461), AOM_CDF2(21488) }
    # (verified: follows pal_y in dav1d's stride-2 CdfModeContext copy)
    "palette_uv_mode": [307, 11280],
    # use_filter_intra in aom BLOCK_SIZES_ALL order (multiset-validated
    # against dav1d's descending-block-size copy)
    "use_filter_intra": [
        28147, 26025, 26875, 24902, 20217, 23374, 20360, 18467, 20012, 10425,
        16384, 16384, 16384, 16384, 16384, 16384, 19998, 22400, 12539, 14667,
        16384, 16384,
    ],
}

# palette_y_mode: 21 bools ([7 bsize ctx][3 ctx]) from the dav1d stride-2
# copy; pal_y[0] = AOM_CDF2(31676)/(3419)/(1261) -> icdf 1092/29349/31507
PALETTE_Y_MODE_FP = [1092, 0, 29349, 0, 31507, 0, 856, 0]


def u16pat(vals):
    return np.array(vals, dtype="<u2").tobytes()


def find_fp(U, fp):
    hits = []
    hay = U.astype("<u2").tobytes()
    pat = u16pat(fp)
    i = hay.find(pat)
    while i >= 0:
        if i % 2 == 0:
            hits.append(i // 2)
        i = hay.find(pat, i + 1)
    return hits


def valid_row(U, off, nsym, width, last=False):
    row = U[off : off + width]
    if len(row) < width:
        return False
    probs = row[: nsym - 1]
    if probs[0] <= 0 or probs[0] >= 32768:
        return False
    if np.any(np.diff(probs) > 0) or probs[-1] == 0:
        return False
    if last:
        # some builds elide the final row's trailing zero slots when the
        # next object packs tightly; probs alone suffice there
        return True
    return not np.any(row[nsym - 1 : width] != 0)


def extract_table(U, name, shapes, width, fp):
    hits = find_fp(U, fp)
    total_span = sum(r for r, _ in shapes) * width
    # repeated-pattern tables (e.g. dc_sign repeats per qctx) self-hit
    # inside their own span; only hits outside the first table's span are
    # genuine ambiguity.
    if hits and all(h - hits[0] < total_span for h in hits):
        hits = hits[:1]
    elif len(hits) > 1 and all(
        np.array_equal(U[h : h + total_span], U[hits[0] : hits[0] + total_span])
        for h in hits
    ):
        # identical content at every hit (e.g. delta_q == delta_lf defaults)
        hits = hits[:1]
    if len(hits) != 1:
        raise RuntimeError(f"{name}: fingerprint hits={len(hits)} (need 1)")
    off = hits[0]
    total = sum(r for r, _ in shapes)
    o = off
    seen = 0
    for n_rows, nsym in shapes:
        for _ in range(n_rows):
            seen += 1
            if not valid_row(U, o, nsym, width, last=(seen == total)):
                raise RuntimeError(f"{name}: invalid row at u16 off {o}")
            o += width
    out = U[off : off + total * width].copy()
    # zero any tail slots borrowed from the next object (elided padding)
    last_nsym = shapes[-1][1]
    out[(total - 1) * width + last_nsym - 1 :] = 0
    return out.reshape(total, width).astype(np.uint16)


def extract_quant(U):
    """Locate the six 256-entry quantizer lookups: monotone non-decreasing,
    start at 4, assigned by terminal magnitude (dc8<ac8<dc10<ac10<dc12<ac12)."""
    blocks = []
    idx = np.where(U == 4)[0]
    for i in idx:
        w = U[i : i + 256]
        if len(w) == 256 and w[0] == 4 and np.all(np.diff(w) >= 0) and w[-1] > 1000:
            if not any(abs(i - b[0]) < 256 for b in blocks):
                blocks.append((i, int(w[-1])))
    if len(blocks) != 6:
        raise RuntimeError(f"quant lookups: found {len(blocks)} blocks, need 6")
    blocks.sort(key=lambda b: b[1])
    names = ["dc_qlookup_8", "ac_qlookup_8", "dc_qlookup_10", "ac_qlookup_10",
             "dc_qlookup_12", "ac_qlookup_12"]
    out = {}
    for (i, last), nm in zip(blocks, names):
        out[nm] = U[i : i + 256].astype(np.uint16)
    # sanity: the classic 8-bit endpoints
    assert out["dc_qlookup_8"][-1] == 1336 and out["ac_qlookup_8"][-1] == 1828
    return out


# --------------------------------------------------------------- phase 2
# Inter-prediction constants (reference-frame / MV / compound / motion-mode
# CDFs, subpel + warp filters). Primary source: dav1d's CdfModeContext blob
# in the bundled libavif (one contiguous struct; member offsets below were
# mapped by value-walking the blob and verified against libaom's independent
# copies of the same spec constants). dav1d stores bool rows as [icdf, count]
# (stride 2) and n-symbol rows padded to 4/8/16 u16.

# aom BLOCK_SIZES_ALL index -> dav1d descending-size index, for per-block
# tables (motion_mode/obmc) carved from the dav1d blob.
# dav1d order: 128x128,128x64,64x128,64x64,64x32,64x16,32x64,32x32,32x16,
#              32x8,16x64,16x32,16x16,16x8,16x4,8x32,8x16,8x8,8x4,4x16,4x8,4x4
# aom order:   4x4,4x8,8x4,8x8,8x16,16x8,16x16,16x32,32x16,32x32,32x64,64x32,
#              64x64,64x128,128x64,128x128,4x16,16x4,8x32,32x8,16x64,64x16
_AOM_TO_DAV1D_BS = [21, 20, 18, 17, 16, 13, 12, 11, 8, 7, 6, 4, 3, 2, 1, 0,
                    19, 14, 15, 9, 10, 5]


def _bools(seq, n, off):
    """n bool rows (stride 2) from a dav1d blob at u16 offset off -> probs."""
    vals = [32768 - int(seq[off + 2 * i]) for i in range(n)]
    return np.array(vals, dtype=np.uint16), off + 2 * n


def extract_gaussian(B, tables):
    """gaussian_sequence (§7.18.3.1 / §7.18.3.3): int16[2048] of zero-mean
    ~std-512 Gaussian samples rounded to multiples of 4 and clipped to
    ±2048, used by film grain synthesis. The system libaom carries no
    int16 copy (its grain path stores a transformed representation), so
    this comes from the dav1d copy, anchored by the spec's opening values
    and validated against every structural property the spec states."""
    Bi = B.copy()
    Bi[Bi >= 32768] -= 65536
    head = [56, 568, -180, 172, 124, -84, 172, -64]
    hits = [
        i
        for i in np.where(Bi[: len(Bi) - 2048] == head[0])[0]
        if Bi[i : i + 8].tolist() == head
    ]
    if len(hits) != 1:
        raise RuntimeError(f"gaussian_sequence anchor hits={len(hits)}")
    g = Bi[hits[0] : hits[0] + 2048]
    if not ((g % 4 == 0).all() and np.abs(g).max() <= 2048):
        raise RuntimeError("gaussian_sequence range/granularity check failed")
    if not (500 < g.std() < 525 and abs(g.mean()) < 5):
        raise RuntimeError(f"gaussian_sequence stats off: std={g.std():.1f}")
    tables["gaussian_sequence"] = g.astype(np.int16)
    print(f"{'gaussian_sequence':20s} [2048] extracted (std={g.std():.1f})")


def extract_inter(A, Bd, tables):
    anchor = find_fp(Bd, [8733, 0, 16138, 0, 17429, 0])
    if len(anchor) != 1:
        raise RuntimeError(f"dav1d newmv anchor hits={len(anchor)}")
    N = anchor[0]
    o = N
    for name, n in (("newmv", 6), ("globalmv", 2), ("refmv", 6), ("drl", 3),
                    ("intra_inter", 4), ("comp_inter", 5), ("comp_ref_type", 5),
                    ("compound_idx", 6), ("comp_group_idx", 6),
                    ("compound_type9", 9)):
        tables[name], o = _bools(Bd, n, o)
    # single_ref: dav1d ref[6 bits][3 ctx] -> aom [3 ctx][6 bits]
    sr, o = _bools(Bd, 18, o)
    tables["single_ref"] = sr.reshape(6, 3).T.copy()
    cr, o = _bools(Bd, 9, o)
    tables["comp_ref"] = cr.reshape(3, 3).T.copy()
    cb, o = _bools(Bd, 6, o)
    tables["comp_bwdref"] = cb.reshape(2, 3).T.copy()
    cu, o = _bools(Bd, 9, o)
    tables["uni_comp_ref"] = cu.reshape(3, 3).T.copy()
    # interintra: dav1d keeps 7 slots (leading unused 16384s); spec wants
    # [BLOCK_SIZE_GROUPS=4] = {16384, 26887, 27597, 30237}
    ii, o = _bools(Bd, 7, o)
    tables["interintra"] = ii[3:7].copy()
    if list(tables["interintra"]) != [16384, 26887, 27597, 30237]:
        raise RuntimeError(f"interintra defaults unexpected: {tables['interintra']}")
    o += 6  # 3 zero pad rows
    wii, o = _bools(Bd, 7, o)  # descending: 32x32..8x8
    tables["wedge_interintra7"] = wii[::-1].copy()  # ascending 8x8..32x32
    # obmc: dav1d [22] descending with 0 rows for unused sizes
    ob, o = _bools(Bd, 22, o)
    obmc = np.full(22, 16384, dtype=np.uint16)
    for ai, di in enumerate(_AOM_TO_DAV1D_BS):
        if ob[di] != 32768:  # raw 0 -> "prob" 32768 == unused
            obmc[ai] = ob[di]
    tables["obmc"] = obmc
    # motion_mode [22][CDF3] @ N-94 (rows padded to 4), dav1d descending
    mm = Bd[N - 94 : N - 94 + 88].reshape(22, 4)
    motion = np.zeros((22, 4), dtype=np.uint16)
    uni3 = np.array([21845, 10923, 0, 0], dtype=np.uint16)
    for ai, di in enumerate(_AOM_TO_DAV1D_BS):
        row = mm[di]
        motion[ai] = uni3 if row[0] == 0 else row.astype(np.uint16)
    tables["motion_mode"] = motion
    # interintra_mode [4][CDF4] @ N-110
    iim = Bd[N - 110 : N - 110 + 16].reshape(4, 4)
    out = np.zeros((4, 5), dtype=np.uint16)
    out[:, :3] = iim[:, :3]
    tables["interintra_mode"] = out
    # switchable_interp [16][CDF3] @ N-174 (dav1d filter[2][8], rows pad 4)
    si = Bd[N - 174 : N - 174 + 64].reshape(16, 4).astype(np.uint16)
    if si[0, 0] != 833 or si[0, 1] != 48:
        raise RuntimeError("switchable_interp anchor mismatch")
    si[:, 2:] = 0
    tables["switchable_interp"] = si
    # skip_mode sanity (already extracted): dav1d copy at N-6
    if int(Bd[N - 6]) != 147:
        raise RuntimeError("skip_mode neighbour mismatch")
    # segment_pred: no non-trivial default located in either binary; the
    # spec default is the uninformative prior.
    tables["seg_pred"] = np.full(3, 16384, dtype=np.uint16)

    # ---- aom-side multi-symbol tables
    # wedge_idx: aom default_wedge_idx_cdf is [BLOCK_SIZES_ALL=22][CDF16]
    # with non-uniform rows only at the wedge-capable sizes — indices
    # 3..9 (8x8..32x32) and 18/19 (8x32/32x8); everything else uniform.
    # The fingerprint is the FIRST real row = 8x8 (index 3). Store the 9
    # wedge-capable rows in WEDGE_BSIZES order (masks.py).
    hits = find_fp(A, [30330, 28328, 26169, 24105, 21763, 19894, 17017])
    if len(hits) != 1:
        raise RuntimeError(f"wedge_idx hits={len(hits)}")
    base = hits[0] - 3 * 17  # start of row 0 (BLOCK_4X4)
    full = A[base : base + 22 * 17].reshape(22, 17).astype(np.uint16)
    uni = full[0, :3].tolist()
    for r in (0, 1, 2, 10, 17, 20, 21):
        if full[r, :3].tolist() != uni:
            raise RuntimeError(f"wedge_idx row {r} not uniform")
    for r in (4, 9, 18, 19):
        if full[r, :3].tolist() == uni:
            raise RuntimeError(f"wedge_idx row {r} unexpectedly uniform")
    tables["wedge_idx"] = full[[3, 4, 5, 6, 7, 8, 9, 18, 19]].copy()
    # inter_ext_tx [4 sets][4 size-cats][17]; set1 size0 row fingerprint
    hits = find_fp(A, [28310, 27208, 25073, 23059, 19438, 17979, 15231])
    if len(hits) != 1:
        raise RuntimeError(f"inter_ext_tx hits={len(hits)}")
    S = hits[0] - 68  # set0 (zeros) start
    iet = A[S : S + 4 * 4 * 17].reshape(4, 4, 17).astype(np.uint16)
    if iet[2, 2, 0] != 31998:  # set2 real row (12-symbol) at size-cat 2
        raise RuntimeError("inter_ext_tx set2 layout mismatch")
    tables["inter_ext_tx"] = iet
    # inter_compound_mode [8][CDF8]
    tables["inter_compound_mode"] = extract_table(
        A, "inter_compound_mode", [(8, 8)], 9,
        [25008, 18945, 16960, 15127, 13612, 12102, 5877, 0])
    # txfm_partition [21]: values verified in both binaries (aom @~47944,
    # dav1d txpart); stored as probs
    txp = [28581, 23846, 20847, 24315, 18196, 12133, 18791, 10887, 11005,
           27179, 20004, 11281, 26549, 19308, 14224, 28015, 21546, 14400,
           28165, 22401, 16088]
    for v in txp[:6]:
        if not find_fp(A, [32768 - v, 0, 0]):
            raise RuntimeError(f"txfm_partition value {v} not in aom rodata")
    tables["txfm_partition"] = np.array(txp, dtype=np.uint16)
    # compound_type [22]: 9 real rows at the wedge-capable positions
    ct = np.full(22, 16384, dtype=np.uint16)
    ct[3:10] = tables["compound_type9"][:7]
    ct[18:20] = tables["compound_type9"][7:9]
    tables["compound_type"] = ct
    wi = np.full(22, 16384, dtype=np.uint16)
    wi[3:10] = tables["wedge_interintra7"]
    tables["wedge_interintra"] = wi

    # ---- subpel filters [6][16][8] int16: REGULAR8, SMOOTH8, SHARP8,
    # BILINEAR, REGULAR4, SMOOTH4 — classified by their half-pel rows
    halves = {
        "regular8": [0, 2, -14, 76, 76, -14, 2, 0],
        "smooth8": [0, -2, 14, 52, 52, 14, -2, 0],
        "sharp8": [-4, 12, -24, 80, 80, -24, 12, -4],
        "bilinear": [0, 0, 0, 64, 64, 0, 0, 0],
        "regular4": [0, 0, -12, 76, 76, -12, 0, 0],
        "smooth4": [0, 0, 12, 52, 52, 12, 0, 0],
    }
    import struct as _st

    s16 = A.astype("<u2").tobytes()

    def i16_hits(vals):
        pat = b"".join(_st.pack("<h", v) for v in vals)
        i = s16.find(pat)
        out = []
        while i >= 0:
            if i % 2 == 0:
                out.append(i // 2)
            i = s16.find(pat, i + 1)
        return out

    found = {}
    for h in i16_hits([0, 0, 0, 128, 0, 0, 0, 0]):
        tab = np.frombuffer(s16[h * 2 : (h + 128) * 2], dtype="<i2").reshape(16, 8)
        if any(int(r.sum()) != 128 for r in tab):
            continue
        for nm, half in halves.items():
            if nm not in found and tab[8].tolist() == half:
                found[nm] = tab.copy()
    missing = [nm for nm in halves if nm not in found]
    if missing:
        raise RuntimeError(f"subpel filters missing: {missing}")
    tables["subpel_filters"] = np.stack(
        [found[n] for n in ("regular8", "smooth8", "sharp8", "bilinear",
                            "regular4", "smooth4")]
    ).astype(np.int16)

    # ---- warp filter [193][8] int16 (rows sum 128). Cross-checked against
    # dav1d's independent copy, which stores the same constants as int8.
    Bs8 = Bd.astype("<u2").tobytes()
    warp = None
    for h in i16_hits([0, 0, 127, 1, 0, 0, 0, 0]):
        raw = np.frombuffer(s16[h * 2 : (h + 193 * 8) * 2], dtype="<i2")
        if len(raw) < 193 * 8:
            continue
        tab = raw.reshape(193, 8)
        if any(int(r.sum()) != 128 for r in tab):
            continue
        probe = _st.pack("8b", *tab[2].tolist())
        if Bs8.find(probe) >= 0:
            warp = tab.copy()
            break
    if warp is None:
        raise RuntimeError("warp filter not found/cross-checked")
    tables["warp_filter"] = warp.astype(np.int16)
    print(f"{'inter tables':20s} {len(tables)} total keys after phase 2")


def extract_inter_recon(A, tables):
    """Phase 3: inter-reconstruction spec constants (§7.11.3): the warp
    divisor lookup (§7.11.3.7 Div_Lut), OBMC blend masks (§7.11.3.10
    Obmc_Mask_N), smooth inter-intra weights (§7.11.3.13 Ii_Weights_1d),
    and the wedge codebooks + master line profiles (§7.11.3.11). All are
    located structurally in the system libaom rodata and validated against
    the spec's stated shape properties."""
    A8 = A.astype("<u2").tobytes()
    Au8 = np.frombuffer(A8, dtype=np.uint8)
    U = A  # u16 view

    # Div_Lut[257]: 16384 .. 8192, strictly decreasing u16
    found = None
    for s in np.where(U == 16384)[0]:
        seg = U[s : s + 257]
        if (
            len(seg) == 257
            and seg[-1] == 8192
            and np.all(np.diff(seg.astype(np.int64)) < 0)
        ):
            found = seg
            break
    if found is None:
        raise RuntimeError("div_lut not found")
    tables["div_lut"] = found.astype(np.uint16)
    print(f"{'div_lut':20s} [257] {found[:3]}..{found[-1]}")

    # Obmc_Mask_{32,16,8,4,2,1}: adjacent ascending-to-64 u8 arrays,
    # anchored on the unique Obmc_Mask_8 profile.
    i = A8.find(bytes([36, 42, 48, 53, 57, 61, 64, 64]))
    if i < 0:
        raise RuntimeError("obmc masks not found")
    om = {
        32: Au8[i - 48 : i - 16],
        16: Au8[i - 16 : i],
        8: Au8[i : i + 8],
        4: Au8[i + 8 : i + 12],
        2: Au8[i + 12 : i + 14],
        1: Au8[i + 14 : i + 15],
    }
    for n, m in om.items():
        if len(m) != n or m[-1] != 64 or np.any(np.diff(m.astype(np.int64)) < 0):
            raise RuntimeError(f"obmc mask {n} malformed: {m}")
    tables["obmc_mask"] = np.concatenate(
        [om[1], om[2], om[4], om[8], om[16], om[32]]
    ).astype(np.uint8)  # offset of mask_N = N - 1
    print(f"{'obmc_mask':20s} concat[63] ok")

    # Ii_Weights_1d[128]: descending 60..1 smooth inter-intra profile
    i = A8.find(bytes([60, 58, 56, 54, 52, 50, 48, 47]))
    if i < 0:
        raise RuntimeError("ii_weights1d not found")
    w = Au8[i : i + 128]
    if w[-1] != 1 or np.any(np.diff(w.astype(np.int64)) > 0):
        raise RuntimeError("ii_weights1d malformed")
    tables["ii_weights1d"] = w.astype(np.uint8)
    print(f"{'ii_weights1d':20s} [128] ok")

    # Wedge master line profiles (64 each): 28 zeros + 8-value transition +
    # 28 full-weight (oblique even/odd); vertical is reconstructed in its
    # spec shape (29 zeros + 6 + 29) and cross-checked against the centered
    # half-length copy libaom stores.
    def master(prefix, lead):
        j = A8.find(bytes(prefix))
        if j < 0:
            raise RuntimeError(f"wedge master {prefix} not found")
        arr = Au8[j - lead : j - lead + 64].astype(np.uint8)
        if np.any(arr[:lead] != 0) or np.any(arr[lead + len(prefix):] != 64):
            raise RuntimeError(f"wedge master {prefix} malformed: {arr}")
        return arr

    tables["wedge_master_even"] = master([1, 4, 11, 27, 46, 58, 62, 63], 28)
    tables["wedge_master_odd"] = master([1, 2, 6, 18, 37, 53, 60, 63], 28)
    j = A8.find(bytes([2, 7, 21, 43, 57, 62, 64]))
    if j < 0:
        raise RuntimeError("wedge master vertical profile not found")
    half = Au8[j - 13 : j + 19]
    if np.any(half[:13] != 0) or np.any(half[19:] != 64):
        raise RuntimeError(f"vertical half profile malformed: {half}")
    vert = np.zeros(64, dtype=np.uint8)
    vert[29:35] = [2, 7, 21, 43, 57, 62]
    vert[35:] = 64
    tables["wedge_master_vertical"] = vert
    print(f"{'wedge_masters':20s} even/odd/vertical ok")

    # Wedge codebooks: 3 x 16 x (direction, x_offset, y_offset) as int32,
    # stored heqw, hltw, hgtw; anchored on the shared first four oblique
    # entries + heqw's HORIZONTAL(4,2).
    I32 = np.frombuffer(A8, dtype="<i4")
    anchor = np.array([2, 4, 4, 3, 4, 4, 4, 4, 4, 5, 4, 4, 0, 4, 2], dtype="<i4")
    hits = [
        k
        for k in range(len(I32) - 144)
        if np.array_equal(I32[k : k + 15], anchor)
    ]
    # the anchor also matches hgtw's head (H 4,2 appears there too); take the
    # first (heqw) and demand the three codebooks be adjacent
    if not hits:
        raise RuntimeError("wedge codebooks not found")
    k = hits[0]
    cb = I32[k : k + 144].reshape(3, 16, 3).copy()
    # shape checks: every entry dir in 0..5, offsets in {2,4,6}
    if not (
        np.all((cb[:, :, 0] >= 0) & (cb[:, :, 0] <= 5))
        and np.all(np.isin(cb[:, :, 1:], (2, 4, 6)))
    ):
        raise RuntimeError(f"wedge codebooks malformed")
    # heqw has H(4,2),H(4,6),V(2,4),V(6,4) at 4..7; hltw V,V,V,H; hgtw H,H,H,V
    if not (
        list(cb[0, 4:8, 0]) == [0, 0, 1, 1]
        and list(cb[1, 4:8, 0]) == [1, 1, 1, 0]
        and list(cb[2, 4:8, 0]) == [0, 0, 0, 1]
    ):
        raise RuntimeError(f"wedge codebook order unexpected: {cb[:, 4:8, 0]}")
    tables["wedge_codebooks"] = cb.astype(np.int16)  # [heqw, hltw, hgtw]
    print(f"{'wedge_codebooks':20s} [3][16][3] ok")


def main():
    A = rodata(find_aom())
    B = rodata(find_bundled_avif())
    tables = {}
    # dav1d's CdfContext block sits near the end of the bundled rodata; the
    # bundled aom 3.12 carries its own differently-padded copy earlier, so
    # restrict B-side searches to the dav1d region.
    Bd = B[600000 // 2 :]
    for name, src, shapes, width, fp in MANIFEST:
        U = A if src == "A" else Bd
        tables[name] = extract_table(U, name, shapes, width, fp)
        print(f"{name:20s} rows={tables[name].shape[0]:5d} width={width}")
    for name, src, fp, nbytes in RAW_REGIONS:
        U = A if src == "A" else Bd
        hits = find_fp(U, fp)
        if len(hits) != 1:
            raise RuntimeError(f"{name}: raw fingerprint hits={len(hits)}")
        tables[name] = U[hits[0] : hits[0] + nbytes // 2].astype(np.uint16)
        print(f"{name:20s} raw u16={len(tables[name])}")
    hits = find_fp(Bd, PALETTE_Y_MODE_FP)
    if len(hits) != 1:
        raise RuntimeError("palette_y_mode fingerprint")
    seq = Bd[hits[0] : hits[0] + 42 : 2].astype(np.uint16)
    tables["palette_y_mode"] = seq.reshape(7, 3)
    for k, v in SCALARS.items():
        tables[k] = np.atleast_1d(np.array(v, dtype=np.uint16))
    tables.update(extract_quant(A))

    # intra-prediction constant tables (§7.11.2), located by known prefixes
    A8 = A.astype("<u2").tobytes()
    Au8 = np.frombuffer(A8, dtype=np.uint8)
    i = A8.find(bytes([255, 149, 85, 64, 255, 197, 146, 105]))
    if i < 0:
        raise RuntimeError("sm_weights not found")
    tables["sm_weights"] = Au8[i : i + 124].astype(np.uint16)  # sizes 4..64 concat
    i = A8.find(np.array([-6, 10, 0, 0, 0, 12, 0, 0], dtype=np.int8).tobytes())
    if i < 0:
        raise RuntimeError("filter_intra_taps not found")
    tables["filter_intra_taps"] = (
        np.frombuffer(A8[i : i + 320], dtype=np.int8).astype(np.int16).reshape(5, 8, 8)
    )
    i = A8.find(np.array([1023, 0, 0, 547, 0, 0, 372], dtype="<u2").tobytes())
    if i < 0:
        raise RuntimeError("dr_intra_derivative not found")
    i -= 6  # table starts 3 entries (angle 0..2) before the first nonzero
    tables["dr_intra_derivative"] = np.frombuffer(A8[i : i + 180], dtype="<u2").copy()

    # quantizer matrices (spec 7.12.3 Quantizer_Matrix; aom iwt_matrix_ref,
    # [15 levels][2 planes][3344] uint8 — all sizes <= 32 concatenated in
    # tx-enum order). Located by the canonical 4x4 level-0 luma head
    # 32,43,73,97 followed by the symmetric row 43,67,94,110, then
    # validated: every level-14 matrix ~flat (values 28..34), rect pairs
    # transpose-equal, squares symmetric, and the 32x32 section matches
    # dav1d's lower-triangular qm_tbl_32x32_t copy in the bundled lib.
    Au = A.astype("<u2").tobytes()
    Aub = np.frombuffer(Au, dtype=np.uint8)
    qm_head = bytes([32, 43, 73, 97, 43, 67, 94, 110])
    qi = Au.find(qm_head)
    if qi < 0:
        raise RuntimeError("qm tables not found")
    qm = Aub[qi : qi + 15 * 2 * 3344].reshape(15, 2, 3344).copy()
    lvl14 = qm[14].reshape(-1)
    if lvl14.min() < 28 or lvl14.max() > 34:
        raise RuntimeError("qm level-14 not flat — wrong base")
    off32 = 336
    m32 = qm[0, 0, off32 : off32 + 1024].reshape(32, 32)
    if not np.array_equal(m32, m32.T):
        raise RuntimeError("qm 32x32 not symmetric — wrong layout")
    tri = m32[np.tril_indices(32)]
    Bu8 = np.frombuffer(B.astype("<u2").tobytes(), dtype=np.uint8)
    if Bu8.tobytes().find(tri.astype(np.uint8).tobytes()) < 0:
        raise RuntimeError("qm 32x32 missing from dav1d copy")
    tables["qm_iq"] = qm.astype(np.uint16)
    print(f"{'qm_iq':20s} [15][2][3344] extracted + dav1d cross-check OK")

    # cross-copy validation: every aom-side mode-table row's prob bytes must
    # appear in the dav1d region too (independent copy of the same constants)
    Bb = B.astype("<u2").tobytes()
    for name in ("kf_y_mode", "uv_mode", "partition", "angle_delta", "y_mode",
                 "skip", "coeff_base", "eob_pt_16"):
        t = tables[name]
        missing = 0
        for row in t[: min(len(t), 60)]:
            nz = row[row > 0]
            if len(nz) >= 2 and Bb.find(u16pat(list(nz[:4]))) < 0:
                missing += 1
        if missing:
            raise RuntimeError(f"{name}: {missing} rows missing from dav1d copy")
    print("cross-copy validation OK")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    extract_inter(A, Bd, tables)
    extract_gaussian(B, tables)
    extract_inter_recon(A, tables)

    np.savez_compressed(OUT, **tables)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, {len(tables)} tables)")


if __name__ == "__main__":
    sys.exit(main())
