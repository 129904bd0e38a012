"""AV1 frame header parsing (spec §5.9) for intra/still frames.

Scope: KEY/INTRA_ONLY frames as produced for AVIF payloads (the reference
consumes these via dav1d, codec_dav1d.c:58-156; libavif itself only
harvests the sequence header, obu.c:712). Inter-frame syntax (reference
frames, global motion, interpolation filters) is parsed far enough to be
rejected cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from ...constants import AvifError, Result
from ...containers.obu import SequenceHeader
from ...utils.streams import ROStream

MAX_TILE_WIDTH = 4096
MAX_TILE_AREA = 4096 * 2304
MAX_TILE_COLS = 64
MAX_TILE_ROWS = 64
PRIMARY_REF_NONE = 7
SUPERRES_NUM = 8
SUPERRES_DENOM_MIN = 9


def _tile_log2(blk_size: int, target: int) -> int:
    k = 0
    while (blk_size << k) < target:
        k += 1
    return k


@dataclasses.dataclass
class TileInfo:
    cols: int = 1
    rows: int = 1
    col_starts: list = dataclasses.field(default_factory=lambda: [0])  # in sb units
    row_starts: list = dataclasses.field(default_factory=lambda: [0])
    context_update_tile_id: int = 0
    tile_size_bytes: int = 4


@dataclasses.dataclass
class QuantizationParams:
    base_q_idx: int = 0
    delta_q_y_dc: int = 0
    delta_q_u_dc: int = 0
    delta_q_u_ac: int = 0
    delta_q_v_dc: int = 0
    delta_q_v_ac: int = 0
    using_qmatrix: bool = False
    qm_y: int = 0
    qm_u: int = 0
    qm_v: int = 0


@dataclasses.dataclass
class LoopFilterParams:
    levels: tuple = (0, 0, 0, 0)
    sharpness: int = 0
    delta_enabled: bool = False
    ref_deltas: list = dataclasses.field(default_factory=lambda: [1, 0, 0, 0, -1, 0, -1, -1])
    mode_deltas: list = dataclasses.field(default_factory=lambda: [0, 0])


@dataclasses.dataclass
class CdefParams:
    damping: int = 3
    bits: int = 0
    y_pri: list = dataclasses.field(default_factory=lambda: [0] * 8)
    y_sec: list = dataclasses.field(default_factory=lambda: [0] * 8)
    uv_pri: list = dataclasses.field(default_factory=lambda: [0] * 8)
    uv_sec: list = dataclasses.field(default_factory=lambda: [0] * 8)


@dataclasses.dataclass
class LrParams:
    # per plane: 0 none, 1 switchable, 2 wiener, 3 sgrproj
    frame_restoration_type: tuple = (0, 0, 0)
    unit_size: tuple = (256, 256, 256)


@dataclasses.dataclass
class FrameHeader:
    frame_type: int = 0  # 0 KEY
    show_frame: bool = True
    showable_frame: bool = False
    error_resilient: bool = False
    disable_cdf_update: bool = False
    allow_screen_content_tools: bool = False
    force_integer_mv: bool = True
    allow_intrabc: bool = False
    width: int = 0
    height: int = 0
    render_width: int = 0
    render_height: int = 0
    superres_denom: int = SUPERRES_NUM
    upscaled_width: int = 0
    tile: TileInfo = dataclasses.field(default_factory=TileInfo)
    quant: QuantizationParams = dataclasses.field(default_factory=QuantizationParams)
    segmentation_enabled: bool = False
    delta_q_present: bool = False
    delta_q_res: int = 0
    delta_lf_present: bool = False
    delta_lf_res: int = 0
    delta_lf_multi: bool = False
    lf: LoopFilterParams = dataclasses.field(default_factory=LoopFilterParams)
    cdef: CdefParams = dataclasses.field(default_factory=CdefParams)
    lr: LrParams = dataclasses.field(default_factory=LrParams)
    tx_mode_select: bool = False  # False: TX_MODE_LARGEST, True: TX_MODE_SELECT
    reduced_tx_set: bool = False
    film_grain_apply: bool = False
    # derived
    mi_cols: int = 0
    mi_rows: int = 0
    sb_cols: int = 0
    sb_rows: int = 0
    header_bytes: int = 0  # bytes consumed (for OBU_FRAME)

    @property
    def coded_lossless(self) -> bool:
        q = self.quant
        return (
            q.base_q_idx == 0
            and q.delta_q_y_dc == 0
            and q.delta_q_u_dc == 0
            and q.delta_q_u_ac == 0
            and q.delta_q_v_dc == 0
            and q.delta_q_v_ac == 0
            and not self.segmentation_enabled
        )


def _read_delta_q(f) -> int:
    if f(1):
        # su(7): 1+6 signed
        v = f(7)
        return v - 128 if v >= 64 else v
    return 0


def _su(f, n: int) -> int:
    v = f(n + 1)
    return v - (1 << (n + 1)) if v >= (1 << n) else v


def parse_frame_header(payload: bytes, seq: SequenceHeader) -> FrameHeader:
    """uncompressed_header (§5.9.2) for intra frames. `payload` starts at
    the first byte of the (frame_)header OBU payload."""
    s = ROStream(payload)
    s.start_bits()
    f = s.read_bits
    h = FrameHeader()

    refresh_frame_flags = 0xFF
    if seq.reduced_still_picture_header:
        h.frame_type = 0  # KEY
        h.show_frame = True
        h.showable_frame = False
        h.error_resilient = False
        frame_size_override = False
        h.disable_cdf_update = bool(f(1))
        if seq.force_screen_content_tools == 2:
            h.allow_screen_content_tools = bool(f(1))
        else:
            h.allow_screen_content_tools = bool(seq.force_screen_content_tools)
        if h.allow_screen_content_tools and seq.force_integer_mv == 2:
            f(1)  # force_integer_mv bit (intra frames force it anyway)
        h.force_integer_mv = True
    else:
        if f(1):  # show_existing_frame
            raise AvifError(Result.BMFF_PARSE_FAILED, "show_existing_frame in AVIF")
        h.frame_type = f(2)
        if h.frame_type not in (0, 2):  # KEY or INTRA_ONLY
            raise AvifError(Result.NOT_IMPLEMENTED, "inter frame in still decode")
        h.show_frame = bool(f(1))
        if h.show_frame:
            h.showable_frame = h.frame_type != 0
        else:
            h.showable_frame = bool(f(1))
        if h.frame_type == 0 and h.show_frame:
            h.error_resilient = True  # implied (§5.9.2)
        else:
            h.error_resilient = bool(f(1))
        h.disable_cdf_update = bool(f(1))
        if seq.force_screen_content_tools == 2:
            h.allow_screen_content_tools = bool(f(1))
        else:
            h.allow_screen_content_tools = bool(seq.force_screen_content_tools)
        if h.allow_screen_content_tools:
            if seq.force_integer_mv == 2:
                f(1)  # force_integer_mv bit (intra frames force it anyway)
        h.force_integer_mv = True
        if seq.frame_id_numbers_present:
            f(seq.delta_frame_id_length + seq.additional_frame_id_length)
        frame_size_override = bool(f(1))
        f(seq.order_hint_bits if seq.enable_order_hint else 0)  # order_hint
        # primary_ref_frame: intra => PRIMARY_REF_NONE, no bit
        # buffer_removal_time: absent (no decoder model in AVIF payloads)
        if h.frame_type == 0 and h.show_frame:
            refresh_frame_flags = 0xFF
        else:
            refresh_frame_flags = f(8)
        if refresh_frame_flags != 0xFF and h.error_resilient and seq.enable_order_hint:
            for _ in range(8):
                f(seq.order_hint_bits)

    # frame_size (§5.9.5)
    if frame_size_override:
        w = f(seq.frame_width_bits) + 1
        hgt = f(seq.frame_height_bits) + 1
    else:
        w = seq.max_frame_width
        hgt = seq.max_frame_height
    # superres_params (§5.9.8)
    use_superres = False
    if seq.enable_superres:
        use_superres = bool(f(1))
    h.superres_denom = (f(3) + SUPERRES_DENOM_MIN) if use_superres else SUPERRES_NUM
    h.upscaled_width = w
    h.width = (w * SUPERRES_NUM + (h.superres_denom // 2)) // h.superres_denom
    h.height = hgt
    # render size
    if f(1):  # render_and_frame_size_different
        h.render_width = f(16) + 1
        h.render_height = f(16) + 1
    else:
        h.render_width = h.upscaled_width
        h.render_height = h.height

    if h.allow_screen_content_tools and h.upscaled_width == h.width:
        h.allow_intrabc = bool(f(1))

    if not seq.reduced_still_picture_header and not h.disable_cdf_update:
        f(1)  # disable_frame_end_update_cdf (frame-end adaptation only)

    # derived block geometry
    h.mi_cols = 2 * ((h.width + 7) >> 3)
    h.mi_rows = 2 * ((h.height + 7) >> 3)
    sb_shift = 5 if seq.use_128x128_superblock else 4
    sb_size_mi = 1 << sb_shift
    h.sb_cols = (h.mi_cols + sb_size_mi - 1) >> sb_shift
    h.sb_rows = (h.mi_rows + sb_size_mi - 1) >> sb_shift

    _parse_tile_info(f, h, seq)
    _parse_quantization(f, h, seq)
    _parse_segmentation(f, h)
    _parse_delta_q_lf(f, h)
    _parse_loop_filter(f, h, seq)
    _parse_cdef(f, h, seq)
    _parse_lr(f, h, seq)
    # tx_mode (§5.9.21)
    h.tx_mode_select = False if h.coded_lossless else bool(f(1))
    # frame_reference_mode: intra frame -> not read
    # skip_mode_params: intra -> not read
    # allow_warped_motion: intra -> not read... spec reads only for inter
    h.reduced_tx_set = bool(f(1))
    # global_motion_params: loops over LAST..ALTREF only for inter frames
    # film_grain_params (§5.9.30)
    if seq.film_grain_params_present and (h.show_frame or h.showable_frame):
        apply_grain = bool(f(1))
        h.film_grain_apply = apply_grain
        if apply_grain:
            raise AvifError(Result.NOT_IMPLEMENTED, "film grain synthesis")
    s.align_bits_read()
    h.header_bytes = s.offset
    return h


def _parse_tile_info(f, h: FrameHeader, seq: SequenceHeader) -> None:
    """§5.9.15. Records tile boundaries in superblock units."""
    sb_shift = 5 if seq.use_128x128_superblock else 4
    sb_size = 1 << (sb_shift - 2)  # in 4x4 mi units /4 -> sb in "64px" ? keep px math below
    sb_cols, sb_rows = h.sb_cols, h.sb_rows
    sb_size_px = 128 if seq.use_128x128_superblock else 64
    max_tile_width_sb = MAX_TILE_WIDTH // sb_size_px
    max_tile_area_sb = MAX_TILE_AREA // (sb_size_px * sb_size_px)
    min_log2_tile_cols = _tile_log2(max_tile_width_sb, sb_cols)
    max_log2_tile_cols = _tile_log2(1, min(sb_cols, MAX_TILE_COLS))
    max_log2_tile_rows = _tile_log2(1, min(sb_rows, MAX_TILE_ROWS))
    min_log2_tiles = max(
        min_log2_tile_cols, _tile_log2(max_tile_area_sb, sb_cols * sb_rows)
    )
    ti = TileInfo()
    uniform = bool(f(1))
    if uniform:
        log2_cols = min_log2_tile_cols
        while log2_cols < max_log2_tile_cols and f(1):
            log2_cols += 1
        tile_width_sb = (sb_cols + (1 << log2_cols) - 1) >> log2_cols
        ti.col_starts = list(range(0, sb_cols, tile_width_sb)) + [sb_cols]
        min_log2_tile_rows = max(min_log2_tiles - log2_cols, 0)
        log2_rows = min_log2_tile_rows
        while log2_rows < max_log2_tile_rows and f(1):
            log2_rows += 1
        tile_height_sb = (sb_rows + (1 << log2_rows) - 1) >> log2_rows
        ti.row_starts = list(range(0, sb_rows, tile_height_sb)) + [sb_rows]
    else:
        ti.col_starts = [0]
        widest = 0
        start = 0
        while start < sb_cols:
            max_w = min(sb_cols - start, max_tile_width_sb)
            w = _read_ns(f, max_w) + 1
            widest = max(widest, w)
            start += w
            ti.col_starts.append(start)
        max_tile_height_sb = max(max_tile_area_sb // widest, 1)
        ti.row_starts = [0]
        start = 0
        while start < sb_rows:
            max_hh = min(sb_rows - start, max_tile_height_sb)
            hh = _read_ns(f, max_hh) + 1
            start += hh
            ti.row_starts.append(start)
    ti.cols = len(ti.col_starts) - 1
    ti.rows = len(ti.row_starts) - 1
    if ti.cols * ti.rows > 1:
        bits = _tile_log2(1, ti.cols) + _tile_log2(1, ti.rows)
        ti.context_update_tile_id = f(bits)
        ti.tile_size_bytes = f(2) + 1
    h.tile = ti


def _read_ns(f, n: int) -> int:
    """ns(n): non-symmetric unsigned with max n-1 (§4.10.7)."""
    w = n.bit_length()
    if w == 0:
        return 0
    m = (1 << w) - n
    v = f(w - 1) if w > 1 else 0
    if v < m:
        return v
    extra = f(1)
    return (v << 1) - m + extra


def _parse_quantization(f, h: FrameHeader, seq: SequenceHeader) -> None:
    q = QuantizationParams()
    q.base_q_idx = f(8)
    q.delta_q_y_dc = _read_delta_q(f)
    if not seq.monochrome:
        diff_uv_delta = bool(f(1)) if seq.separate_uv_delta_q else False
        q.delta_q_u_dc = _read_delta_q(f)
        q.delta_q_u_ac = _read_delta_q(f)
        if diff_uv_delta:
            q.delta_q_v_dc = _read_delta_q(f)
            q.delta_q_v_ac = _read_delta_q(f)
        else:
            q.delta_q_v_dc = q.delta_q_u_dc
            q.delta_q_v_ac = q.delta_q_u_ac
    q.using_qmatrix = bool(f(1))
    if q.using_qmatrix:
        q.qm_y = f(4)
        q.qm_u = f(4)
        if seq.separate_uv_delta_q:
            q.qm_v = f(4)
        else:
            q.qm_v = q.qm_u
    h.quant = q


# per-feature coding params (§5.9.14): bits, signed, clip max
SEG_FEATURE_BITS = (8, 6, 6, 6, 6, 3, 0, 0)
SEG_FEATURE_SIGNED = (1, 1, 1, 1, 1, 0, 0, 0)
SEG_FEATURE_MAX = (255, 63, 63, 63, 63, 7, 0, 0)
SEG_LVL_ALT_Q = 0
SEG_LVL_SKIP = 6


def _parse_segmentation(f, h: FrameHeader) -> None:
    h.segmentation_enabled = bool(f(1))
    h.seg_feature_enabled = [[False] * 8 for _ in range(8)]
    h.seg_feature_data = [[0] * 8 for _ in range(8)]
    h.seg_id_pre_skip = False
    h.seg_last_active_id = 0
    if not h.segmentation_enabled:
        return
    # intra frame: primary_ref_frame is PRIMARY_REF_NONE, so update_map=1,
    # temporal_update=0, update_data=1 with no bits read (§5.9.14)
    for seg in range(8):
        for j in range(8):
            if f(1):
                h.seg_feature_enabled[seg][j] = True
                mx = SEG_FEATURE_MAX[j]
                if SEG_FEATURE_SIGNED[j]:
                    v = _su(f, SEG_FEATURE_BITS[j])
                    v = max(-mx, min(mx, v))
                else:
                    v = min(mx, f(SEG_FEATURE_BITS[j]))
                h.seg_feature_data[seg][j] = v
    for seg in range(8):
        for j in range(8):
            if h.seg_feature_enabled[seg][j]:
                h.seg_last_active_id = seg
                if j >= SEG_LVL_SKIP:
                    h.seg_id_pre_skip = True


def _parse_delta_q_lf(f, h: FrameHeader) -> None:
    if h.quant.base_q_idx > 0:
        h.delta_q_present = bool(f(1))
    if h.delta_q_present:
        h.delta_q_res = f(2)
    if h.delta_q_present:
        if not h.allow_intrabc:
            h.delta_lf_present = bool(f(1))
        if h.delta_lf_present:
            h.delta_lf_res = f(2)
            h.delta_lf_multi = bool(f(1))


def _parse_loop_filter(f, h: FrameHeader, seq: SequenceHeader) -> None:
    if h.coded_lossless or h.allow_intrabc:
        return
    lf = LoopFilterParams()
    l0 = f(6)
    l1 = f(6)
    levels = [l0, l1, 0, 0]
    if not seq.monochrome:
        if l0 or l1:
            levels[2] = f(6)
            levels[3] = f(6)
    lf.levels = tuple(levels)
    lf.sharpness = f(3)
    lf.delta_enabled = bool(f(1))
    if lf.delta_enabled:
        if f(1):  # delta update
            for i in range(8):
                if f(1):
                    lf.ref_deltas[i] = _su(f, 6)
            for i in range(2):
                if f(1):
                    lf.mode_deltas[i] = _su(f, 6)
    h.lf = lf


def _parse_cdef(f, h: FrameHeader, seq: SequenceHeader) -> None:
    if h.coded_lossless or h.allow_intrabc or not seq.enable_cdef:
        return
    c = CdefParams()
    c.damping = f(2) + 3
    c.bits = f(2)
    for i in range(1 << c.bits):  # y/uv strengths interleaved (§5.9.19)
        c.y_pri[i] = f(4)
        c.y_sec[i] = f(2)
        if c.y_sec[i] == 3:
            c.y_sec[i] += 1
        if not seq.monochrome:
            c.uv_pri[i] = f(4)
            c.uv_sec[i] = f(2)
            if c.uv_sec[i] == 3:
                c.uv_sec[i] += 1
    h.cdef = c


def _parse_lr(f, h: FrameHeader, seq: SequenceHeader) -> None:
    if h.coded_lossless or h.allow_intrabc or not seq.enable_restoration:
        return
    uses_lr = False
    uses_chroma_lr = False
    types = []
    for p in range(1 if seq.monochrome else 3):
        t = f(2)
        types.append(t)
        if t:
            uses_lr = True
            if p > 0:
                uses_chroma_lr = True
    while len(types) < 3:
        types.append(0)
    h.lr = LrParams(frame_restoration_type=tuple(types))
    if uses_lr:
        if seq.use_128x128_superblock:
            shift = 1 + f(1)
        else:
            shift = f(1)
            if shift:
                shift += f(1)
        size0 = (256 if seq.use_128x128_superblock else 128) << 0
        # spec: loop_restoration_size[0] = RESTORATION_TILESIZE_MAX(256) >> (2 - shift)
        size0 = 256 >> (2 - shift)
        sizes = [size0, size0, size0]
        if seq.subsampling_x and seq.subsampling_y and uses_chroma_lr:
            if f(1):
                sizes[1] = sizes[2] = size0 >> 1
        h.lr = LrParams(frame_restoration_type=tuple(types), unit_size=tuple(sizes))
