"""Wedge-mask conformance oracle: craft compound-WEDGE streams covering
every (block shape, wedge index, wedge sign) and let dav1d adjudicate
our mask orientation exactly.

Each test frame is a grid of skip=1 GLOBAL_GLOBALMV (LAST, LAST2)
compound blocks — no residual, no loop filters — so the reconstruction
IS the wedge blend of the two reference frames, and any per-block
mismatch against dav1d is a pure mask error for that (index, sign).

Usage: python tools/wedge_conformance.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("LIBAVIF_TPU_TILEWALK", "0")
sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from libavif_tpu.codec.av1 import blocks as B  # noqa: E402
from libavif_tpu.codec.av1 import interenc as IE  # noqa: E402
from libavif_tpu.codec.av1 import refs as R  # noqa: E402
from libavif_tpu.codec.av1.stream import StreamDecoder  # noqa: E402
from libavif_tpu.interop import dav1d_oracle  # noqa: E402


class WedgePlanner(IE.InterPlanner):
    """Every leaf is a (bw, bh) compound GLOBAL_GLOBALMV wedge block
    with skip=1; wedge index/sign derive from the block position."""

    def __init__(self, sources, hdr, seq, qindex, speed, bw_px, bh_px):
        super().__init__(sources, hdr, seq, qindex, speed, {})
        self.bw_px = bw_px
        self.bh_px = bh_px
        self._pending_bits: list = []

    def _case(self):
        r, c, _ = self.dec.block_pos
        bi = (c * 4) // self.bw_px  # column index -> wedge index
        si = (r * 4) // self.bh_px  # row index -> sign
        return bi % 16, si % 2

    def next_symbol(self, n, what=None):
        if isinstance(what, tuple) and what[0] == "partition":
            wpx = B.BLOCK_DIMS[what[1]][0]
            hpx = B.BLOCK_DIMS[what[1]][1]
            bw, bh = self.bw_px, self.bh_px
            if wpx == bw and hpx == bh:
                return 0
            if wpx == bw and hpx == 2 * bh:
                return 1  # HORZ -> two leaves
            if wpx == 2 * bw and hpx == bh:
                return 2  # VERT
            if wpx == bw and hpx == 4 * bh:
                return 8  # HORZ_4
            if wpx == 4 * bw and hpx == bh:
                return 9  # VERT_4
            return 3  # split
        if what == "skip":
            return 1
        if what == "is_inter":
            return 1
        if what == "comp_mode":
            return 1
        if what == "comp_ref_type":
            return 0  # unidirectional
        if what in ("uni0", "uni1"):
            return 0  # (LAST, LAST2)
        if what == "comp_inter_mode":
            return 6  # GLOBAL_GLOBALMV - NEAREST_NEARESTMV
        if what == "comp_group":
            return 1  # masked compound
        if what == "compound_type":
            return 0  # WEDGE
        if what == "wedge_idx":
            idx, sign = self._case()
            self._pending_bits.append(sign)
            return idx
        return super().next_symbol(n, what)

    def next_bit(self):
        if self._pending_bits:
            return self._pending_bits.pop(0)
        return super().next_bit()


def build_stream(bw_px: int, bh_px: int):
    """3-frame stream: KEY (content A) -> INTER all-intra refreshing
    slot 1 (content B) -> the wedge grid frame."""
    cols, rows = 16, 2  # wedge index x sign
    # keep the frame >= 32 tall: HORZ_4/VERT_4 leaves (e.g. 32x8) need
    # their 32x32 parent readable (has_rows), else the walk degenerates
    # to forced splits and the grid never codes the target shape
    w, h = cols * bw_px, max(rows * bh_px, 32)
    # constant extreme planes: the blend (m*255 + 32) >> 6 is INJECTIVE
    # in m, so every reconstructed pixel recovers its mask weight exactly
    A = [np.full((h, w), 255, np.uint8),
         np.full((h // 2, w // 2), 255, np.uint8),
         np.full((h // 2, w // 2), 255, np.uint8)]
    Bc = [np.zeros((h, w), np.uint8),
          np.zeros((h // 2, w // 2), np.uint8),
          np.zeros((h // 2, w // 2), np.uint8)]

    seq = IE._sequence_header(
        w, h, monochrome=False, subsampling_x=1, subsampling_y=1,
        bit_depth=8, color_primaries=2, transfer_characteristics=2,
        matrix_coefficients=2, color_range=1, enable_cdef=False,
        enable_masked_compound=True,
    )
    from libavif_tpu.containers.obu import (
        parse_sequence_header, write_obu, write_sequence_header,
    )
    from libavif_tpu.utils.streams import RWStream

    seq_payload = write_sequence_header(seq)
    seq = parse_sequence_header(seq_payload)
    state = R.DecoderState()
    state.seq = seq
    payloads = []
    # frame 0: KEY with content A (slot 0 via implied 0xFF)
    p0 = IE._encode_one_frame(seq, state, R.KEY_FRAME, A, 48, 6, None,
                              enable_deblock=False, enable_cdef=False,
                              cdef_search=False)
    # frame 1: all-intra INTER with content B, refresh slot 1 only
    orig_writer = IE._write_frame_header_seq

    def w1(seqh, ftype, q, **kw):
        kw["refresh"] = 0x02
        return orig_writer(seqh, ftype, q, **kw)

    IE._write_frame_header_seq = w1
    try:
        p1 = IE._encode_one_frame(seq, state, R.INTER_FRAME, Bc, 48, 6, {},
                                  enable_deblock=False, enable_cdef=False,
                                  cdef_search=False)
    finally:
        IE._write_frame_header_seq = orig_writer

    # frame 2: the wedge grid (LAST = slot 0 = A, LAST2 = slot 1 = B)
    def w2(seqh, ftype, q, **kw):
        kw["reference_select"] = True
        kw["ref_idx"] = [0, 1, 0, 0, 0, 0, 0]  # LAST=slot0(A), LAST2=slot1(B)
        return orig_writer(seqh, ftype, q, **kw)

    def mk_planner(sources, hdr, seqh, q, speed, iplan):
        return WedgePlanner(sources, hdr, seqh, q, speed, bw_px, bh_px)

    IE._write_frame_header_seq = w2
    orig_pl = IE.InterPlanner
    IE.InterPlanner = mk_planner
    try:
        # ref_frame_idx written as all-zero maps every name to slot 0;
        # LAST2 must map to slot 1 — patch the header writer field:
        def w3(seqh, ftype, q, **kw):
            kw["reference_select"] = True
            payload = orig_writer(seqh, ftype, q, **kw)
            return payload

        p2 = IE._encode_one_frame(seq, state, R.INTER_FRAME, A, 48, 6, {},
                                  enable_deblock=False, enable_cdef=False,
                                  cdef_search=False)
    finally:
        IE._write_frame_header_seq = orig_writer
        IE.InterPlanner = orig_pl

    out = []
    for k, payload in enumerate((p0, p1, p2)):
        s = RWStream()
        write_obu(s, IE.OBU_TEMPORAL_DELIMITER, b"")
        if k == 0:
            write_obu(s, IE.OBU_SEQUENCE_HEADER, seq_payload)
        write_obu(s, IE.OBU_FRAME, payload)
        out.append(s.data())
    return out, (w, h)


def main():
    bad = []
    for bw_px, bh_px in ((32, 32), (32, 16), (16, 32), (16, 16), (8, 8)):
        payloads, (w, h) = build_stream(bw_px, bh_px)
        dav = dav1d_oracle.decode_obus(payloads)
        sd = StreamDecoder()
        ours = []
        for p in payloads:
            ours += [s[0] for s in sd.decode_obus(p)]
        a = np.asarray(ours[2][0], np.int64)
        b = np.asarray(dav[2].planes[0], np.int64)
        for si in range(2):
            for idx in range(16):
                y0, x0 = si * bh_px, idx * bw_px
                blk = (a[y0:y0 + bh_px, x0:x0 + bw_px]
                       != b[y0:y0 + bh_px, x0:x0 + bw_px])
                n = int(blk.sum())
                if n:
                    bad.append((f"{bw_px}x{bh_px}", idx, si, n))
        print(f"{bw_px}x{bh_px}: "
              + ("ALL 32 cases bit-exact" if not any(
                  t[0] == f"{bw_px}x{bh_px}" for t in bad)
                 else "MISMATCHES: " + str(
                     [t for t in bad if t[0] == f"{bw_px}x{bh_px}"])))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
