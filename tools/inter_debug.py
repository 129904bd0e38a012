"""Differential inter-decode debugger against the standalone dav1d oracle.

Given an AVIF (path or bytes), decodes it alongside dav1d
(output_invisible_frames) with event alignment (coded frames +
show_existing emissions), reports the first diverging coded frame, the
first diverging block in DECODE order inside it, that block's full
syntax + MV stack, and brute-force-recovers the MV/ref dav1d must have
used (for skip blocks). The workhorse for §7.10/§7.11 bit-exactness.

Usage: python tools/inter_debug.py <file.avif>
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from libavif_tpu.api import Decoder  # noqa: E402
from libavif_tpu.interop import dav1d_oracle as DV  # noqa: E402
from libavif_tpu.codec.av1 import blocks as B  # noqa: E402
from libavif_tpu.codec.av1 import decode as DE  # noqa: E402
from libavif_tpu.codec.av1 import inter as MC  # noqa: E402
from libavif_tpu.codec.av1 import mvpred as M  # noqa: E402
import libavif_tpu.codec.av1.stream as S  # noqa: E402


def payloads_of(data: bytes):
    d = Decoder()
    d.parse(data)
    st = d._color_track.sample_table
    return [data[off : off + size] for off, size in st.sample_ranges()]


class Differ:
    """One diff session over a stream; instruments the decoder."""

    def __init__(self, data: bytes):
        self.data = data
        self.dv = DV.decode_obus(payloads_of(data), all_frames=True)
        self.events = []  # ("coded"|"show", planes)
        self.blocks = []  # (event_idx, dict) decode-order block syntax
        self.stacks = {}  # (event_idx, r, c) -> MvContext
        self._install()

    def _install(self):
        cls = [
            v for v in vars(S).values()
            if isinstance(v, type) and hasattr(v, "_decode_frame")
        ][0]
        differ = self
        cnt = {"i": -1}
        self._cnt = cnt
        orig_df = cls._decode_frame
        orig_se = cls._show_existing
        orig_fms = M.find_mv_stack
        from libavif_tpu.codec.av1 import interpred as IP

        orig_pib = IP.predict_inter_block

        def dfw(s, hdr, tiles):
            cnt["i"] += 1
            out = orig_df(s, hdr, tiles)
            differ.events.append(("coded", [p.copy() for p in out], hdr))
            return out

        def sew(s, hdr):
            out = orig_se(s, hdr)
            differ.events.append(("show", [p.copy() for p in out[0]], None))
            return out

        def fmsw(d, r, c, bsize, rf, comp):
            out = orig_fms(d, r, c, bsize, rf, comp)
            differ.stacks[(cnt["i"], r, c)] = out
            return out

        def pibw(d, plane, px, py, pw, ph):
            if plane == 0:
                differ.blocks.append((cnt["i"], dict(d.block)))
            return orig_pib(d, plane, px, py, pw, ph)

        cls._decode_frame = dfw
        cls._show_existing = sew
        M.find_mv_stack = fmsw
        IP.predict_inter_block = pibw
        self._restore = (cls, orig_df, orig_se, orig_fms, orig_pib, IP)

    def run(self, max_images=64):
        d = Decoder()
        d.parse(self.data)
        try:
            for _ in range(min(max_images, d.image_count or max_images)):
                d.next_image()
        except Exception as e:
            print(f"[decode stopped: {e}]")
        cls, odf, ose, ofms, opib, IP = self._restore
        cls._decode_frame = odf
        cls._show_existing = ose
        M.find_mv_stack = ofms
        IP.predict_inter_block = opib
        return self.report()

    def report(self):
        first_bad = None
        for i, ((kind, planes, hdr), dvf) in enumerate(zip(self.events, self.dv)):
            diffs = [
                int((a.astype(np.int64) != b.astype(np.int64)).sum())
                for a, b in zip(planes, dvf.planes)
            ]
            tag = f"event {i} {kind}" + (
                f" order {hdr.order_hint}" if hdr is not None else ""
            )
            print(f"{tag}: diffs {diffs}")
            if any(diffs) and first_bad is None:
                first_bad = i
        if first_bad is None:
            print("ALL EVENTS BIT-EXACT")
            return True
        self.analyze(first_bad)
        return False

    def analyze(self, ev_idx: int):
        kind, planes, hdr = self.events[ev_idx]
        dvf = self.dv[ev_idx]
        dm = planes[0].astype(np.int64) != dvf.planes[0].astype(np.int64)
        print(f"\n--- first diverging event {ev_idx} ---")
        blocks = [b for (fi, b) in self.blocks if fi == ev_idx]
        first = None
        for b in blocks:
            r, c, bs = b["r"], b["c"], b["bsize"]
            w, h = B.BLOCK_DIMS[bs]
            nd = int(dm[r * 4 : r * 4 + h, c * 4 : c * 4 + w].sum())
            if nd:
                first = b
                print(
                    f"first DIFF block (decode order): r{r} c{c} {w}x{h} "
                    f"mode {b['y_mode']} rf {b['ref_frames']} mvs {b['mvs']} "
                    f"skip {b['skip']} sm {b.get('skip_mode')} "
                    f"mm {b['motion_mode']} ct {b['compound_type']} "
                    f"rmi {b['ref_mv_idx']} nd {nd}"
                )
                break
        if first is None:
            print("no inter block covers the luma diff (intra or filter issue)")
            print("luma diff bbox:", np.argwhere(dm).min(0), np.argwhere(dm).max(0))
            return
        key = (ev_idx, first["r"], first["c"])
        stk = self.stacks.get(key)
        if stk is not None:
            print(f"stack: {stk.stack[:4]} weights {stk.weights[:4]} "
                  f"nfound {stk.num_found} newctx {stk.new_mv_ctx} "
                  f"refctx {stk.ref_mv_ctx} zeroctx {stk.zero_mv_ctx}")
        if first["skip"]:
            self.recover_mv(ev_idx, first, hdr)

    def recover_mv(self, ev_idx, b, hdr):
        """Brute-force the (ref content, mv) dav1d used for a skip block."""
        r, c, bs = b["r"], b["c"], b["bsize"]
        w, h = B.BLOCK_DIMS[bs]
        tgt = self.dv[ev_idx].planes[0].astype(np.int64)[
            r * 4 : r * 4 + h, c * 4 : c * 4 + w
        ]
        hits = []
        for k in range(min(ev_idx, 8)):
            if self.events[k][0] != "coded":
                continue
            ref = self.dv[k].planes[0].astype(np.int64)
            if ref.shape[0] < r * 4 + h or ref.shape[1] < c * 4 + w:
                continue
            for mvy in range(-48, 49):
                for mvx in range(-48, 49):
                    p = MC.predict_single(
                        ref, c * 4, r * 4, w, h, (mvy, mvx), 0, 0, [0, 0], 8
                    ).astype(np.int64)
                    if np.array_equal(p, tgt):
                        hits.append((k, mvy, mvx))
        print("dav1d single-ref reconstruction hits (event, mvy, mvx):",
              hits[:8], f"({len(hits)} total)")


def main():
    data = open(sys.argv[1], "rb").read()
    Differ(data).run()


if __name__ == "__main__":
    main()
