"""Triage a failing animation stream: find the first diverging coded
event vs dav1d, classify the divergence by reconstruction stage
(pre-filter / post-deblock / post-cdef / final), and report the first
diverging block region.

Usage: python tools/triage.py <file.avif>
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from libavif_tpu.api import Decoder  # noqa: E402
from libavif_tpu.interop import dav1d_oracle as DV  # noqa: E402
import libavif_tpu.codec.av1.loopfilter as LF  # noqa: E402
import libavif_tpu.codec.av1.decode as DEC  # noqa: E402
import libavif_tpu.codec.av1.stream as S  # noqa: E402


def payloads_of(data: bytes):
    d = Decoder()
    d.parse(data)
    st = d._color_track.sample_table
    return [data[off : off + size] for off, size in st.sample_ranges()]


def main(path):
    data = open(path, "rb").read()
    payloads = payloads_of(data)
    dv_full = DV.decode_obus(payloads, all_frames=True)
    dv_nof = DV.decode_obus(payloads, all_frames=True, inloop_filters=0)
    dv_lf = DV.decode_obus(payloads, all_frames=True, inloop_filters=1)

    stages = []  # per coded frame: dict(stage -> planes)
    olff = LF.loop_filter_frame
    odt = DEC.FrameDecoder.decode_tiles

    def wdt(self, tiles):
        cap = {}
        stages.append(cap)

        def wlf(dec, **k):
            cap["pre"] = [p.copy() for p in dec.planes]
            r = olff(dec, **k)
            cap["deblock"] = [p.copy() for p in dec.planes]
            return r

        LF.loop_filter_frame = wlf
        try:
            out = odt(self, tiles)
        finally:
            LF.loop_filter_frame = olff
        if "pre" not in cap:  # lossless/intrabc: lf skipped entirely
            cap["pre"] = cap["deblock"] = [p.copy() for p in out]
        cap["final"] = [p.copy() for p in out]
        cap["oh"] = getattr(self.hdr, "order_hint", -1)
        return out

    DEC.FrameDecoder.decode_tiles = wdt
    d = Decoder()
    d.parse(data)
    n = d.image_count
    for i in range(n):
        try:
            d.next_image()
        except Exception as e:
            print(f"display frame {i}: RAISE {type(e).__name__}: {e}")
            break
    DEC.FrameDecoder.decode_tiles = odt

    for ei, cap in enumerate(stages):
        if ei >= len(dv_full):
            break
        row = [f"event {ei} oh={cap['oh']}"]
        first_bad = None
        for sname, ref in (("pre", dv_nof), ("deblock", dv_lf), ("final", dv_full)):
            diffs = []
            for ci in range(len(ref[ei].planes)):
                a = cap[sname][ci]
                b = ref[ei].planes[ci]
                a = np.asarray(a)[: b.shape[0], : b.shape[1]].astype(np.int64)
                neq = a != b.astype(np.int64)
                diffs.append(int(neq.sum()))
                if neq.any() and first_bad is None:
                    ys, xs = np.nonzero(neq)
                    first_bad = (sname, ci, int(ys[0]), int(xs[0]))
            row.append(f"{sname}:{diffs}")
        print("  ".join(row))
        if first_bad:
            print(f"  divergence at stage={first_bad[0]} plane={first_bad[1]} "
                  f"px=({first_bad[2]},{first_bad[3]})")
            if first_bad[0] == "final" or "final" in str(row[-1]) and any(
                int(x) for x in []
            ):
                pass
        # stop once the FINAL picture differs (that's what propagates)
        fdiffs = [
            int((np.asarray(cap["final"][ci])[: dv_full[ei].planes[ci].shape[0],
                                              : dv_full[ei].planes[ci].shape[1]].astype(np.int64)
                 != dv_full[ei].planes[ci].astype(np.int64)).sum())
            for ci in range(len(dv_full[ei].planes))
        ]
        if any(fdiffs):
            return 1
    print("clean (no final-stage divergence)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1]))
