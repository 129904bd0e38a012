"""Locate the FIRST misread entropy symbol in a failing probe stream.

Wraps every tile decode in a RecordingDecoder (tools/transcode_check),
then replays each tile's op log through exact encoder interval math and
reports the first op where the original tile bytes leave the interval —
i.e. the first symbol our decoder interpreted differently from what the
(aom) encoder wrote.

Usage: python tools/find_desync.py [phase]   (default: c)
"""

from __future__ import annotations

import os
import sys

os.environ["LIBAVIF_TPU_NATIVE"] = "0"
sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from libavif_tpu.codec.av1 import decode as DEC  # noqa: E402
from tools.transcode_check import RecordingDecoder, first_divergence  # noqa: E402
from tools.inter_probe import make_frames, BASE_OFF  # noqa: E402
from libavif_tpu.interop import libavif_oracle as O  # noqa: E402
from libavif_tpu.api import Decoder  # noqa: E402

HOLDER = {"frame": None, "blk": None, "n": 0}
TILES = []  # (frame_label, data, log)


def install():
    orig_block = DEC.FrameDecoder._decode_block
    orig_tile = DEC.FrameDecoder._decode_tile

    def labeler():
        return (HOLDER["frame"], HOLDER["blk"])

    def rec_factory(data):
        log = []
        TILES.append((HOLDER["frame"], data, log))
        return RecordingDecoder(data, log, labeler)

    def block_wrap(self, r, c, bsize):
        HOLDER["blk"] = (r, c, bsize)
        return orig_block(self, r, c, bsize)

    def tile_wrap(self, tr, tc, data):
        HOLDER["frame"] = (
            getattr(self.hdr, "order_hint", -1),
            getattr(self.hdr, "frame_type", -1),
            HOLDER["n"],
        )
        HOLDER["n"] += 1
        return orig_tile(self, tr, tc, data)

    DEC.MsacDecoder = rec_factory
    DEC.FrameDecoder._decode_block = block_wrap
    DEC.FrameDecoder._decode_tile = tile_wrap


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "c"
    opts = dict(BASE_OFF)
    if phase == "c":
        for k in ("enable-dual-filter", "enable-dist-wtd-comp",
                  "enable-onesided-comp"):
            opts[k] = "1"
    elif phase == "b":
        opts["enable-ref-frame-mvs"] = "1"
    elif phase == "e":
        opts = None
    data = O.encode_animation(
        make_frames(6), depth=8, yuv_format="yuv420", quality=60, speed=6,
        keyframe_interval=0, codec_options=opts,
    )
    install()
    d = Decoder()
    d.parse(data)
    nframes = 0
    while True:
        try:
            d.next_image()
            nframes += 1
        except Exception as e:
            print(f"stream walk stopped after {nframes} frames: {e}")
            break
        if nframes >= 6:
            break
    print(f"decoded {nframes} frames, {len(TILES)} tiles recorded")
    for fl, tdata, log in TILES:
        i, op = first_divergence(tdata, log)
        if i is None:
            print(f"tile frame={fl}: {len(log)} ops, consistent")
        else:
            print(f"tile frame={fl}: FIRST DIVERGENCE at op {i}/{len(log)}")
            for j in range(max(0, i - 12), min(len(log), i + 4)):
                kind, val, snap, n, what, lbl = log[j]
                mark = " <-- FIRST BAD" if j == i else ""
                snapstr = list(map(int, snap[:n])) if snap is not None else None
                print(f"  op{j}: {kind} v={val} n={n} what={what} blk={lbl[1]}"
                      f" cdf={snapstr}{mark}")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
