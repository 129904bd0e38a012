"""Empirical context-row sweep for the phase-c compound desync.

For every ref-syntax entropy read in frame oh=2 (up to and including the
first visibly-wrong block), re-decode the stream overriding that ONE
read's context row with each alternative, and report any override that
makes shown frame 2 bit-exact vs the dav1d oracle. A hit pinpoints a
context-derivation bug at that site; no hit means the divergence is
value-level (table content or syntax flow).

Usage: python tools/sweep_ctx.py
"""

from __future__ import annotations

import os
import sys

os.environ["LIBAVIF_TPU_NATIVE"] = "0"
sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from libavif_tpu.codec.av1 import decode as DEC  # noqa: E402
from libavif_tpu.codec.av1 import interdec as ID  # noqa: E402
from tools.inter_probe import make_frames, BASE_OFF  # noqa: E402
from libavif_tpu.interop import libavif_oracle as O  # noqa: E402
from libavif_tpu.api import Decoder  # noqa: E402

TARGET_OH = 2

HOLDER = {"oh": None, "blk": None, "site": 0}
# override: {"site": int, "row": int} — applied when HOLDER matches
OVERRIDE = {}
SITES = []  # (site_idx, blk, what, orig_row, n_rows)

_orig_block = DEC.FrameDecoder._decode_block
_orig_tile = DEC.FrameDecoder._decode_tile

CTX_FNS = {}


def install():
    def tile_wrap(self, tr, tc, data):
        HOLDER["oh"] = getattr(self.hdr, "order_hint", -1)
        HOLDER["site"] = 0
        return _orig_tile(self, tr, tc, data)

    def block_wrap(self, r, c, bsize):
        HOLDER["blk"] = (r, c)
        return _orig_block(self, r, c, bsize)

    DEC.FrameDecoder._decode_tile = tile_wrap
    DEC.FrameDecoder._decode_block = block_wrap

    # wrap the module-level ctx helpers used by _read_ref_frames
    def wrap_fn(name, fn, n_rows):
        def wrapped(*a, **k):
            row = fn(*a, **k)
            if HOLDER["oh"] == TARGET_OH:
                s = HOLDER["site"]
                HOLDER["site"] += 1
                if OVERRIDE.get("record"):
                    SITES.append((s, HOLDER["blk"], name, row, n_rows))
                if OVERRIDE.get("site") == s:
                    return OVERRIDE["row"]
            return row
        return wrapped

    CTX_FNS["_comp_mode_ctx"] = (ID._comp_mode_ctx, 5)
    CTX_FNS["_comp_ref_type_ctx"] = (ID._comp_ref_type_ctx, 5)
    ID._comp_mode_ctx = wrap_fn("comp_mode", ID._comp_mode_ctx, 5)
    ID._comp_ref_type_ctx = wrap_fn("comp_ref_type", ID._comp_ref_type_ctx, 5)

    # _ref_count_ctxs returns a dict of rows; wrap to expose each use is
    # harder — instead wrap the dict with a recording/overriding mapping.
    orig_rcc = ID._ref_count_ctxs

    class Ctxs(dict):
        def __getitem__(self, key):
            row = dict.__getitem__(self, key)
            if HOLDER["oh"] == TARGET_OH:
                s = HOLDER["site"]
                HOLDER["site"] += 1
                nrows = 3
                if OVERRIDE.get("record"):
                    SITES.append((s, HOLDER["blk"], f"cnt:{key}", row, nrows))
                if OVERRIDE.get("site") == s:
                    return OVERRIDE["row"]
            return row

    def rcc_wrap(refs):
        return Ctxs(orig_rcc(refs))

    ID._ref_count_ctxs = rcc_wrap


def decode_shown(data, n):
    d = Decoder()
    d.parse(data)
    frames = []
    for _ in range(n):
        d.next_image()
        frames.append([p.copy() for p in d.image.yuv_planes])
    return frames


def main():
    opts = dict(BASE_OFF)
    for k in ("enable-dual-filter", "enable-dist-wtd-comp",
              "enable-onesided-comp"):
        opts[k] = "1"
    data = O.encode_animation(
        make_frames(6), depth=8, yuv_format="yuv420", quality=60, speed=6,
        keyframe_interval=0, codec_options=opts,
    )
    oracle = O.decode_frames(data)
    install()

    def frame2_ok():
        try:
            fr = decode_shown(data, 3)
        except Exception:
            return False
        return all(
            np.array_equal(m.astype(np.int64), o.astype(np.int64))
            for m, o in zip(fr[2], oracle[2].planes)
        )

    # record pass
    OVERRIDE.clear()
    OVERRIDE["record"] = True
    base_ok = frame2_ok()
    OVERRIDE.clear()
    print(f"baseline frame2 exact: {base_ok}; {len(SITES)} ctx sites in oh=2")
    if base_ok:
        return 0
    # sweep: limit to sites at blocks up to the first bad one if known
    tried = 0
    for s, blk, name, row, nrows in SITES:
        for alt in range(nrows):
            if alt == row:
                continue
            OVERRIDE.clear()
            OVERRIDE["site"] = s
            OVERRIDE["row"] = alt
            tried += 1
            if frame2_ok():
                print(f"HIT: site {s} blk={blk} what={name} row {row} -> {alt}")
                return 0
        if s % 25 == 0:
            print(f"  ... swept through site {s} ({tried} decodes)")
    print(f"no single-ctx override fixes frame 2 ({tried} tried)")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
