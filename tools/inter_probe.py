"""Inter-decode bring-up harness: controlled aom animations vs dav1d.

Generates small animated AVIFs through the libavif/aom oracle with
specific coding tools enabled/disabled (codec_options passthrough), then
decodes them with our spec decoder and compares every frame bit-exactly
against dav1d's output. Used to validate the inter syntax/MC stack one
tool at a time (phase gates mirror ROUND3 plan).

Usage: python tools/inter_probe.py [phase...]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from libavif_tpu.api import Decoder  # noqa: E402
from libavif_tpu.interop import libavif_oracle as O  # noqa: E402

BASE_OFF = {
    "enable-obmc": "0",
    "enable-warped-motion": "0",
    "enable-global-motion": "0",
    "enable-ref-frame-mvs": "0",
    "enable-dual-filter": "0",
    "enable-masked-comp": "0",
    "enable-diff-wtd-comp": "0",
    "enable-interinter-wedge": "0",
    "enable-interintra-comp": "0",
    "enable-interintra-wedge": "0",
    "enable-smooth-interintra": "0",
    "enable-dist-wtd-comp": "0",
    "enable-onesided-comp": "0",
}

PHASES = {}


def phase(name):
    def deco(fn):
        PHASES[name] = fn
        return fn

    return deco


def make_frames(n=4, w=64, h=64, seed=7, depth=8):
    """Moving-blob content that yields real motion vectors."""
    rng = np.random.default_rng(seed)
    maxv = (1 << depth) - 1
    # shifted-noise content: each frame is an exact translation of the
    # base, so motion search finds clean integer/subpel MVs
    base = rng.integers(0, maxv + 1, (h + 32, w + 32)).astype(np.float32)
    frames = []
    for t in range(n):
        dx, dy = 2 * t, t
        y = base[dy : dy + h, dx : dx + w]
        yy = y.astype(np.uint16 if depth > 8 else np.uint8)
        u = np.full(((h + 1) // 2, (w + 1) // 2), (maxv * 2) // 5, dtype=yy.dtype)
        v = np.full(((h + 1) // 2, (w + 1) // 2), (maxv * 3) // 5, dtype=yy.dtype)
        frames.append([yy, u, v])
    return frames


def run_case(name, frames, opts, quality=60, speed=6, depth=8, keyint=0,
             fmt="yuv420"):
    data = O.encode_animation(
        frames, depth=depth, yuv_format=fmt, quality=quality, speed=speed,
        keyframe_interval=keyint, codec_options=opts,
    )
    oracle = O.decode_frames(data)
    d = Decoder()
    d.parse(data)
    n_ok = 0
    for i, ofr in enumerate(oracle):
        try:
            d.next_image()
        except Exception as e:
            print(f"  [{name}] frame {i}: DECODE FAIL: {e}")
            return False
        ours = d.image
        for ci, op in enumerate(ofr.planes):
            mine = ours.yuv_planes[ci]
            if not np.array_equal(mine.astype(np.int64), op.astype(np.int64)):
                diff = np.argwhere(mine.astype(np.int64) != op.astype(np.int64))
                print(
                    f"  [{name}] frame {i} plane {ci}: {len(diff)} px differ, "
                    f"first {diff[0]} mine={mine[tuple(diff[0])]} oracle={op[tuple(diff[0])]}"
                )
                return False
        n_ok += 1
    print(f"  [{name}] OK ({n_ok} frames bit-exact)")
    return True


@phase("a")
def phase_a():
    """Minimal toolset: single-ref translational, no tpl MVs."""
    ok = True
    frames = make_frames(4)
    ok &= run_case("a.q60.s6", frames, dict(BASE_OFF), quality=60, speed=6)
    ok &= run_case("a.q85.s4", frames, dict(BASE_OFF), quality=85, speed=4)
    ok &= run_case("a.q35.s8", frames, dict(BASE_OFF), quality=35, speed=8)
    ok &= run_case("a.8fr", make_frames(8, 96, 48), dict(BASE_OFF), quality=70)
    return ok


@phase("b")
def phase_b():
    """+ ref-frame-mvs (temporal projection)."""
    opts = dict(BASE_OFF)
    opts["enable-ref-frame-mvs"] = "1"
    return run_case("b.tpl", make_frames(6), opts, quality=60)


@phase("c")
def phase_c():
    """+ dual filter, dist-wtd comp, onesided comp."""
    opts = dict(BASE_OFF)
    for k in ("enable-dual-filter", "enable-dist-wtd-comp", "enable-onesided-comp"):
        opts[k] = "1"
    return run_case("c.filters", make_frames(6), opts, quality=60)


@phase("d")
def phase_d():
    """+ global motion, obmc, warped (reconstruction phases)."""
    opts = dict(BASE_OFF)
    for k in ("enable-global-motion", "enable-obmc", "enable-warped-motion"):
        opts[k] = "1"
    return run_case("d.motion", make_frames(6), opts, quality=60)


@phase("e")
def phase_e():
    """Everything on (aom defaults)."""
    return run_case("e.default", make_frames(6), None, quality=60)


def main():
    names = sys.argv[1:] or ["a"]
    all_ok = True
    for n in names:
        print(f"phase {n}:")
        all_ok &= bool(PHASES[n]())
    print("ALL OK" if all_ok else "FAILURES")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
