"""Round-5 repro: default-settings aom animations, 128x96 smoothed moving
texture, speeds 2-8 — must be bit-exact vs dav1d (VERDICT r4 missing #1).

Usage: python tools/gm_probe.py [--speeds 2,3,...] [--opts k=v,...]
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from libavif_tpu.api import Decoder  # noqa: E402
from libavif_tpu.interop import libavif_oracle as O  # noqa: E402


def smooth_frames(n=4, w=128, h=96, seed=7, depth=8):
    rng = np.random.default_rng(seed)
    maxv = (1 << depth) - 1
    base = rng.integers(0, maxv + 1, (h + 64, w + 64)).astype(np.float32)
    # box-filter to smooth (5x5)
    k = 5
    c = np.cumsum(np.cumsum(base, 0), 1)
    c = np.pad(c, ((1, 0), (1, 0)))
    sm = (c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]) / (k * k)
    frames = []
    for t in range(n):
        dx, dy = 3 * t, 2 * t
        y = sm[dy : dy + h, dx : dx + w]
        yy = np.clip(y, 0, maxv).astype(np.uint8 if depth <= 8 else np.uint16)
        u = np.full(((h + 1) // 2, (w + 1) // 2), (maxv * 2) // 5, dtype=yy.dtype)
        v = np.full(((h + 1) // 2, (w + 1) // 2), (maxv * 3) // 5, dtype=yy.dtype)
        frames.append([yy, u, v])
    return frames


def run(speed, opts=None, quality=60, n=4, w=128, h=96):
    frames = smooth_frames(n=n, w=w, h=h)
    data = O.encode_animation(
        frames, depth=8, yuv_format="yuv420", quality=quality, speed=speed,
        keyframe_interval=0, codec_options=opts,
    )
    oracle = O.decode_frames(data)
    d = Decoder()
    d.parse(data)
    ok = True
    for i, ofr in enumerate(oracle):
        try:
            d.next_image()
        except Exception as e:
            print(f"  s{speed} frame {i}: DECODE FAIL: {type(e).__name__}: {e}")
            return False
        ours = d.image
        for ci, op in enumerate(ofr.planes):
            mine = ours.yuv_planes[ci]
            neq = mine.astype(np.int64) != op.astype(np.int64)
            if neq.any():
                diff = np.argwhere(neq)
                print(
                    f"  s{speed} frame {i} plane {ci}: {len(diff)} px differ "
                    f"(of {neq.size}), first {diff[0]} mine={mine[tuple(diff[0])]} "
                    f"oracle={op[tuple(diff[0])]}"
                )
                ok = False
                break
        if not ok:
            return False
    print(f"  s{speed}: OK ({len(oracle)} frames bit-exact)")
    return True


def main():
    speeds = [2, 3, 4, 5, 6, 7, 8]
    opts = None
    for a in sys.argv[1:]:
        if a.startswith("--speeds"):
            speeds = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--opts"):
            opts = dict(kv.split("=") for kv in a.split("=", 1)[1].split(","))
    all_ok = True
    for s in speeds:
        all_ok &= run(s, opts)
    print("ALL OK" if all_ok else "FAILURES")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
