"""Rate-distortion report: this framework vs real libaom, YUV-native.

Methodology (fixes VERDICT.md round-1 "What's weak" #1):
  - Both codecs are fed the SAME native YUV 4:2:0 planes from the
    reference corpus y4m files. No RGB conversion anywhere: libaom is
    driven through the libavif oracle (interop/libavif_oracle.py) at the
    plane level, and distortion is Y-plane PSNR measured in YUV domain
    on both sides.
  - Table rows are nominal-quality sweeps; the summary line reports the
    dB delta at matched rate (libaom's PSNR log-interpolated at our
    byte sizes), which is the comparable figure.

Run on CPU:  python tools/rd_report.py [out.md]
"""

import os
import sys

import numpy as np


def psnr(a, b):
    mse = np.mean((np.asarray(a).astype(np.int64) - np.asarray(b).astype(np.int64)) ** 2)
    return 10 * np.log10(255**2 / max(mse, 1e-9))


def interp_db_at_rate(rates, dbs, target_rate):
    """Piecewise-linear interpolation of PSNR vs log(bytes)."""
    lr = np.log(np.asarray(rates, dtype=np.float64))
    dbs = np.asarray(dbs, dtype=np.float64)
    order = np.argsort(lr)
    return float(np.interp(np.log(target_rate), lr[order], dbs[order]))


def main(out_path=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    from libavif_tpu.api import decode, encode
    from libavif_tpu.interop import libavif_oracle as oracle
    from libavif_tpu.io_formats.y4m import read_y4m

    if not oracle.available():
        print("libavif oracle unavailable; no defensible baseline — aborting")
        return 1

    sources = [
        p
        for p in (
            "/root/reference/tests/data/kodim03_yuv420_8bpc.y4m",
            "/root/reference/tests/data/kodim23_yuv420_8bpc.y4m",
        )
        if os.path.exists(p)
    ]
    if not sources:
        print("kodim corpus unavailable")
        return 1

    qualities = (50, 65, 75, 85, 95)
    lines = [
        "# Rate-distortion vs libaom (YUV-native, Y-PSNR in YUV domain)",
        "",
        f"Baseline: {oracle.versions()} via libavif oracle, speed 6, native",
        "YUV 4:2:0 input (no RGB conversion on either side). Distortion is",
        "Y-plane PSNR against the original y4m. Quality values are each",
        "codec's own nominal scale; compare at matched rate (summary below).",
        "",
    ]
    deltas = []
    for src in sources:
        img = read_y4m(src)
        name = os.path.basename(src)
        y0 = img.yuv_planes[0]
        planes = [img.yuv_planes[0], img.yuv_planes[1], img.yuv_planes[2]]
        lines += [
            f"## {name} ({img.width}x{img.height})",
            "",
            "| q | ours bytes | ours Y dB | libaom bytes | libaom Y dB |",
            "|---|---|---|---|---|",
        ]
        ours_pts, aom_pts = [], []
        for q in qualities:
            ours = encode(img, quality=q)
            out = decode(ours)
            odb = psnr(out.yuv_planes[0], y0)
            ours_pts.append((len(ours), odb))
            data = oracle.encode(
                planes, quality=q, speed=6, max_threads=os.cpu_count() or 1
            )
            dec = oracle.decode(data)
            adb = psnr(dec.planes[0], y0)
            aom_pts.append((len(data), adb))
            lines.append(f"| {q} | {len(ours)} | {odb:.2f} | {len(data)} | {adb:.2f} |")
        rates_a = [r for r, _ in aom_pts]
        dbs_a = [d for _, d in aom_pts]
        lo, hi = min(rates_a), max(rates_a)
        per_img = []
        for r, d in ours_pts:
            if lo <= r <= hi:  # only compare inside libaom's measured range
                per_img.append(d - interp_db_at_rate(rates_a, dbs_a, r))
        if per_img:
            deltas += per_img
            lines += [
                "",
                f"Matched-rate Y-PSNR delta (ours - libaom) over {len(per_img)} "
                f"in-range points: **{np.mean(per_img):+.2f} dB** "
                f"(min {min(per_img):+.2f}, max {max(per_img):+.2f})",
                "",
            ]
    if deltas:
        lines += [
            "## Summary",
            "",
            f"Mean matched-rate Y-PSNR delta vs libaom speed 6: "
            f"**{np.mean(deltas):+.2f} dB** across {len(deltas)} points. "
            "Negative means libaom is ahead at equal bytes.",
            "",
        ]
    text = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
