"""Rate-distortion report: this framework vs Pillow→libavif→libaom.

Produces a markdown table of (bytes, Y-PSNR) at matched nominal quality
plus matched-rate interpolation, over synthetic mixed content. Run on CPU:

    python tools/rd_report.py [out.md]
"""

import io
import sys

import numpy as np


def main(out_path=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    import bench as B
    from libavif_tpu.api import decode, encode

    try:
        from PIL import Image as PIL
    except ImportError:
        print("Pillow unavailable")
        return 1

    def psnr(a, b):
        mse = np.mean((a.astype(np.int64) - b.astype(np.int64)) ** 2)
        return 10 * np.log10(255**2 / max(mse, 1e-9))

    kodim = "/root/reference/tests/data/kodim23_yuv420_8bpc.y4m"
    import os

    if os.path.exists(kodim):
        from libavif_tpu.io_formats.y4m import read_y4m

        img = read_y4m(kodim)
        content = "kodim23 (768x512 natural photo, BASELINE.md config 1)"
    else:
        img = B.make_yuv_image(seed=7)
        content = "768x512 synthetic gradients + texture + noise"
    lines = [
        "# Rate-distortion vs libaom (via Pillow/libavif)",
        "",
        f"Content: {content}. Y-plane PSNR.",
        "",
        "| q | ours bytes | ours dB | libaom bytes | libaom dB |",
        "|---|---|---|---|---|",
    ]
    H, W = img.height, img.width
    rgb = np.stack(
        [
            img.yuv_planes[0],
            np.repeat(np.repeat(img.yuv_planes[1], 2, 0), 2, 1)[:H, :W],
            np.repeat(np.repeat(img.yuv_planes[2], 2, 0), 2, 1)[:H, :W],
        ],
        axis=-1,
    )
    pim = PIL.fromarray(rgb, "RGB")
    for q in (50, 65, 75, 85, 95):
        ours = encode(img, quality=q)
        out = decode(ours)
        odb = psnr(out.yuv_planes[0], img.yuv_planes[0])
        buf = io.BytesIO()
        pim.save(buf, format="AVIF", quality=q)
        dec = np.asarray(PIL.open(io.BytesIO(buf.getvalue())).convert("RGB"))
        adb = psnr(dec[..., 0], rgb[..., 0])
        lines.append(
            f"| {q} | {len(ours)} | {odb:.2f} | {len(buf.getvalue())} | {adb:.2f} |"
        )
    text = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
