"""Headline bench: still-image encode throughput (MP/s) at q75 4:2:0.

BASELINE.md config 1: "MP/s/chip > avifenc/avifdec on 32-core CPU". The
CPU reference is measured live via Pillow's AVIF plugin (real libavif +
libaom at quality 75) on the same pixels; `vs_baseline` is ours/theirs.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: the wavefront programs are large and the
# axon remote-compile path is slow; cache across bench invocations. The
# image's sitecustomize imports jax before this module runs, so set the
# live config (env vars alone would be read too late).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/libavif_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
try:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/libavif_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

W, H = 768, 512  # kodim-class frame
QUALITY = 75
RUNS = 5
BATCH = 8  # sustained-throughput batch (pipelined device/host overlap)


def make_yuv_image(seed=42):
    from libavif_tpu.constants import PixelFormat
    from libavif_tpu.image import Image

    rng = np.random.default_rng(seed)
    img = Image(W, H, 8, PixelFormat.YUV420)
    img.allocate_planes("yuv")
    yy, xx = np.mgrid[0:H, 0:W]
    # natural-ish content: gradients + low-frequency texture + mild noise
    base = 96 + 64 * np.sin(yy / 37.0) + 48 * np.cos(xx / 53.0)
    img.yuv_planes[0][:] = np.clip(
        base + rng.normal(0, 6, (H, W)), 0, 255
    ).astype(np.uint8)
    for c in (1, 2):
        h, w = img.yuv_planes[c].shape
        yy2, xx2 = np.mgrid[0:h, 0:w]
        img.yuv_planes[c][:] = np.clip(
            128 + 40 * np.sin((xx2 + 60 * c) / 41.0) + rng.normal(0, 3, (h, w)),
            0,
            255,
        ).astype(np.uint8)
    return img


def bench_ours(imgs):
    """Sustained MP/s: pipelined batch encode (device compute overlaps
    host entropy across frames — the production serving path)."""
    from libavif_tpu.api import encode_batch

    encode_batch(imgs[:1], quality=QUALITY)  # warm-up: jit compile
    encode_batch(imgs, quality=QUALITY)  # warm-up: steady-state path
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        encode_batch(imgs, quality=QUALITY)
        best = min(best, time.perf_counter() - t0)
    return (len(imgs) * W * H / 1e6) / best


def bench_pillow_baseline(imgs):
    """CPU reference: Pillow→libavif→libaom on the same batch."""
    try:
        import io

        from PIL import Image as PILImage
    except ImportError:
        return None
    pims = []
    for img in imgs:
        rgb = np.stack(
            [
                img.yuv_planes[0],
                np.repeat(np.repeat(img.yuv_planes[1], 2, 0), 2, 1)[:H, :W],
                np.repeat(np.repeat(img.yuv_planes[2], 2, 0), 2, 1)[:H, :W],
            ],
            axis=-1,
        )
        pims.append(PILImage.fromarray(rgb, "RGB"))
    try:
        buf = io.BytesIO()
        pims[0].save(buf, format="AVIF", quality=QUALITY)  # warm-up
    except Exception:
        return None
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        for pim in pims:
            buf = io.BytesIO()
            pim.save(buf, format="AVIF", quality=QUALITY)
        best = min(best, time.perf_counter() - t0)
    return (len(imgs) * W * H / 1e6) / best


def main():
    imgs = [make_yuv_image(seed=100 + i) for i in range(BATCH)]
    ours = bench_ours(imgs)
    baseline = bench_pillow_baseline(imgs)
    vs = (ours / baseline) if baseline else 0.0
    print(
        json.dumps(
            {
                "metric": "still_encode_q75_420",
                "value": round(ours, 4),
                "unit": "MP/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
