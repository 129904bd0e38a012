"""Minimal encode example (reference: examples/avif_example_encode.c)."""

import numpy as np

from libavif_tpu.api import Encoder
from libavif_tpu.constants import PixelFormat
from libavif_tpu.image import Image, RGBImage
from libavif_tpu.pixels.reformat import image_rgb_to_yuv

# Build an RGB test card and convert to YUV 4:2:0.
W, H = 320, 240
rgb = RGBImage(W, H, depth=8)
rgb.pixels = np.zeros((H, W, 4), dtype=np.uint8)
rgb.pixels[..., 0] = np.linspace(0, 255, W, dtype=np.uint8)[None, :]
rgb.pixels[..., 1] = np.linspace(0, 255, H, dtype=np.uint8)[:, None]
rgb.pixels[..., 2] = 128
rgb.pixels[..., 3] = 255

image = Image(W, H, 8, PixelFormat.YUV420)
image_rgb_to_yuv(rgb, image)

encoder = Encoder()
encoder.quality = 80
data = encoder.write(image)
with open("example_out.avif", "wb") as f:
    f.write(data)
print(f"wrote example_out.avif ({len(data)} bytes)")
