"""Minimal file-decode example (reference: examples/avif_example_decode_file.c)."""

import sys

from libavif_tpu.api import Decoder
from libavif_tpu.image import RGBImage
from libavif_tpu.pixels.reformat import image_yuv_to_rgb

path = sys.argv[1] if len(sys.argv) > 1 else "example_out.avif"

decoder = Decoder()
decoder.set_io_file(path)
decoder.parse()
print(f"parsed: {decoder.image_count} image(s), alpha={decoder.alpha_present}")
while decoder.next_image():
    image = decoder.image
    rgb = RGBImage.from_image(image)
    image_yuv_to_rgb(image, rgb)
    print(
        f"frame {decoder.image_index}: {image.width}x{image.height} "
        f"depth={image.depth} rgb shape={rgb.pixels.shape}"
    )
