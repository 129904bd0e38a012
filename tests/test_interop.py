"""Product-level AVIF interop: the reason libavif exists (VERDICT.md §2.2).

- Files written by our Encoder (lossless) decode in Pillow's real AVIF
  stack (libavif + dav1d).
- Foreign AVIF files written by libavif + libaom decode bit-exact through
  our public Decoder API.
"""

import io

import numpy as np
import pytest

from libavif_tpu.api import decode, encode
from libavif_tpu.constants import PixelFormat
from libavif_tpu.image import Image
from libavif_tpu.interop import libavif_oracle as oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="libavif oracle unavailable"
)


def _image(w, h, fmt=PixelFormat.YUV420, seed=9, alpha=False):
    rng = np.random.RandomState(seed)
    img = Image(w, h, 8, fmt)
    img.allocate_planes("all" if alpha else "yuv")
    for p in img.yuv_planes:
        if p is not None:
            p[:] = (rng.rand(*p.shape) * 255).astype(np.uint8)
    if alpha:
        img.alpha_plane[:] = (rng.rand(h, w) * 255).astype(np.uint8)
    return img


def test_our_lossless_opens_in_pillow():
    from PIL import Image as PImage

    img = _image(48, 32)
    data = encode(img, quality=100)
    pim = PImage.open(io.BytesIO(data))
    pim.load()
    assert pim.size == (48, 32)


def test_our_lossless_decodes_in_dav1d_bit_exact():
    img = _image(64, 48)
    data = encode(img, quality=100)
    im = oracle.decode(data, codec="dav1d")
    for ref, src in zip(im.planes, img.yuv_planes):
        assert np.array_equal(ref, src)


def test_our_lossless_alpha_in_pillow():
    from PIL import Image as PImage

    img = _image(24, 24, PixelFormat.YUV444, alpha=True)
    data = encode(img, quality=100)
    pim = PImage.open(io.BytesIO(data))
    pim.load()
    assert pim.mode == "RGBA"


def test_foreign_lossless_decodes_here_bit_exact():
    img = _image(80, 56, seed=4)
    planes = [img.yuv_planes[0], img.yuv_planes[1], img.yuv_planes[2]]
    foreign = oracle.encode(planes, quality=100, speed=6)
    out = decode(foreign)
    for ours, src in zip(out.yuv_planes, planes):
        assert np.array_equal(ours, src)


def test_foreign_lossy_decodes_bit_exact():
    img = _image(32, 32, seed=6)
    planes = [img.yuv_planes[0], img.yuv_planes[1], img.yuv_planes[2]]
    foreign = oracle.encode(planes, quality=60, speed=8)
    ref = oracle.decode(foreign)
    out = decode(foreign)
    for ours, want in zip(out.yuv_planes, ref.planes):
        assert np.array_equal(ours, want)


def test_spec_lossy_decodes_in_libaom_bit_exact():
    """Our spec-AV1 lossy output must pass libaom's strict checks
    (trailing-bits termination, §8.2.4) and decode bit-exact — dav1d
    alone is too lenient to prove conformance."""
    from libavif_tpu.codec.av1.encode import encode_lossy_still
    from libavif_tpu.codec.av1.stream import StreamDecoder
    from libavif_tpu.interop import aom_oracle

    if not aom_oracle.available():
        pytest.skip("libaom unavailable")
    rng = np.random.RandomState(17)
    for (w, h), q in (((64, 48), 60), ((33, 17), 120)):
        planes = [
            (rng.rand(h, w) * 255).astype(np.uint8),
            (rng.rand((h + 1) // 2, (w + 1) // 2) * 255).astype(np.uint8),
            (rng.rand((h + 1) // 2, (w + 1) // 2) * 255).astype(np.uint8),
        ]
        data = encode_lossy_still(planes, q)
        aom_planes = aom_oracle.decode_raw(data)
        assert aom_planes is not None, "libaom rejected the stream"
        ours = StreamDecoder().decode_obus(data)[0][0]
        for a, b in zip(aom_planes, ours):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
