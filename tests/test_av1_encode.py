"""Spec AV1 encode conformance: files we write decode in real dav1d.

Realizes SURVEY.md §7 step 4's acceptance ("our encode -> avifdec
decodes") for the lossless path: encode_lossless_still payloads wrapped
in our container must decode bit-exact through the libavif/dav1d oracle
and through our own spec decoder.
"""

import numpy as np
import pytest

from libavif_tpu.codec.av1.encode import encode_lossless_still, fwht4x4_levels
from libavif_tpu.codec.av1.still import decode_still
from libavif_tpu.codec.av1.transforms import inverse_wht4x4
from libavif_tpu.constants import Range
from libavif_tpu.containers.items import (
    CodecConfiguration,
    ColorInformation,
    ImageSpatialExtents,
    PixelInformation,
    Property,
)
from libavif_tpu.containers.write import OutputItem, write_still
from libavif_tpu.interop import libavif_oracle as oracle


def test_fwht_inverts_spec_iwht():
    rng = np.random.RandomState(0)
    for _ in range(200):
        res = rng.randint(-255, 256, (4, 4)).astype(np.int32)
        lv = fwht4x4_levels(res)
        assert np.array_equal(inverse_wht4x4(lv * 4, shift=2), res)


def _wrap(payload, w, h, mono=False):
    cfg = CodecConfiguration(
        monochrome=1 if mono else 0,
        chroma_subsampling_x=1,
        chroma_subsampling_y=1,
    )
    item = OutputItem(
        id=1,
        item_type="av01",
        payload=payload,
        properties=[
            Property("ispe", ImageSpatialExtents(w, h)),
            Property("pixi", PixelInformation(plane_depths=[8] * (1 if mono else 3))),
            Property("av1C", cfg),
            Property("colr", ColorInformation(
                has_nclx=True, color_primaries=2, transfer_characteristics=2,
                matrix_coefficients=2, yuv_range=Range.FULL)),
        ],
    )
    return write_still([item], 1)


def _planes(w, h, seed=1):
    rng = np.random.RandomState(seed)
    return [
        (rng.rand(h, w) * 255).astype(np.uint8),
        (rng.rand((h + 1) // 2, (w + 1) // 2) * 255).astype(np.uint8),
        (rng.rand((h + 1) // 2, (w + 1) // 2) * 255).astype(np.uint8),
    ]


def test_lossless_encode_self_decode():
    pl = _planes(32, 32)
    payload = encode_lossless_still(pl)
    out, seq, hdr = decode_still(payload)
    for ours, src in zip(out, pl):
        assert np.array_equal(ours.astype(np.uint8), src)


@pytest.mark.skipif(not oracle.available(), reason="oracle unavailable")
def test_lossless_encode_dav1d_decodes():
    pl = _planes(64, 48)
    payload = encode_lossless_still(pl)
    avif = _wrap(payload, 64, 48)
    im = oracle.decode(avif, codec="dav1d")
    assert im.yuv_format == "yuv420" and (im.width, im.height) == (64, 48)
    for ref, src in zip(im.planes, pl):
        assert np.array_equal(ref, src)


@pytest.mark.skipif(not oracle.available(), reason="oracle unavailable")
def test_lossless_encode_unaligned_dims():
    pl = _planes(68, 20, seed=3)
    payload = encode_lossless_still(pl)
    avif = _wrap(payload, 68, 20)
    im = oracle.decode(avif)
    for ref, src in zip(im.planes, pl):
        assert np.array_equal(ref, src)


@pytest.mark.skipif(not oracle.available(), reason="oracle unavailable")
def test_lossless_encode_pillow_opens():
    from PIL import Image
    import io

    pl = _planes(32, 32, seed=2)
    avif = _wrap(encode_lossless_still(pl), 32, 32)
    pim = Image.open(io.BytesIO(avif))
    pim.load()
    assert pim.size == (32, 32)
