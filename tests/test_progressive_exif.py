"""Progressive (a1lx) decode + Exif orientation tests.

Reference tiers: avifprogressivetest.cc, avifmetadatatest.cc Exif cases.
"""

import struct

import numpy as np
import pytest

from libavif_tpu.api import Decoder, Encoder, decode
from libavif_tpu.api.decoder import ProgressiveState
from libavif_tpu.constants import PixelFormat, TransformFlags
from libavif_tpu.image import Image
from libavif_tpu.utils import exif as exif_util


def make_image(width=48, height=32, seed=0):
    rng = np.random.default_rng(seed)
    img = Image(width, height, 8, PixelFormat.YUV420)
    img.allocate_planes("yuv")
    yy, xx = np.mgrid[0:height, 0:width]
    img.yuv_planes[0][:] = ((yy * 4 + xx * 2) % 256).astype(np.uint8)
    img.yuv_planes[1][:] = rng.integers(60, 200, img.yuv_planes[1].shape).astype(np.uint8)
    img.yuv_planes[2][:] = 128
    return img


class TestProgressive:
    @pytest.fixture(scope="class")
    def progressive_file(self):
        img = make_image()
        enc = Encoder()
        data = enc.write_progressive(img, [20, 60, 100])
        return img, data

    def test_default_decode_gets_best_layer(self, progressive_file):
        img, data = progressive_file
        out = decode(data)  # non-progressive decoders see the final layer
        for c in range(3):
            np.testing.assert_array_equal(out.yuv_planes[c], img.yuv_planes[c])

    def test_progressive_layers_improve(self, progressive_file):
        img, data = progressive_file
        d = Decoder()
        d.allow_progressive = True
        d.parse(data)
        assert d.progressive_state == ProgressiveState.ACTIVE
        assert d.image_count == 3
        errs = []
        while d.next_image():
            e = d.image.yuv_planes[0].astype(np.int64) - img.yuv_planes[0].astype(
                np.int64
            )
            errs.append(float(np.mean(e**2)))
        assert len(errs) == 3
        assert errs[0] >= errs[1] >= errs[2]
        assert errs[2] == 0.0  # last layer lossless

    def test_progressive_available_when_not_enabled(self, progressive_file):
        _, data = progressive_file
        d = Decoder()
        d.parse(data)
        assert d.progressive_state == ProgressiveState.AVAILABLE
        assert d.image_count == 1


class TestExif:
    def _exif_with_orientation(self, orientation, little=False):
        endian = "<" if little else ">"
        header = (b"II\x2a\x00" if little else b"MM\x00\x2a") + struct.pack(
            endian + "I", 8
        )
        ifd = struct.pack(endian + "H", 1) + struct.pack(
            endian + "HHIHH", 0x0112, 3, 1, orientation, 0
        ) + struct.pack(endian + "I", 0)
        return header + ifd

    @pytest.mark.parametrize("little", [False, True])
    @pytest.mark.parametrize(
        "orientation,angle,axis,has_irot,has_imir",
        [
            (1, 0, 0, False, False),
            (2, 0, 1, False, True),
            (3, 2, 0, True, False),
            (4, 0, 0, False, True),
            (5, 1, 0, True, True),
            (6, 3, 0, True, False),
            (7, 3, 0, True, True),
            (8, 1, 0, True, False),
        ],
    )
    def test_orientation_to_irot_imir(self, orientation, angle, axis, has_irot, has_imir, little):
        img = make_image(16, 16)
        exif_util.set_metadata_exif(img, self._exif_with_orientation(orientation, little))
        assert bool(img.transform_flags & TransformFlags.IROT) == has_irot
        assert bool(img.transform_flags & TransformFlags.IMIR) == has_imir
        if has_irot:
            assert img.irot.angle == angle
        if has_imir:
            assert img.imir.axis == axis
        # the inverse mapping returns the same orientation
        assert exif_util.irot_imir_to_orientation(img) == orientation

    def test_missing_orientation_defaults(self):
        img = make_image(16, 16)
        endian = ">"
        header = b"MM\x00\x2a" + struct.pack(endian + "I", 8)
        ifd = struct.pack(endian + "H", 0) + struct.pack(endian + "I", 0)
        exif_util.set_metadata_exif(img, header + ifd)
        assert not (img.transform_flags & (TransformFlags.IROT | TransformFlags.IMIR))

    def test_garbage_exif_ignored(self):
        img = make_image(16, 16)
        exif_util.set_metadata_exif(img, b"definitely not exif data")
        assert img.exif == b"definitely not exif data"
