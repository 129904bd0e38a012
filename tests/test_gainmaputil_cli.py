"""gainmaputil CLI + avifenc target-size/progressive flags tests
(reference tiers: avifgainmaputil/*, test_cmd_targetsize.sh,
test_cmd_progressive.sh)."""

import numpy as np
import pytest

from libavif_tpu.cli import avifdec, avifenc, gainmaputil
from libavif_tpu.constants import (
    ColorPrimaries,
    MatrixCoefficients,
    PixelFormat,
    Range,
    TransferCharacteristics,
)
from libavif_tpu.hdr import gainmap as gmlib
from libavif_tpu.image import Image
from libavif_tpu.io_formats.y4m import write_y4m


def make_pair(width=48, height=32, seed=0):
    rng = np.random.default_rng(seed)
    base = Image(width, height, 8, PixelFormat.YUV444)
    base.allocate_planes("yuv")
    base.yuv_range = Range.FULL
    base.color_primaries = ColorPrimaries.BT709
    base.transfer_characteristics = TransferCharacteristics.SRGB
    base.matrix_coefficients = MatrixCoefficients.BT601
    base.yuv_planes[0][:] = rng.integers(40, 200, (height, width)).astype(np.uint8)
    base.yuv_planes[1][:] = 128
    base.yuv_planes[2][:] = 128
    alt = Image(width, height, 10, PixelFormat.YUV444)
    alt.allocate_planes("yuv")
    alt.yuv_range = Range.FULL
    alt.color_primaries = ColorPrimaries.BT709
    alt.transfer_characteristics = TransferCharacteristics.PQ
    alt.matrix_coefficients = MatrixCoefficients.BT601
    alt.yuv_planes[0][:] = (base.yuv_planes[0].astype(np.uint16) * 3).clip(0, 1023)
    alt.yuv_planes[1][:] = 512
    alt.yuv_planes[2][:] = 512
    return base, alt


@pytest.fixture(scope="module")
def gm_avif(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gm")
    base, alt = make_pair()
    base.gain_map = gmlib.compute_gain_map(base, alt)
    from libavif_tpu.api.encoder import Encoder

    enc = Encoder()
    enc.quality = 95
    p = tmp / "gm.avif"
    p.write_bytes(enc.write(base))
    return p


class TestGainMapUtil:
    def test_printmetadata(self, gm_avif, capsys):
        assert gainmaputil.main(["printmetadata", str(gm_avif)]) == 0
        out = capsys.readouterr().out
        assert "alternateHdrHeadroom" in out and "channel 0" in out

    def test_extractgainmap(self, gm_avif, tmp_path):
        out = tmp_path / "gm.y4m"
        assert gainmaputil.main(["extractgainmap", str(gm_avif), str(out)]) == 0
        assert out.exists()

    def test_tonemap(self, gm_avif, tmp_path):
        pytest.importorskip("PIL.Image")
        out = tmp_path / "toned.png"
        assert gainmaputil.main(
            ["tonemap", str(gm_avif), str(out), "--headroom", "1.5"]
        ) == 0
        assert out.exists()

    def test_combine_and_swapbase(self, tmp_path):
        base, alt = make_pair(seed=3)
        bp, ap = tmp_path / "b.y4m", tmp_path / "a.y4m"
        write_y4m(bp, base)
        write_y4m(ap, alt)
        out = tmp_path / "combined.avif"
        assert gainmaputil.main(
            ["combine", str(bp), str(ap), str(out), "--gain-map-format", "444"]
        ) == 0
        assert gainmaputil.main(["printmetadata", str(out)]) == 0
        swapped = tmp_path / "swapped.avif"
        assert gainmaputil.main(["swapbase", str(out), str(swapped)]) == 0
        assert gainmaputil.main(["printmetadata", str(swapped)]) == 0


class TestAvifencExtras:
    def test_target_size(self, tmp_path):
        rng = np.random.default_rng(1)
        img = Image(64, 64, 8, PixelFormat.YUV420)
        img.allocate_planes("yuv")
        for c in range(3):
            img.yuv_planes[c][:] = rng.integers(0, 256, img.yuv_planes[c].shape).astype(
                np.uint8
            )
        src = tmp_path / "t.y4m"
        write_y4m(src, img)
        budget = 2500
        out = tmp_path / "t.avif"
        assert avifenc.main([str(src), str(out), "--target-size", str(budget)]) == 0
        assert out.stat().st_size <= budget

    def test_progressive_flag(self, tmp_path):
        img = Image(48, 32, 8, PixelFormat.YUV420)
        img.allocate_planes("yuv")
        img.yuv_planes[0][:] = 120
        img.yuv_planes[1][:] = 128
        img.yuv_planes[2][:] = 128
        src = tmp_path / "p.y4m"
        write_y4m(src, img)
        out = tmp_path / "p.avif"
        assert avifenc.main([str(src), str(out), "--progressive", "30,80,100"]) == 0
        from libavif_tpu.api.decoder import Decoder, ProgressiveState

        d = Decoder()
        d.parse(out.read_bytes())
        assert d.progressive_state == ProgressiveState.AVAILABLE


class TestJpegGainMap:
    def _make_hdr_jpeg(self, tmp_path):
        import io as _io

        pil = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(0)
        base = pil.fromarray(
            rng.integers(0, 256, (32, 48, 3)).astype(np.uint8), "RGB"
        )
        gm = pil.fromarray(
            np.tile(np.linspace(0, 255, 48, dtype=np.uint8), (32, 1)), "L"
        )
        b1 = _io.BytesIO()
        base.save(b1, format="JPEG", quality=92)
        b2 = _io.BytesIO()
        gm.save(b2, format="JPEG", quality=92)
        gm_bytes = bytearray(b2.getvalue())
        xmp = (
            b'<x:xmpmeta xmlns:hdrgm="http://ns.adobe.com/hdr-gain-map/1.0/" '
            b'hdrgm:Version="1.0" hdrgm:GainMapMin="0.0" hdrgm:GainMapMax="2.5" '
            b'hdrgm:Gamma="1.0" hdrgm:OffsetSDR="0.015625" '
            b'hdrgm:OffsetHDR="0.015625" hdrgm:HDRCapacityMin="0.0" '
            b'hdrgm:HDRCapacityMax="2.5"/>'
        )
        seg = b"http://ns.adobe.com/xap/1.0/\x00" + xmp
        app1 = b"\xff\xe1" + (len(seg) + 2).to_bytes(2, "big") + seg
        gm_with_xmp = gm_bytes[:2] + app1 + gm_bytes[2:]
        p = tmp_path / "hdr.jpg"
        p.write_bytes(b1.getvalue() + bytes(gm_with_xmp))
        return p

    def test_extract_and_convert(self, tmp_path):
        from libavif_tpu.io_formats.jpeg_gainmap import read_jpeg_with_gain_map

        src = self._make_hdr_jpeg(tmp_path)
        img = read_jpeg_with_gain_map(src)
        assert img.gain_map is not None
        assert float(img.gain_map.metadata.gain_map_max[0]) == pytest.approx(2.5)
        assert float(img.gain_map.metadata.alternate_hdr_headroom) == pytest.approx(2.5)
        out = tmp_path / "out.avif"
        assert gainmaputil.main(["convert", str(src), str(out)]) == 0
        from libavif_tpu.api import Decoder

        d = Decoder()
        decoded = d.read(out.read_bytes())
        assert d.gain_map_present and decoded.gain_map is not None
        assert float(decoded.gain_map.metadata.gain_map_max[0]) == pytest.approx(
            2.5, rel=1e-4
        )


class TestCorpusJpegGainMap:
    @pytest.mark.parametrize(
        "name,expect_headroom",
        [
            ("paris_exif_xmp_gainmap_littleendian.jpg", 3.5),
            ("apple_gainmap_new.jpg", None),
        ],
    )
    def test_real_corpus_extraction(self, name, expect_headroom):
        import pathlib

        p = pathlib.Path("/root/reference/tests/data") / name
        if not p.exists():
            pytest.skip("reference corpus not available")
        from libavif_tpu.io_formats.jpeg_gainmap import read_jpeg_with_gain_map

        img = read_jpeg_with_gain_map(p)
        assert img.gain_map is not None and img.gain_map.image is not None
        assert img.gain_map.image.width > 0
        if expect_headroom is not None:
            assert float(img.gain_map.metadata.alternate_hdr_headroom) == pytest.approx(
                expect_headroom, rel=1e-3
            )
