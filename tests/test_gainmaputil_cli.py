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
