"""Writer tests: round-trip through our parser, and the re-mux oracle —
repackage a real AV1 payload from the corpus with OUR writer and require
Pillow (real libavif/dav1d) to decode it identically to the original."""

import io
import pathlib

import numpy as np
import pytest

from libavif_tpu.containers import parse, read_item_payload
from libavif_tpu.containers.items import Property
from libavif_tpu.containers.write import OutputGroup, OutputItem, write_still

DATA = pathlib.Path("/root/reference/tests/data")

pytestmark = pytest.mark.skipif(not DATA.is_dir(), reason="no reference corpus")


def _extract_primary(name):
    data = (DATA / name).read_bytes()
    c = parse(data)
    item = c.meta.items[c.meta.primary_item_id]
    payload = read_item_payload(c.meta, item, data)
    return c, item, payload, data


def _remux_still(name):
    c, item, payload, data = _extract_primary(name)
    props = [p for p in item.properties if p.fourcc in ("ispe", "pixi", "av1C", "colr")]
    out_item = OutputItem(id=1, item_type="av01", payload=payload, properties=props)
    items = [out_item]
    # Carry alpha aux item if present.
    aux = [i for i in c.meta.items.values() if i.aux_for_id == item.id and i.item_type == "av01"]
    if aux:
        a = aux[0]
        apayload = read_item_payload(c.meta, a, data)
        aprops = [p for p in a.properties if p.fourcc in ("ispe", "pixi", "av1C", "auxC")]
        items.append(
            OutputItem(id=2, item_type="av01", payload=apayload, properties=aprops,
                       refs={"auxl": [1]})
        )
    return write_still(items, primary_item_id=1)


class TestWriterRoundTrip:
    def test_own_parser_reads_written_file(self):
        remuxed = _remux_still("paris_icc_exif_xmp.avif")
        c = parse(remuxed)
        assert c.meta.primary_item_id == 1
        item = c.meta.items[1]
        assert item.item_type == "av01"
        assert item.width > 0
        assert item.find_property("av1C") is not None

    def test_property_dedup(self):
        # Two items sharing identical properties must produce one ipco entry.
        _, item, payload, _ = _extract_primary("white_1x1.avif")
        props = [p for p in item.properties if p.fourcc in ("ispe", "av1C")]
        items = [
            OutputItem(id=1, item_type="av01", payload=payload, properties=props),
            OutputItem(id=2, item_type="av01", payload=payload, properties=props, hidden=True),
        ]
        blob = write_still(items, primary_item_id=1)
        c = parse(blob)
        # Dedup: the shared pool should have exactly len(props) entries.
        assert len(c.meta.properties) == len(props)
        # mdat chunk dedup: identical payloads stored once -> both items point
        # at the same offset.
        i1, i2 = c.meta.items[1], c.meta.items[2]
        assert i1.extents[0].offset == i2.extents[0].offset


class TestRemuxOracle:
    """Our container around a real AV1 payload must decode identically in
    Pillow (libavif + dav1d) — proves ISOBMFF/MIAF conformance end to end."""

    @pytest.mark.parametrize(
        "name",
        [
            "paris_icc_exif_xmp.avif",
            "white_1x1.avif",
            "colors_hdr_rec2020.avif",
            "arc_triomphe_extent1000_nullbyte_extent1310.avif",
        ],
    )
    def test_remux_decodes_identically(self, name):
        from PIL import Image as PILImage

        if not (DATA / name).exists():
            pytest.skip(f"{name} missing")
        remuxed = _remux_still(name)
        with PILImage.open(DATA / name) as im:
            ref = np.asarray(im.convert("RGBA"))
        with PILImage.open(io.BytesIO(remuxed)) as im2:
            got = np.asarray(im2.convert("RGBA"))
        assert ref.shape == got.shape
        assert np.array_equal(ref, got)

    def test_remux_with_alpha(self):
        from PIL import Image as PILImage

        name = "abc_color_irot_alpha_NOirot.avif"
        remuxed = _remux_still(name)
        with PILImage.open(io.BytesIO(remuxed)) as im2:
            got = np.asarray(im2.convert("RGBA"))
        with PILImage.open(DATA / name) as im:
            ref = np.asarray(im.convert("RGBA"))
        # We dropped irot on purpose (not carried in this remux helper), so
        # compare against the unrotated original: alpha channel must be intact.
        assert got.shape == ref.shape
        assert np.array_equal(got[..., 3], ref[..., 3])
        assert np.array_equal(got[..., :3], ref[..., :3])

    def test_remux_with_altr_group(self):
        from PIL import Image as PILImage

        c, item, payload, data = _extract_primary("white_1x1.avif")
        props = [p for p in item.properties if p.fourcc in ("ispe", "pixi", "av1C")]
        items = [OutputItem(id=1, item_type="av01", payload=payload, properties=props)]
        blob = write_still(
            items, 1, groups=[OutputGroup(grouping_type="altr", group_id=99, entity_ids=[1])]
        )
        c2 = parse(blob)
        assert c2.meta.entity_groups[0].grouping_type == "altr"
        with PILImage.open(io.BytesIO(blob)) as im:
            im.load()


class TestCompliance:
    def test_our_files_are_compliant(self):
        import numpy as np

        from libavif_tpu.api import Encoder
        from libavif_tpu.constants import PixelFormat
        from libavif_tpu.containers.compliance import is_compliant, validate
        from libavif_tpu.image import Image

        img = Image(48, 32, 8, PixelFormat.YUV420)
        img.allocate_planes("yuv")
        img.yuv_planes[0][:] = 100
        img.yuv_planes[1][:] = 120
        img.yuv_planes[2][:] = 140
        enc = Encoder()
        enc.quality = 90
        data = enc.write(img)
        findings = validate(data)
        assert not [f for f in findings if f.level == "error"], findings
        assert is_compliant(data)

    def test_corrupted_extent_flagged(self):
        import numpy as np

        from libavif_tpu.api import Encoder
        from libavif_tpu.constants import PixelFormat
        from libavif_tpu.containers.compliance import is_compliant
        from libavif_tpu.image import Image

        img = Image(48, 32, 8, PixelFormat.YUV420)
        img.allocate_planes("yuv")
        enc = Encoder()
        enc.quality = 90
        data = enc.write(img)
        assert not is_compliant(data[: len(data) - 32])  # truncated mdat
