"""Container parser tests against the reference corpus (read-only oracle)."""

import pathlib

import pytest

from libavif_tpu.constants import AvifError, PixelFormat
from libavif_tpu.containers import parse, parse_image_grid, read_item_payload

DATA = pathlib.Path("/root/reference/tests/data")

pytestmark = pytest.mark.skipif(not DATA.is_dir(), reason="no reference corpus")


def _parse_file(name):
    data = (DATA / name).read_bytes()
    return parse(data), data


class TestCorpusParse:
    def test_parse_all_corpus_files(self, reference_corpus):
        """Every corpus .avif should either parse or fail with AvifError
        (never an unhandled exception). Most should parse."""
        ok, failed = 0, []
        for f in reference_corpus:
            data = f.read_bytes()
            try:
                parse(data)
                ok += 1
            except AvifError as e:
                failed.append((f.name, str(e)))
        # The corpus contains deliberately malformed files; the vast majority
        # must parse.
        assert ok >= len(reference_corpus) * 0.85, failed

    def test_primary_item_and_ispe(self):
        c, _ = _parse_file("paris_icc_exif_xmp.avif")
        assert c.meta is not None
        assert c.meta.primary_item_id != 0
        primary = c.meta.items[c.meta.primary_item_id]
        assert primary.item_type == "av01"
        # Size must match what PIL reports.
        from PIL import Image as PILImage

        with PILImage.open(DATA / "paris_icc_exif_xmp.avif") as im:
            assert (primary.width, primary.height) == im.size

    def test_sizes_match_pillow_for_corpus_sample(self, reference_corpus):
        from PIL import Image as PILImage

        checked = 0
        for f in reference_corpus:
            if checked >= 20:
                break
            data = f.read_bytes()
            try:
                c = parse(data)
                with PILImage.open(f) as im:
                    pil_size = im.size
            except Exception:
                continue
            if c.meta is None or c.meta.primary_item_id not in c.meta.items:
                continue
            item = c.meta.items[c.meta.primary_item_id]
            if item.item_type == "av01" and item.width:
                # Pillow/libavif report pre-transform (ispe) dimensions.
                assert (item.width, item.height) == pil_size, f.name
                checked += 1
        assert checked >= 10

    def test_av1c_parse(self):
        c, _ = _parse_file("paris_icc_exif_xmp.avif")
        item = c.meta.items[c.meta.primary_item_id]
        av1c = item.find_property("av1C")
        assert av1c is not None
        assert av1c.depth() in (8, 10, 12)
        assert av1c.pixel_format() in (
            PixelFormat.YUV420,
            PixelFormat.YUV422,
            PixelFormat.YUV444,
            PixelFormat.YUV400,
        )

    def test_exif_xmp_icc_items(self):
        c, data = _parse_file("paris_icc_exif_xmp.avif")
        types = {i.item_type for i in c.meta.items.values()}
        assert "Exif" in types
        assert "mime" in types
        # ICC arrives via colr prof property
        primary = c.meta.items[c.meta.primary_item_id]
        colr_icc = [p for p in primary.properties if p.fourcc == "colr" and p.value.icc]
        assert colr_icc

    def test_alpha_aux_item(self):
        c, _ = _parse_file("abc_color_irot_alpha_NOirot.avif")
        aux_items = [i for i in c.meta.items.values() if i.aux_for_id]
        assert aux_items
        auxc = aux_items[0].find_property("auxC")
        assert auxc is not None and "alpha" in auxc.aux_type

    def test_grid_parse(self):
        name = "color_grid_alpha_nogrid.avif"
        if not (DATA / name).exists():
            pytest.skip("grid file missing")
        c, data = _parse_file(name)
        grid_items = [i for i in c.meta.items.values() if i.item_type == "grid"]
        assert grid_items
        g = grid_items[0]
        payload = read_item_payload(c.meta, g, data)
        grid = parse_image_grid(payload)
        assert grid.rows >= 1 and grid.columns >= 1
        cells = [i for i in c.meta.items.values() if i.dimg_for_id == g.id]
        assert len(cells) == grid.rows * grid.columns

    def test_animated_track_parse(self):
        name = "colors-animated-8bpc.avif"
        if not (DATA / name).exists():
            pytest.skip("animation file missing")
        c, _ = _parse_file(name)
        assert c.tracks
        pict = [t for t in c.tracks if t.handler_type == "pict"]
        assert pict
        t = pict[0]
        assert t.sample_table is not None
        assert t.sample_table.sample_count > 1
        assert t.media_timescale > 0
        # Sample descriptor should be av01 with an av1C child.
        desc = t.sample_table.descriptions[0]
        assert desc.fourcc == "av01"
        assert any(p.fourcc == "av1C" for p in desc.properties)

    def test_item_payload_extraction(self):
        c, data = _parse_file("paris_icc_exif_xmp.avif")
        primary = c.meta.items[c.meta.primary_item_id]
        payload = read_item_payload(c.meta, primary, data)
        assert len(payload) == primary.size
        # AV1 payload should start with a valid OBU (forbidden bit 0).
        assert (payload[0] >> 7) == 0

    def test_multi_extent_item(self):
        name = "sofa_grid1x5_420.avif"
        files = sorted(DATA.glob("*extent*"))
        target = DATA / "arc_triomphe_extent1000_nullbyte_extent1310.avif"
        if not target.exists():
            pytest.skip("multi-extent file missing")
        c, data = _parse_file(target.name)
        multi = [i for i in c.meta.items.values() if len(i.extents) > 1]
        assert multi
        payload = read_item_payload(c.meta, multi[0], data)
        assert len(payload) == multi[0].size


class TestMalformed:
    def test_garbage_rejected(self):
        with pytest.raises(AvifError):
            parse(b"\x00" * 64)

    def test_truncated_rejected(self):
        data = (DATA / "paris_icc_exif_xmp.avif").read_bytes()
        with pytest.raises(AvifError):
            parse(data[:40])

    def test_not_avif_brand(self):
        import struct

        bad = struct.pack(">I", 16) + b"ftyp" + b"mp41" + struct.pack(">I", 0)
        with pytest.raises(AvifError):
            parse(bad)


class TestIrefDimgRules:
    """read.c:3356-3410 dimg reference validation semantics."""

    @staticmethod
    def _iref(children):
        """Build an iref box payload (version 0) + parse it."""
        import struct

        import importlib

        parse_mod = importlib.import_module("libavif_tpu.containers.parse")
        from libavif_tpu.containers.items import Meta
        from libavif_tpu.utils.streams import ROStream

        body = b"\x00\x00\x00\x00"  # version 0 + flags
        for box_type, from_id, to_ids in children:
            payload = struct.pack(">HH", from_id, len(to_ids))
            payload += b"".join(struct.pack(">H", t) for t in to_ids)
            body += struct.pack(">I", 8 + len(payload)) + box_type + payload
        meta = Meta()
        parse_mod.parse_iref(ROStream(body), meta)
        return meta

    def test_single_grid_ok(self):
        meta = self._iref([(b"dimg", 1, [2, 3, 4])])
        assert meta.item(3).dimg_for_id == 1
        assert meta.item(4).dimg_idx == 2

    def test_duplicate_dimg_from_rejected(self):
        from libavif_tpu.constants import Result

        with pytest.raises(AvifError) as e:
            self._iref([(b"dimg", 1, [2]), (b"dimg", 1, [3])])
        assert e.value.result == Result.BMFF_PARSE_FAILED

    def test_repeated_to_id_in_one_array_rejected(self):
        from libavif_tpu.constants import Result

        with pytest.raises(AvifError) as e:
            self._iref([(b"dimg", 1, [2, 2])])
        assert e.value.result == Result.INVALID_IMAGE_GRID

    def test_cell_shared_between_grids_not_implemented(self):
        from libavif_tpu.constants import Result

        with pytest.raises(AvifError) as e:
            self._iref([(b"dimg", 1, [2]), (b"dimg", 5, [2])])
        assert e.value.result == Result.NOT_IMPLEMENTED
