"""OBU layer tests: parse corpus sequence headers (cross-checked against
av1C), and round-trip our own sequence-header writer."""

import pathlib

import pytest

from libavif_tpu.containers import parse, read_item_payload
from libavif_tpu.containers.obu import (
    OBU_SEQUENCE_HEADER,
    SequenceHeader,
    find_sequence_header,
    parse_sequence_header,
    split_obus,
    write_sequence_header,
)

DATA = pathlib.Path("/root/reference/tests/data")

pytestmark = pytest.mark.skipif(not DATA.is_dir(), reason="no reference corpus")


def test_seq_header_matches_av1c_across_corpus(reference_corpus):
    """For every parseable corpus file, the sequence header inside the primary
    item payload must agree with the av1C property (the reference harvests
    CICP this way, read.c:6596)."""
    checked = 0
    for f in reference_corpus:
        data = f.read_bytes()
        try:
            c = parse(data)
        except Exception:
            continue
        if c.meta is None or c.meta.primary_item_id not in c.meta.items:
            continue
        item = c.meta.items[c.meta.primary_item_id]
        if item.item_type != "av01" or not item.extents:
            continue
        av1c = item.find_property("av1C")
        if av1c is None:
            continue
        payload = read_item_payload(c.meta, item, data)
        h = find_sequence_header(payload)
        assert h.seq_profile == av1c.seq_profile, f.name
        assert h.bit_depth == av1c.depth(), f.name
        assert h.monochrome == bool(av1c.monochrome), f.name
        assert h.subsampling_x == av1c.chroma_subsampling_x, f.name
        assert h.subsampling_y == av1c.chroma_subsampling_y, f.name
        checked += 1
    assert checked >= 30


def test_write_parse_roundtrip_reduced():
    h = SequenceHeader()
    h.seq_profile = 0
    h.still_picture = True
    h.reduced_still_picture_header = True
    h.operating_points[0].seq_level_idx = 8
    h.max_frame_width = 1024
    h.max_frame_height = 768
    h.frame_width_bits = 11
    h.frame_height_bits = 10
    h.high_bitdepth = False
    h.monochrome = False
    h.color_description_present = True
    h.color_primaries = 1
    h.transfer_characteristics = 13
    h.matrix_coefficients = 6
    h.color_range = 1
    h.subsampling_x = 1
    h.subsampling_y = 1
    payload = write_sequence_header(h)
    back = parse_sequence_header(payload)
    for field in (
        "seq_profile", "still_picture", "reduced_still_picture_header",
        "max_frame_width", "max_frame_height", "high_bitdepth", "monochrome",
        "color_primaries", "transfer_characteristics", "matrix_coefficients",
        "color_range", "subsampling_x", "subsampling_y", "bit_depth",
    ):
        assert getattr(back, field) == getattr(h, field), field


def test_write_parse_roundtrip_identity_444():
    h = SequenceHeader()
    h.seq_profile = 1  # 4:4:4
    h.reduced_still_picture_header = True
    h.max_frame_width = 64
    h.max_frame_height = 64
    h.color_description_present = True
    h.color_primaries = 1
    h.transfer_characteristics = 13
    h.matrix_coefficients = 0  # identity -> implies full range, 444
    h.subsampling_x = 0
    h.subsampling_y = 0
    h.color_range = 1
    payload = write_sequence_header(h)
    back = parse_sequence_header(payload)
    assert back.subsampling_x == 0 and back.subsampling_y == 0
    assert back.color_range == 1
    assert back.bit_depth == 8


def test_corpus_obu_structure():
    data = (DATA / "paris_icc_exif_xmp.avif").read_bytes()
    c = parse(data)
    item = c.meta.items[c.meta.primary_item_id]
    payload = read_item_payload(c.meta, item, data)
    obus = split_obus(payload)
    types = [o.obu_type for o in obus]
    assert OBU_SEQUENCE_HEADER in types
    # Total payload reassembles exactly.
    assert sum(len(o.payload) for o in obus) <= len(payload)
