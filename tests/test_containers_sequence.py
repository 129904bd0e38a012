"""Animation (moov/trak) writer test: remux a real animated AVIF's samples
through our sequence writer; Pillow must see the same frame count, timing,
and pixels."""

import io
import pathlib

import numpy as np
import pytest

from libavif_tpu.containers import parse, read_item_payload
from libavif_tpu.containers.write import OutputItem, write_sequence

DATA = pathlib.Path("/root/reference/tests/data")

pytestmark = pytest.mark.skipif(not DATA.is_dir(), reason="no reference corpus")


def test_sequence_remux_oracle():
    from PIL import Image as PILImage, ImageSequence

    name = "colors-animated-8bpc.avif"
    data = (DATA / name).read_bytes()
    c = parse(data)
    track = [t for t in c.tracks if t.handler_type == "pict"][0]
    st = track.sample_table
    ranges = st.sample_ranges()
    assert len(ranges) == st.sample_count
    samples = []
    for i, (off, size) in enumerate(ranges):
        samples.append((data[off : off + size], st.image_delta(i), st.is_sync_sample(i)))

    av1c = next(
        p.value for p in st.descriptions[0].properties if p.fourcc == "av1C"
    )

    # Meta section: first frame as the still primary item.
    item = c.meta.items[c.meta.primary_item_id]
    props = [p for p in item.properties if p.fourcc in ("ispe", "pixi", "av1C", "colr")]
    payload = read_item_payload(c.meta, item, data)
    still_items = [OutputItem(id=1, item_type="av01", payload=payload, properties=props)]

    blob = write_sequence(
        still_items,
        1,
        samples,
        None,
        timescale=track.media_timescale,
        width=track.width or item.width,
        height=track.height or item.height,
        av1c=av1c,
    )

    with PILImage.open(DATA / name) as ref_im:
        ref_frames = [np.asarray(f.convert("RGBA")) for f in ImageSequence.Iterator(ref_im)]
    with PILImage.open(io.BytesIO(blob)) as got_im:
        got_frames = [np.asarray(f.convert("RGBA")) for f in ImageSequence.Iterator(got_im)]

    assert len(got_frames) == len(ref_frames)
    for a, b in zip(ref_frames, got_frames):
        assert np.array_equal(a, b)


def test_sequence_own_parser():
    name = "colors-animated-8bpc.avif"
    data = (DATA / name).read_bytes()
    c = parse(data)
    track = [t for t in c.tracks if t.handler_type == "pict"][0]
    st = track.sample_table
    ranges = st.sample_ranges()
    samples = [(data[o : o + sz], st.image_delta(i), st.is_sync_sample(i))
               for i, (o, sz) in enumerate(ranges)]
    av1c = next(p.value for p in st.descriptions[0].properties if p.fourcc == "av1C")
    item = c.meta.items[c.meta.primary_item_id]
    props = [p for p in item.properties if p.fourcc in ("ispe", "av1C")]
    payload = read_item_payload(c.meta, item, data)
    blob = write_sequence(
        [OutputItem(id=1, item_type="av01", payload=payload, properties=props)],
        1, samples, None,
        timescale=track.media_timescale, width=item.width, height=item.height, av1c=av1c,
    )
    c2 = parse(blob)
    assert c2.has_brand("avis")
    t2 = [t for t in c2.tracks if t.handler_type == "pict"][0]
    assert t2.sample_table.sample_count == st.sample_count
    assert t2.media_timescale == track.media_timescale
    r2 = t2.sample_table.sample_ranges()
    for (o1, s1), (o2, s2) in zip(ranges, r2):
        assert s1 == s2
        assert blob[o2 : o2 + s2] == data[o1 : o1 + s1]
