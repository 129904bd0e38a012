"""Golden box-structure tests (reference tier:
tests/test_cmd_enc_boxes_golden.sh + tests/data/goldens/).

Each scenario encodes a fixed deterministic input and diffs the writer's
box tree (containers/boxdump.py — an independent raw-BMFF walker, not
the item-model parser) against a committed golden. Coded payload sizes
are normalized to "*" in the dump, so codec/RD tuning does not churn
these; any structural change (box order, property bytes, item graph,
brands, versions) fails the diff.

Regenerate deliberately with: python tools/regen_box_goldens.py
"""

import difflib
import pathlib

import numpy as np
import pytest

from libavif_tpu.api import Encoder
from libavif_tpu.constants import PixelFormat, Range
from libavif_tpu.containers import boxdump
from libavif_tpu.image import ContentLightLevelInformationBox, Image

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


def _image(width=48, height=32, depth=8, fmt=PixelFormat.YUV420, seed=0, alpha=False):
    rng = np.random.default_rng(seed)
    img = Image(width, height, depth, fmt)
    img.allocate_planes("yuv")
    maxv = (1 << depth) - 1
    for p in img.yuv_planes:
        if p is not None:
            p[:] = rng.integers(0, maxv + 1, p.shape).astype(img.dtype)
    if alpha:
        img.alpha_plane = rng.integers(0, maxv, (height, width)).astype(img.dtype)
    return img


def _still_basic():
    enc = Encoder()
    enc.quality = 90
    return enc.write(_image(seed=1))


def _still_full_features():
    img = _image(seed=2, alpha=True)
    img.icc = b"\x00" * 40
    img.exif = b"II*\x00golden"
    img.xmp = b"<x:xmpmeta/>"
    img.clli = ContentLightLevelInformationBox(1000, 400)
    enc = Encoder()
    enc.quality = 90
    return enc.write(img)


def _grid_2x2():
    cells = [_image(64, 64, seed=10 + i) for i in range(4)]
    enc = Encoder()
    enc.quality = 90
    return enc.write_grid(cells, columns=2, rows=2)


def _animation():
    enc = Encoder()
    enc.quality = 90
    enc.timescale = 30
    for i in range(3):
        enc.add_image(_image(seed=20 + i), duration=10)
    return enc.finish()


def _gainmap():
    import libavif_tpu.hdr.gainmap as gmlib
    from test_gainmap import make_sdr_hdr_pair

    base, alt = make_sdr_hdr_pair(seed=30)
    base.gain_map = gmlib.compute_gain_map(base, alt, gain_map_format=PixelFormat.YUV420)
    enc = Encoder()
    enc.quality = 90
    return enc.write(base)


def _progressive():
    enc = Encoder()
    return enc.write_progressive(_image(seed=40), [60, 90])


SCENARIOS = {
    "still_basic": _still_basic,
    "still_full_features": _still_full_features,
    "grid_2x2": _grid_2x2,
    "animation": _animation,
    "gainmap": _gainmap,
    "progressive": _progressive,
}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_box_structure_golden(name):
    got = boxdump.dump(SCENARIOS[name]())
    golden_path = GOLDEN_DIR / f"{name}.txt"
    assert golden_path.exists(), (
        f"missing golden {golden_path}; run tools/regen_box_goldens.py"
    )
    want = golden_path.read_text()
    if got != want:
        diff = "\n".join(
            difflib.unified_diff(
                want.splitlines(), got.splitlines(),
                fromfile=f"goldens/{name}.txt", tofile="encoder output",
                lineterm="",
            )
        )
        pytest.fail(f"box structure changed:\n{diff}")
