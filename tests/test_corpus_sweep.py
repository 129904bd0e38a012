"""Reference-corpus container sweep + mutation robustness.

Reference tiers: aviftest.c (every corpus file), oss-fuzz parse surface
(SURVEY.md §4.4). Our decoder must parse every corpus container without
crashing — foreign AV1 payloads then fail cleanly at the codec seam.
"""

import pathlib

import numpy as np
import pytest

from libavif_tpu.api import Decoder, encode
from libavif_tpu.constants import AvifError, PixelFormat
from libavif_tpu.image import Image

DATA = pathlib.Path("/root/reference/tests/data")

pytestmark = pytest.mark.skipif(not DATA.is_dir(), reason="no reference corpus")


def test_parse_every_corpus_container():
    files = sorted(DATA.glob("*.avif"))
    assert len(files) > 50
    parsed = 0
    clean_failures = 0
    for f in files:
        d = Decoder()
        try:
            d.parse(f.read_bytes())
            parsed += 1
        except AvifError:
            clean_failures += 1  # malformed-on-purpose corpus files
    # The overwhelming majority of corpus containers must parse.
    assert parsed >= 0.8 * len(files), (parsed, clean_failures, len(files))


def test_foreign_payloads_decode_or_fail_cleanly():
    """Real AV1 payloads decode through the spec-AV1 path; anything not
    yet supported must raise AvifError, never crash."""
    decoded = 0
    for f in sorted(DATA.glob("*.avif"))[:20]:
        d = Decoder()
        try:
            d.parse(f.read_bytes())
        except AvifError:
            continue
        try:
            if d.next_image():
                decoded += 1
        except AvifError:
            pass
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"{f.name}: non-AvifError {type(e).__name__}: {e}")
    # nearly all of the leading corpus files decode end-to-end now
    # (full-corpus exactness: tools/corpus_exact.py, 46/49 vs dav1d)
    assert decoded >= 17, decoded


def test_mutation_sweep_no_crash():
    """Bit-flip our own files and require clean decode or AvifError
    (oss-fuzz dec surface analogue)."""
    rng = np.random.default_rng(0)
    img = Image(48, 32, 8, PixelFormat.YUV420)
    img.allocate_planes("yuv")
    for c in range(3):
        img.yuv_planes[c][:] = rng.integers(0, 256, img.yuv_planes[c].shape).astype(
            np.uint8
        )
    data = bytearray(encode(img, quality=80))
    for trial in range(60):
        mutated = bytearray(data)
        for _ in range(rng.integers(1, 4)):
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= int(rng.integers(1, 256))
        d = Decoder()
        try:
            d.parse(bytes(mutated))
            d.next_image()
        except AvifError:
            pass
