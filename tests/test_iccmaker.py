"""ICC maker tests (reference: apps/shared/iccmaker.c), validated with
Pillow's littleCMS bindings as the oracle."""

import io

import numpy as np
import pytest

from libavif_tpu.pixels.iccmaker import make_icc

ImageCms = pytest.importorskip("PIL.ImageCms")


@pytest.mark.parametrize("cp,tc", [(1, 13), (9, 14), (12, 13), (1, 8)])
def test_littlecms_accepts_rgb_profile(cp, tc):
    data = make_icc(cp, tc)
    prof = ImageCms.ImageCmsProfile(io.BytesIO(data))
    assert "libavif_tpu" in ImageCms.getProfileDescription(prof)


def test_gray_profile():
    prof = ImageCms.ImageCmsProfile(io.BytesIO(make_icc(1, 13, monochrome=True)))
    assert prof is not None


def test_usable_in_conversion():
    from PIL import Image as PIL

    im = PIL.fromarray(np.full((4, 4, 3), 200, np.uint8), "RGB")
    src = ImageCms.ImageCmsProfile(io.BytesIO(make_icc(1, 13)))
    dst = ImageCms.createProfile("sRGB")
    out = ImageCms.profileToProfile(im, src, dst)
    # sRGB profile vs sRGB built-in: near-identity mapping
    assert abs(int(np.asarray(out)[0, 0, 0]) - 200) <= 2


def test_srgb_profile_is_near_builtin():
    """BT.709 primaries + sRGB TRC should match the built-in sRGB transform."""
    from PIL import Image as PIL

    ramp = np.tile(np.arange(0, 256, 8, dtype=np.uint8), (4, 1))
    im = PIL.fromarray(np.stack([ramp] * 3, axis=-1), "RGB")
    src = ImageCms.ImageCmsProfile(io.BytesIO(make_icc(1, 13)))
    dst = ImageCms.createProfile("sRGB")
    out = np.asarray(ImageCms.profileToProfile(im, src, dst))
    err = np.abs(out.astype(int) - np.asarray(im).astype(int))
    assert err.max() <= 3
