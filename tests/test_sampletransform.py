"""Sample transform (sato) tests — 16-bit bit-depth extension.

Reference tiers: avifsampletransformtest.cc, avif16bittest.cc (SURVEY §4).
"""

import numpy as np
import pytest

from libavif_tpu.api import Decoder, Encoder, decode
from libavif_tpu.constants import PixelFormat
from libavif_tpu.hdr import sampletransform as st
from libavif_tpu.image import Image


def make_image16(width, height, fmt=PixelFormat.YUV444, seed=0):
    rng = np.random.default_rng(seed)
    img = Image(width, height, 16, fmt)
    img.allocate_planes("yuv")
    for c in range(3):
        if img.yuv_planes[c] is not None:
            img.yuv_planes[c][:] = rng.integers(
                0, 65536, img.yuv_planes[c].shape
            ).astype(np.uint16)
    return img


class TestExpressionVM:
    def test_recipe_roundtrip_through_wire(self):
        for recipe in (
            st.Recipe.BIT_DEPTH_EXTENSION_8B_8B,
            st.Recipe.BIT_DEPTH_EXTENSION_12B_4B,
            st.Recipe.BIT_DEPTH_EXTENSION_12B_8B_OVERLAP_4B,
        ):
            expr = st.recipe_to_expression(recipe)
            blob = st.write_sato(expr)
            back = st.parse_sato(blob)
            assert back == expr
            assert st.expression_to_recipe(back) == recipe

    def test_validate_expression(self):
        T = st.Token
        good = [T.const(1), T.input(1), T.op(st.TokenType.SUM)]
        assert st.validate_expression(good, 1)
        assert not st.validate_expression(good, 0)  # input out of range
        assert not st.validate_expression([T.op(st.TokenType.SUM)], 1)  # underflow
        assert not st.validate_expression([T.const(1), T.const(2)], 1)  # leftovers

    def test_vm_semantics_8b8b(self):
        base = Image(4, 2, 8, PixelFormat.YUV444)
        hidden = Image(4, 2, 8, PixelFormat.YUV444)
        out = Image(4, 2, 16, PixelFormat.YUV444)
        for im, val in ((base, 0xAB), (hidden, 0xCD)):
            im.allocate_planes("yuv")
            for c in range(3):
                im.yuv_planes[c][:] = val
        out.allocate_planes("yuv")
        st.apply_expression(
            out, st.recipe_to_expression(st.Recipe.BIT_DEPTH_EXTENSION_8B_8B),
            [base, hidden],
        )
        assert (out.yuv_planes[0] == 0xABCD).all()

    def test_vm_quotient_and_bsr(self):
        a = Image(2, 2, 8, PixelFormat.YUV400)
        a.allocate_planes("yuv")
        a.yuv_planes[0][:] = np.array([[0, 1], [100, 255]], dtype=np.uint8)
        out = Image(2, 2, 8, PixelFormat.YUV400)
        out.allocate_planes("yuv")
        T = st.Token
        # BSR(input)
        st.apply_expression(out, [T.input(1), T.op(st.TokenType.BSR)], [a])
        np.testing.assert_array_equal(
            out.yuv_planes[0], np.array([[0, 0], [6, 7]], dtype=np.uint8)
        )
        # input / 0 == input (reference QUOTIENT semantics)
        st.apply_expression(
            out, [T.input(1), T.const(0), T.op(st.TokenType.QUOTIENT)], [a]
        )
        np.testing.assert_array_equal(out.yuv_planes[0], a.yuv_planes[0])

    def test_saturating_product(self):
        a = Image(1, 1, 12, PixelFormat.YUV400)
        a.allocate_planes("yuv")
        a.yuv_planes[0][:] = 4095
        out = Image(1, 1, 12, PixelFormat.YUV400)
        out.allocate_planes("yuv")
        T = st.Token
        st.apply_expression(
            out,
            [T.input(1), T.const(2**30), T.op(st.TokenType.PRODUCT)],
            [a],
        )
        assert out.yuv_planes[0][0, 0] == 4095  # clamped to depth after sat32


class TestSixteenBitRoundtrip:
    @pytest.mark.parametrize(
        "recipe",
        [
            st.Recipe.BIT_DEPTH_EXTENSION_8B_8B,
            st.Recipe.BIT_DEPTH_EXTENSION_12B_4B,
        ],
    )
    def test_lossless_16bit_bit_exact(self, recipe):
        img = make_image16(48, 32)
        enc = Encoder()
        enc.quality = 100
        enc.sample_transform_recipe = recipe
        data = enc.write(img)
        out = decode(data)
        assert out.depth == 16
        for c in range(3):
            np.testing.assert_array_equal(out.yuv_planes[c], img.yuv_planes[c])

    def test_lossy_16bit_overlap_recipe(self):
        img = make_image16(48, 32, seed=3)
        enc = Encoder()
        enc.quality = 85
        enc.sample_transform_recipe = st.Recipe.BIT_DEPTH_EXTENSION_12B_8B_OVERLAP_4B
        data = enc.write(img)
        out = decode(data)
        assert out.depth == 16
        err = out.yuv_planes[0].astype(np.int64) - img.yuv_planes[0].astype(np.int64)
        rmse = float(np.sqrt(np.mean(err**2)))
        # ~12-bit base quantization scale on random content (worst case
        # for the in-loop filters, which help on natural content)
        assert rmse < 1450

    def test_backward_compatible_base_decode(self):
        """A decoder ignoring sato (strict primary-only) sees the 12-bit base."""
        img = make_image16(48, 32)
        enc = Encoder()
        enc.quality = 100
        data = enc.write(img)
        d = Decoder()
        d.parse(data)
        d._sato_item = None  # simulate a sato-unaware decoder
        assert d.next_image()
        assert d.image.depth == 12
        np.testing.assert_array_equal(
            d.image.yuv_planes[0], (img.yuv_planes[0] >> 4).astype(np.uint16)
        )
