"""Pallas kernel equivalence: bit-identical to the XLA transform path.

Runs in interpreter mode on the CPU mesh; the compiled path exercises the
same kernel body on TPU (bench/driver runs).
"""

import numpy as np
import pytest

from libavif_tpu.ops import transforms as T
from libavif_tpu.ops.pallas_kernels import (
    forward_transform_pallas,
    inverse_transform_pallas,
)


@pytest.mark.parametrize("tx", [T.DCT_DCT, T.ADST_ADST, T.DCT_ADST, T.IDTX])
@pytest.mark.parametrize("n", [8, 16])
def test_forward_bit_identical(tx, n):
    rng = np.random.default_rng(n)
    x = rng.integers(-255, 256, (37, n, n)).astype(np.int32)
    ref = np.asarray(T.forward_transform(x, tx, n))
    got = np.asarray(forward_transform_pallas(x, tx, n, interpret=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("tx", [T.DCT_DCT, T.ADST_ADST, T.IDTX])
@pytest.mark.parametrize("n", [8, 16])
def test_inverse_bit_identical(tx, n):
    rng = np.random.default_rng(n + 7)
    c = rng.integers(-30000, 30000, (21, n, n)).astype(np.int32)
    ref = np.asarray(T.inverse_transform(c, tx, n))
    got = np.asarray(inverse_transform_pallas(c, tx, n, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_roundtrip_through_pallas():
    rng = np.random.default_rng(3)
    x = rng.integers(-200, 200, (10, 16, 16)).astype(np.int32)
    c = forward_transform_pallas(x, T.DCT_DCT, 16, interpret=True)
    back = np.asarray(inverse_transform_pallas(np.asarray(c), T.DCT_DCT, 16, interpret=True))
    assert np.abs(back - x).max() <= 2  # same bound as the XLA roundtrip
