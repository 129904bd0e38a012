"""Native (C++) entropy fast path: bit-exactness vs the Python reference.

The contract (entropy.py docstring): the C++ tile coder must be
byte-identical to the Python reference coder on every stream.
"""

import numpy as np
import pytest

from libavif_tpu import native
from libavif_tpu.codec import entropy

lib = native.load()

pytestmark = pytest.mark.skipif(lib is None, reason="native toolchain unavailable")


@pytest.mark.parametrize("n", [4, 8, 16])
@pytest.mark.parametrize("density", [0.0, 0.05, 0.5, 1.0])
def test_encode_bit_identical(n, density):
    rng = np.random.default_rng(n * 100 + int(density * 10))
    rb, cb = 3, 5
    levels = np.zeros((rb, cb, n, n), dtype=np.int32)
    mask = rng.random(levels.shape) < density
    levels[mask] = rng.integers(-2000, 2000, mask.sum())
    modes = rng.integers(0, 7, (rb, cb)).astype(np.int32)
    py = entropy._encode_tile_py(levels, modes, rb, cb, n)
    nat = entropy._encode_tile_native(lib, levels, modes, rb, cb, n)
    assert py == nat


def test_cross_decode():
    """Python-encoded stream decodes natively and vice versa."""
    rng = np.random.default_rng(5)
    n, rb, cb = 16, 2, 3
    levels = np.zeros((rb, cb, n, n), dtype=np.int32)
    mask = rng.random(levels.shape) < 0.2
    levels[mask] = rng.integers(-50, 50, mask.sum())
    modes = rng.integers(0, 7, (rb, cb)).astype(np.int32)
    payload = entropy._encode_tile_py(levels, modes, rb, cb, n)
    lv_n, md_n = entropy._decode_tile_native(lib, payload, rb, cb, n)
    np.testing.assert_array_equal(lv_n, levels)
    np.testing.assert_array_equal(md_n, modes)
    payload_n = entropy._encode_tile_native(lib, levels, modes, rb, cb, n)
    lv_p, md_p = entropy._decode_tile_py(payload_n, rb, cb, n)
    np.testing.assert_array_equal(lv_p, levels)
    np.testing.assert_array_equal(md_p, modes)


def test_native_rejects_garbage_without_crash():
    rng = np.random.default_rng(9)
    for size in (0, 1, 7, 64, 257):
        blob = rng.integers(0, 256, size).astype(np.uint8).tobytes()
        try:
            entropy._decode_tile_native(lib, blob, 4, 4, 16)
        except ValueError:
            pass  # clean error is acceptable; crash is not


def test_selftest_roundtrip_entrypoint():
    import ctypes

    rng = np.random.default_rng(3)
    syms = rng.integers(0, 5, 500).astype(np.int32)
    buf = np.empty(4096, dtype=np.uint8)
    r = lib.avt_selftest_roundtrip(
        syms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(syms), 5,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
    )
    assert r > 0


def test_spec_coeffs_native_python_parity(monkeypatch):
    """avt_spec_coeffs (spec-AV1 coefficient loop) vs the Python fallback:
    decoding the same foreign AVIF must produce identical planes whether the
    C++ fast path or the pure-Python reference loop runs (ADVICE r2 #4 —
    previously only the own-format tile coder had a parity test)."""
    import pathlib

    from libavif_tpu.api import Decoder

    f = pathlib.Path("/root/reference/tests/data/alpha_noispe.avif")
    if not f.is_file():
        pytest.skip("no reference corpus")
    blob = f.read_bytes()

    def run():
        d = Decoder()
        d.parse(blob)
        assert d.next_image()
        img = d.image
        return [np.asarray(p).copy() for p in img.yuv_planes if p is not None] + (
            [np.asarray(img.alpha_plane).copy()]
            if img.alpha_plane is not None
            else []
        )

    native_planes = run()
    # force the pure-Python spec loop (including the cached fused-txb and
    # native-transform resolvers)
    from libavif_tpu.codec.av1 import decode as spec_decode
    from libavif_tpu.codec.av1 import transforms as spec_tx

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    monkeypatch.setattr(spec_decode, "_fused", False)
    monkeypatch.setattr(spec_tx, "_native_tx", False)
    py_planes = run()
    assert len(native_planes) == len(py_planes) and len(native_planes) >= 1
    for a, b in zip(native_planes, py_planes):
        np.testing.assert_array_equal(a, b)


def test_spec_encoder_native_python_parity(monkeypatch):
    """The native msac encoder + fused avt_spec_txb_enc must produce a
    byte-identical spec-AV1 payload to the pure-Python MsacEncoder +
    scripted MirrorCoder path (CLAUDE.md bit-identity invariant for the
    encode side)."""
    from libavif_tpu.codec.av1 import decode as spec_decode
    from libavif_tpu.codec.av1 import transforms as spec_tx
    from libavif_tpu.codec.av1.encode import encode_lossy_still

    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:96, 0:128]
    y = (128 + 70 * np.sin(yy / 7.0) * np.cos(xx / 9.0)
         + rng.rand(96, 128) * 24 - 12).clip(0, 255).astype(np.uint8)
    u = (128 + 40 * np.sin(np.mgrid[0:48, 0:64][1] / 5.0)).clip(0, 255).astype(np.uint8)
    v = (128 + 40 * np.cos(np.mgrid[0:48, 0:64][0] / 6.0)).clip(0, 255).astype(np.uint8)

    def run():
        return encode_lossy_still([y, u, v], qindex=70, speed=6,
                                  enable_cdef=True, cdef_search=True)

    native_payload = run()
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    monkeypatch.setattr(spec_decode, "_fused", False)
    monkeypatch.setattr(spec_tx, "_native_tx", False)
    py_payload = run()
    assert native_payload == py_payload


def test_enc_walk_native_python_parity(monkeypatch):
    """The C++ encode-side tile walk (avt_spec_tile_enc_walk) must emit a
    byte-identical payload to the Python MirrorCoder walk — including
    with screen-content tools signalled (the palette-gate context uses
    log2(w4)+log2(h4)-2; a 64px block overflows the CDF table if the -2
    is dropped, the round-3 heap-corruption bug)."""
    from libavif_tpu.codec.av1.encode import encode_lossy_still

    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:128, 0:128]
    y = (128 + 60 * np.sin(yy / 11.0) * np.cos(xx / 7.0)
         + rng.rand(128, 128) * 30 - 15).clip(0, 255).astype(np.uint8)
    u = np.full((64, 64), 120, np.uint8)
    v = np.full((64, 64), 136, np.uint8)

    for kw in (dict(), dict(allow_scc=True)):
        monkeypatch.setenv("LIBAVIF_TPU_TILEWALK", "1")
        nat = encode_lossy_still([y, u, v], qindex=140, speed=6, **kw)
        monkeypatch.setenv("LIBAVIF_TPU_TILEWALK", "0")
        py = encode_lossy_still([y, u, v], qindex=140, speed=6, **kw)
        assert nat == py, kw


def test_tile_walk_native_python_parity(monkeypatch):
    """The C++ tile walk (avt_spec_tile) must reproduce the Python
    reference walk bit-exactly on a stream exercising varied modes,
    angle deltas, tx depths/types, CFL and clipped edge blocks."""
    from libavif_tpu.codec.av1.encode import encode_lossy_still
    from libavif_tpu.codec.av1.stream import StreamDecoder

    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:100, 0:148]  # non-multiple-of-SB dims
    y = (120 + 80 * np.sin(yy / 5.0 + xx / 11.0)
         + rng.rand(100, 148) * 60 - 30).clip(0, 255).astype(np.uint8)
    u = (128 + (yy[:50, :74] * 2 - xx[:50, :74])).clip(0, 255).astype(np.uint8)
    v = (128 - (yy[:50, :74] - xx[:50, :74] * 2)).clip(0, 255).astype(np.uint8)
    payload = encode_lossy_still([y, u, v], qindex=60, speed=4)

    monkeypatch.setenv("LIBAVIF_TPU_TILEWALK", "0")
    ref = StreamDecoder().decode_obus(payload)[-1][0]
    monkeypatch.setenv("LIBAVIF_TPU_TILEWALK", "1")
    out = StreamDecoder().decode_obus(payload)[-1][0]
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("backend", ["python", "native"])
def test_finish_spec_trailing_pattern(backend, monkeypatch):
    """AV1 symbol-coder termination: the code word must satisfy
    code % 2^15 == 2^14, i.e. the bit at stream index total_shift is 1
    and everything after is 0 — libaom's
    check_trailing_bits_after_symbol_coder rejects the tile otherwise
    (dav1d never checks, so only libaom catches a violation)."""
    import random

    from libavif_tpu.codec.av1.encode import _make_tile_encoder
    from libavif_tpu.models.av1.msac import MsacEncoder, uniform_icdf

    monkeypatch.setenv("LIBAVIF_TPU_NATIVE", "0" if backend == "python" else "1")
    rng = random.Random(5)
    for _ in range(20):
        enc = MsacEncoder() if backend == "python" else _make_tile_encoder()
        if backend == "native" and isinstance(enc, MsacEncoder):
            pytest.skip("native encoder unavailable")
        cdfs = {}
        ts_probe = MsacEncoder()
        for _ in range(rng.randrange(1, 300)):
            n = rng.randrange(2, 12)
            s = rng.randrange(n)
            icdf = cdfs.setdefault(n, uniform_icdf(n))
            enc.encode_symbol(s, icdf.copy(), n)
            ts_probe.encode_symbol(s, icdf, n)
        out = enc.finish(strip=False)
        nbits = ts_probe.total_shift + 15
        code = int.from_bytes(out, "big") >> (len(out) * 8 - nbits)
        assert code % (1 << 15) == 1 << 14, out.hex()
