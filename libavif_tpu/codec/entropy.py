"""Host entropy layer: msac tile coding of modes and coefficient levels.

Bitstream (per tile, this codec's own AV1-style design):
  for each block in raster order:
    mode          : N_MODES(=13)-symbol adaptive CDF
    all_zero      : 2-symbol adaptive CDF
    if any nonzero coefficient:
      tx_type     : 5-symbol adaptive CDF (lossy tiles only; lossless is
                    always WHT and codes no symbol)
      eob_class   : adaptive CDF over log2 buckets of (eob-1)
      eob_offset  : raw literal bits (class-1 bits, classes >= 2)
      for k = eob-1 down to 0 (backward over the zigzag scan):
        base      : at k==eob-1 a 3-symbol CDF {1,2,3+} by position class;
                    else a 4-symbol CDF {0,1,2,3+} with context =
                    position class (DC / <n / rest) x neighbor-magnitude
                    class from the two already-coded scan positions
        range     : up to 4 ladder symbols of {0..3} (position-class CDF)
                    when base==3+, then Exp-Golomb for magnitudes >= 15
        sign      : adaptive CDF for DC, raw bit for AC

This is the reference implementation (pure Python over the msac reference
coder). The C++ fast path must be bit-identical; tests enforce. The role
mirrors the coefficient coding the reference delegates to libaom/dav1d
(SURVEY.md §2.2) without copying either.
"""

from __future__ import annotations

import numpy as np

import ctypes

from .. import native as _native
from ..models.av1.msac import MsacDecoder, MsacEncoder, uniform_icdf
from ..ops.intra import N_MODES
from .scan import zigzag_flat


def _encode_tile_native(lib, levels, modes, rb: int, cb: int, n: int, tx_types=None) -> bytes:
    lv = np.ascontiguousarray(levels, dtype=np.int32)
    md = np.ascontiguousarray(modes, dtype=np.int32)
    if tx_types is not None:
        tx = np.ascontiguousarray(tx_types, dtype=np.int32)
        tx_ptr = tx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    else:
        tx_ptr = None
    cap = lv.size * 8 + 1024  # generous: worst case ~ few bytes per coeff
    out = np.empty(cap, dtype=np.uint8)
    size = lib.avt_encode_tile(
        lv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        md.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tx_ptr,
        rb, cb, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if size < 0:
        return _encode_tile_py(levels, modes, rb, cb, n, tx_types)
    return out[:size].tobytes()


def _decode_tile_native(lib, data: bytes, rb: int, cb: int, n: int, with_tx: bool = False):
    levels = np.zeros((rb, cb, n, n), dtype=np.int32)
    modes = np.zeros((rb, cb), dtype=np.int32)
    txs = np.zeros((rb, cb), dtype=np.int32)
    buf = np.frombuffer(data, dtype=np.uint8) if data else np.zeros(1, dtype=np.uint8)
    rc = lib.avt_decode_tile(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        rb, cb, n,
        levels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        modes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        txs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if with_tx else None,
    )
    if rc < 0:
        raise ValueError(f"native tile decode failed ({rc})")
    if with_tx:
        return levels, modes, txs
    return levels, modes

N_BASE_CTX = 3


def _eob_classes(n: int) -> int:
    """Number of log2 buckets for eob-1 in [0, n*n-1]."""
    return (n * n - 1).bit_length() + 1


N_TX = 5  # must match recon.TX_SET_ALL

# Trained initial inverse-CDFs (15-bit), measured over mixed synthetic
# content and blended toward uniform (role of libaom's default_*_cdf
# tables; values are this codec's own). The C++ coder mirrors these
# exactly (native/msac.cc kInit*).
# 13-symbol alphabet: 12 descending ICDF thresholds + terminal 0, plus one
# trailing 0 that is the msac adaptation counter slot (n+1 entries total —
# same layout convention as aom's AOM_CDF tables).
_INIT_MODE = (27197, 22610, 19661, 18678, 17039, 16056, 14746, 13763, 12452, 7209, 4588, 2294, 0, 0)
_INIT_ALLZERO = (22938, 0, 0)
_INIT_TX = (9830, 7209, 4588, 1966, 0, 0)
# v2 coefficient model (FRAME_MAGIC 0x59): 3 scan-position classes x 3
# neighbor-magnitude classes for the base symbol, a separate {1,2,3+}
# alphabet at the eob position, a 4-step base-range ladder before the
# golomb tail, and an adaptive DC sign. Same role as AV1's coefficient
# contexts (§5.11.39) re-shaped for this codec's single zigzag scan.
_INIT_BASE = (
    # pos class 0 (DC) x mag 0..2
    (26214, 19661, 16384, 0, 0),
    (22938, 16384, 11469, 0, 0),
    (19661, 13107, 8192, 0, 0),
    # pos class 1 (low AC)
    (16384, 9175, 5898, 0, 0),
    (13107, 7373, 4588, 0, 0),
    (9830, 5243, 3277, 0, 0),
    # pos class 2 (high AC)
    (6554, 1638, 655, 0, 0),
    (5243, 1966, 983, 0, 0),
    (4588, 2294, 1311, 0, 0),
)
_INIT_BASE_EOB = (
    (16384, 8192, 0, 0),
    (11469, 4915, 0, 0),
    (8192, 3277, 0, 0),
)
_INIT_BR = (
    (16384, 8192, 4096, 0, 0),
    (13107, 6554, 3277, 0, 0),
    (11469, 5734, 2867, 0, 0),
)
_INIT_DC_SIGN = (16384, 0, 0)
BR_STEPS = 4  # ladder length; magnitudes >= 15 spill to the golomb tail


def _icdf(values) -> np.ndarray:
    return np.asarray(values, dtype=np.uint16)


class TileCdfs:
    """Fresh adaptive CDF set per tile (tiles are entropy-independent,
    which is what makes them the unit of host/chip parallelism —
    SURVEY.md §2.4)."""

    def __init__(self, n: int):
        self.mode = _icdf(_INIT_MODE)
        self.allzero = _icdf(_INIT_ALLZERO)
        self.tx = _icdf(_INIT_TX)
        self.eob_class = uniform_icdf(_eob_classes(n))
        self.base = [_icdf(t) for t in _INIT_BASE]
        self.base_eob = [_icdf(t) for t in _INIT_BASE_EOB]
        self.br = [_icdf(t) for t in _INIT_BR]
        self.dc_sign = _icdf(_INIT_DC_SIGN)


def _base_ctx(k: int, n: int) -> int:
    if k == 0:
        return 0
    return 1 if k < n else 2


def _mag_ctx(cache, k: int, nn: int) -> int:
    """Neighbor-magnitude class from the two already-coded (higher) scan
    positions; coefficients code backward from eob."""
    s = cache[k + 1] if k + 1 < nn else 0
    if k + 2 < nn:
        s += cache[k + 2]
    s = (s + 1) >> 1
    return 2 if s > 2 else s


def encode_tile(levels: np.ndarray, modes: np.ndarray, n: int, tx_types=None) -> bytes:
    """levels: (Rb, Cb, n, n) int32, modes: (Rb, Cb) int -> tile payload.
    tx_types: (Rb, Cb) transform symbols, or None for lossless (no tx
    symbols coded).

    Dispatches to the C++ fast path when available (bit-identical to the
    Python reference below; tests enforce)."""
    rb, cb = modes.shape
    lib = _native.load()
    if lib is not None:
        return _encode_tile_native(lib, levels, modes, rb, cb, n, tx_types)
    return _encode_tile_py(levels, modes, rb, cb, n, tx_types)


def _encode_tile_py(levels, modes, rb: int, cb: int, n: int, tx_types=None) -> bytes:
    scan = zigzag_flat(n)
    lv = np.asarray(levels, dtype=np.int64).reshape(rb * cb, n * n)[:, scan]
    md = np.asarray(modes).reshape(-1)
    cdfs = TileCdfs(n)
    enc = MsacEncoder()
    ec = _eob_classes(n)
    tx = None if tx_types is None else np.asarray(tx_types).reshape(-1)
    nn = n * n
    for b in range(rb * cb):
        enc.encode_symbol(int(md[b]), cdfs.mode, N_MODES)
        row = lv[b]
        nz = np.nonzero(row)[0]
        if nz.size == 0:
            enc.encode_symbol(0, cdfs.allzero, 2)
            continue
        enc.encode_symbol(1, cdfs.allzero, 2)
        if tx is not None:
            enc.encode_symbol(int(tx[b]), cdfs.tx, N_TX)
        eob = int(nz[-1]) + 1
        cls = (eob - 1).bit_length()
        enc.encode_symbol(cls, cdfs.eob_class, ec)
        if cls >= 2:
            enc.encode_literal(eob - 1 - (1 << (cls - 1)), cls - 1)
        cache = [0] * nn
        for k in range(eob - 1, -1, -1):
            v = int(row[k])
            a = abs(v)
            pctx = _base_ctx(k, n)
            if k == eob - 1:
                enc.encode_symbol(min(a, 3) - 1, cdfs.base_eob[pctx], 3)
            else:
                mctx = _mag_ctx(cache, k, nn)
                enc.encode_symbol(min(a, 3), cdfs.base[pctx * 3 + mctx], 4)
            if a >= 3:
                rem = a - 3
                for _ in range(BR_STEPS):
                    s = min(rem, 3)
                    enc.encode_symbol(s, cdfs.br[pctx], 4)
                    rem -= s
                    if s < 3:
                        break
                if a >= 3 + 3 * BR_STEPS:
                    enc.encode_golomb(a - 3 - 3 * BR_STEPS)
            if a:
                if k == 0:
                    enc.encode_symbol(1 if v < 0 else 0, cdfs.dc_sign, 2)
                else:
                    enc.encode_bit(1 if v < 0 else 0)
            cache[k] = min(a, 3)
    return enc.finish()


def decode_tile(data: bytes, rb: int, cb: int, n: int, with_tx: bool = False):
    """Inverse of encode_tile: payload -> (levels, modes[, tx_types])."""
    lib = _native.load()
    if lib is not None:
        return _decode_tile_native(lib, data, rb, cb, n, with_tx)
    return _decode_tile_py(data, rb, cb, n, with_tx)


def _decode_tile_py(data: bytes, rb: int, cb: int, n: int, with_tx: bool = False):
    scan = zigzag_flat(n)
    cdfs = TileCdfs(n)
    dec = MsacDecoder(data)
    ec = _eob_classes(n)
    lv = np.zeros((rb * cb, n * n), dtype=np.int32)
    md = np.zeros(rb * cb, dtype=np.int32)
    tx = np.zeros(rb * cb, dtype=np.int32)
    nn = n * n
    for b in range(rb * cb):
        md[b] = dec.decode_symbol(cdfs.mode, N_MODES)
        if dec.decode_symbol(cdfs.allzero, 2) == 0:
            continue
        if with_tx:
            tx[b] = dec.decode_symbol(cdfs.tx, N_TX)
        cls = dec.decode_symbol(cdfs.eob_class, ec)
        if cls >= 2:
            eob = (1 << (cls - 1)) + dec.decode_literal(cls - 1) + 1
        else:
            eob = cls + 1
        if eob > nn:
            eob = nn
        row = lv[b]
        cache = [0] * nn
        for k in range(eob - 1, -1, -1):
            pctx = _base_ctx(k, n)
            if k == eob - 1:
                a = dec.decode_symbol(cdfs.base_eob[pctx], 3) + 1
            else:
                mctx = _mag_ctx(cache, k, nn)
                a = dec.decode_symbol(cdfs.base[pctx * 3 + mctx], 4)
            if a >= 3:
                for _ in range(BR_STEPS):
                    s = dec.decode_symbol(cdfs.br[pctx], 4)
                    a += s
                    if s < 3:
                        break
                if a == 3 + 3 * BR_STEPS:
                    g = dec.decode_golomb()
                    # Same clamp as msac.cc's native golomb tail: a
                    # hostile stream can otherwise yield values > int32
                    # and crash the levels store with an OverflowError.
                    a += min(g, 1 << 24)
            if a:
                if k == 0:
                    sign = dec.decode_symbol(cdfs.dc_sign, 2)
                else:
                    sign = dec.decode_bit()
                row[scan[k]] = -a if sign else a
            cache[k] = min(a, 3)
    if with_tx:
        return lv.reshape(rb, cb, n, n), md.reshape(rb, cb), tx.reshape(rb, cb)
    return lv.reshape(rb, cb, n, n), md.reshape(rb, cb)


# ------------------------------------------------- entropy column tiles

def tile_cols(cb: int) -> int:
    """Entropy tile-column count for a plane of cb block-columns: tiles of
    >= 16 block columns (~256 px at n=16), at most 8 — the auto-tiling
    role of write.c:89-119, applied to entropy partitions. Prediction is
    NOT reset at tile edges (the wavefront is whole-plane); tiles are
    purely independent entropy streams for host parallelism."""
    return min(8, max(1, cb // 16))


def tile_col_ranges(cb: int):
    """[(c0, c1)] block-column spans per entropy tile."""
    t = tile_cols(cb)
    base = cb // t
    rem = cb % t
    out = []
    c0 = 0
    for i in range(t):
        w = base + (1 if i < rem else 0)
        out.append((c0, c0 + w))
        c0 += w
    return out


def encode_plane_payload(levels, modes, n: int, tx_types=None, pool=None) -> bytes:
    """Plane payload: leb128 tile count, per-tile leb128 size, payloads.
    Tiles run concurrently on ``pool`` when given."""
    from ..containers.obu import write_leb128
    from ..utils.streams import RWStream

    cb = modes.shape[1]
    spans = tile_col_ranges(cb)

    def one(span):
        c0, c1 = span
        tx = None if tx_types is None else tx_types[:, c0:c1]
        return encode_tile(levels[:, c0:c1], modes[:, c0:c1], n, tx)

    if pool is not None and len(spans) > 1:
        payloads = list(pool.map(one, spans))
    else:
        payloads = [one(s) for s in spans]
    s = RWStream()
    write_leb128(s, len(payloads))
    for p in payloads:
        write_leb128(s, len(p))
    for p in payloads:
        s.write(p)
    return s.data()


def decode_plane_payload(payload: bytes, rb: int, cb: int, n: int,
                         with_tx: bool = False, pool=None):
    """Inverse of encode_plane_payload -> (levels, modes[, tx])."""
    from ..containers.obu import read_leb128
    from ..utils.streams import ROStream

    s = ROStream(payload)
    t = read_leb128(s)
    spans = tile_col_ranges(cb)
    if t != len(spans):
        raise ValueError(f"tile count {t} != expected {len(spans)}")
    sizes = [read_leb128(s) for _ in range(t)]
    blobs = [s.read(sz) for sz in sizes]

    def one(args):
        blob, (c0, c1) = args
        return decode_tile(blob, rb, c1 - c0, n, with_tx)

    if pool is not None and t > 1:
        parts = list(pool.map(one, zip(blobs, spans)))
    else:
        parts = [one(a) for a in zip(blobs, spans)]
    levels = np.concatenate([p[0] for p in parts], axis=1)
    modes = np.concatenate([p[1] for p in parts], axis=1)
    if with_tx:
        tx = np.concatenate([p[2] for p in parts], axis=1)
        return levels, modes, tx
    return levels, modes
