"""Top-level spec-AV1 still decode: OBU payload -> YUV planes.

The entry point the container/codec seam calls for real AV1 payloads
(role of codec_dav1d.c:58-156 dav1dCodecGetNextImage)."""

from __future__ import annotations

import numpy as np

from ...constants import AvifError, Result
from ...containers.obu import parse_sequence_header, split_obus
from .decode import FrameDecoder
from .headers import parse_frame_header

OBU_SEQUENCE_HEADER = 1
OBU_TEMPORAL_DELIMITER = 2
OBU_FRAME_HEADER = 3
OBU_TILE_GROUP = 4
OBU_METADATA = 5
OBU_FRAME = 6


def _parse_tile_group(data: bytes, hdr, start_offset_bits: int = 0):
    """§5.11.1: returns list of (tile_index, payload_bytes)."""
    n_tiles = hdr.tile.cols * hdr.tile.rows
    pos = 0
    tg_start, tg_end = 0, n_tiles - 1
    if n_tiles > 1:
        if not data:
            raise AvifError(Result.BMFF_PARSE_FAILED, "empty tile group payload")
        b0 = data[0]
        present = b0 >> 7
        if present:
            # §5.11.1: tg_start/tg_end use TileColsLog2 + TileRowsLog2 bits
            # (matches headers.py context_update_tile_id), not bit_length of
            # the tile count — they differ for non-power-of-2 layouts.
            from .headers import _tile_log2

            bits = _tile_log2(1, hdr.tile.cols) + _tile_log2(1, hdr.tile.rows)
            # bit-exact read of tg_start/tg_end then byte align
            from ...utils.streams import ROStream

            s = ROStream(data)
            s.start_bits()
            s.read_bits(1)
            tg_start = s.read_bits(bits)
            tg_end = s.read_bits(bits)
            s.align_bits_read()
            pos = s.offset
        else:
            pos = 1
    tiles = []
    for idx in range(tg_start, tg_end + 1):
        if idx == tg_end:
            payload = data[pos:]
            pos = len(data)
        else:
            sz = int.from_bytes(data[pos : pos + hdr.tile.tile_size_bytes], "little") + 1
            pos += hdr.tile.tile_size_bytes
            payload = data[pos : pos + sz]
            pos += sz
        tiles.append((idx, payload))
    return tiles


def decode_still(payload: bytes):
    """Decode an AV1 still payload (sequence of OBUs). Returns
    (planes list of np arrays, seq header, frame header)."""
    obus = split_obus(payload)
    seq = None
    hdr = None
    tiles = []
    complete = None
    for o in obus:
        if o.obu_type == OBU_SEQUENCE_HEADER:
            seq = parse_sequence_header(o.payload)
        elif o.obu_type == OBU_FRAME_HEADER:
            if seq is None:
                raise AvifError(Result.BMFF_PARSE_FAILED, "frame header before seq")
            new_hdr = parse_frame_header(o.payload, seq)
            if (
                hdr is not None
                and tiles
                and len(tiles) < hdr.tile.cols * hdr.tile.rows
            ):
                # redundant frame header mid-frame (§5.9.1: a frame header
                # repeated before the frame's tile groups complete must
                # describe the same frame) — keep the collected tiles
                pass
            else:
                if hdr is not None and len(tiles) == hdr.tile.cols * hdr.tile.rows:
                    complete = (hdr, tiles)  # completed frame; a trailing
                    # partial repeat (fuzz corpus poc_b) must not lose it
                tiles = []  # a new frame starts (progressive layer semantics)
            hdr = new_hdr
        elif o.obu_type == OBU_FRAME:
            if seq is None:
                raise AvifError(Result.BMFF_PARSE_FAILED, "frame before seq")
            hdr = parse_frame_header(o.payload, seq)
            tiles = _parse_tile_group(o.payload[hdr.header_bytes :], hdr)
        elif o.obu_type == OBU_TILE_GROUP:
            if hdr is None:
                raise AvifError(Result.BMFF_PARSE_FAILED, "tile group before header")
            tiles += _parse_tile_group(o.payload, hdr)
    if (
        complete is not None
        and (hdr is None or len(tiles) < hdr.tile.cols * hdr.tile.rows)
    ):
        hdr, tiles = complete  # fall back to the last complete frame
    if seq is None or hdr is None or not tiles:
        raise AvifError(Result.BMFF_PARSE_FAILED, "incomplete AV1 payload")
    dec = FrameDecoder(seq, hdr)
    planes = dec.decode_tiles(tiles)
    return planes, seq, hdr
