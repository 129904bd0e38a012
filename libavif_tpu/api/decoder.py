"""Decoder aggregate — the ``avifDecoder`` equivalent (avif.h:1253-1387).

Reference call stack mirrored (SURVEY.md §3.1): parse container →
select source (item vs track) → find color/alpha items → generate tiles
(grid cells) → decode via native codec → reassemble → metadata harvest.
"""

from __future__ import annotations

import enum
from typing import Optional

import numpy as np

from ..codec import decode_frame
from ..constants import (
    AvifError,
    DEFAULT_IMAGE_COUNT_LIMIT,
    DEFAULT_IMAGE_DIMENSION_LIMIT,
    DEFAULT_IMAGE_SIZE_LIMIT,
    PixelFormat,
    Range,
    Result,
    StrictFlags,
)
from ..containers import parse as containers_parse
from ..containers.items import Container, Item, Meta
from ..containers.parse import parse as parse_container
from ..containers.parse import parse_image_grid, read_item_payload
from ..image import Image
from .io import IO, MemoryIO, wrap as wrap_io

import dataclasses


@dataclasses.dataclass
class IOStats:
    """avifIOStats (avif.h:1169-1175): coded payload byte sizes."""

    color_obu_size: int = 0
    alpha_obu_size: int = 0

ALPHA_URN = "urn:mpeg:mpegB:cicp:systems:auxiliary:alpha"
# read.c isAlphaURN also accepts the HEVC auxid (AVIF_URN_ALPHA1).
ALPHA_URN_1 = "urn:mpeg:hevc:2015:auxid:1"


class Source(enum.IntEnum):
    """avifDecoderSource (avif.h:1210-1232)."""

    AUTO = 0
    PRIMARY_ITEM = 1
    TRACKS = 2


class ProgressiveState(enum.IntEnum):
    """avifProgressiveState (avif.h:1240-1252)."""

    UNAVAILABLE = 0
    AVAILABLE = 1
    ACTIVE = 2


class Decoder:
    """Pull-based decoder over an in-memory AVIF payload.

    Usage: d = Decoder(); d.parse(data); while d.next_image(): use d.image
    — the avifDecoderParse / avifDecoderNextImage protocol
    (read.c:5288 / read.c:6972).
    """

    def __init__(self):
        self.source = Source.AUTO
        self.strict_flags = StrictFlags.ALL
        self.image_size_limit = DEFAULT_IMAGE_SIZE_LIMIT
        self.image_dimension_limit = DEFAULT_IMAGE_DIMENSION_LIMIT
        self.image_count_limit = DEFAULT_IMAGE_COUNT_LIMIT

        self.image: Optional[Image] = None
        self.image_index = -1
        self.image_count = 0
        self.timescale = 1
        self.duration_in_timescales = 0
        self.repetition_count = 0
        self.alpha_present = False
        self.io_stats = IOStats()

        self._data: bytes = b""
        self._container: Optional[Container] = None
        self._color_item: Optional[Item] = None
        self._alpha_item: Optional[Item] = None
        self._use_tracks = False
        self._color_track = None
        self._alpha_track = None
        self._sato_item = None
        self._tmap_item = None
        # avifDecoder::imageContentToDecode analogue: decode the gain map
        # when present (avif.h image_content flags).
        self.decode_gain_map = True
        self.gain_map_present = False
        # Incremental decoding (avifDecoder::allowIncremental, read.c:7189)
        self.allow_incremental = False
        # Progressive (a1lx layered) decoding (avifDecoder::allowProgressive)
        self.allow_progressive = False
        self.progressive_state = ProgressiveState.UNAVAILABLE
        self._layer_ends: list[int] = []
        self._io: Optional[IO] = None
        self._decoded_cell_count = 0
        self._grid_shape = None  # (rows, cols, cell_h) of the color grid
        # per-track spec-AV1 stream decoders: animation samples may be
        # inter frames (read.c:6972-7062 walks them in order through one
        # persistent dav1d context; we keep one StreamDecoder per track)
        self._track_streams: dict = {}

    # ----------------------------------------------------------------- parse

    def _check_dims(self, w: int, h: int) -> None:
        if w <= 0 or h <= 0:
            raise AvifError(Result.BMFF_PARSE_FAILED, "zero-size image")
        if w * h > self.image_size_limit:
            raise AvifError(Result.INVALID_IMAGE_GRID, "image exceeds size limit")
        if w > self.image_dimension_limit or h > self.image_dimension_limit:
            raise AvifError(Result.INVALID_IMAGE_GRID, "dimension exceeds limit")

    def _find_alpha_item(self, meta: Meta, color: Item) -> Optional[Item]:
        """reference: avifMetaFindAlphaItem (read.c:5496)."""
        for item in meta.items.values():
            if item.aux_for_id != color.id or item.item_type != "av01":
                continue
            aux = item.find_property("auxC")
            if aux is None or aux.aux_type in (ALPHA_URN, ALPHA_URN_1):
                return item
        return None

    def _find_sato_item(self, meta: Meta, color: Item):
        """Bit-depth extension discovery (reference:
        avifDecoderDataFindSampleTransformImageItem, read.c:6000): a 'sato'
        item sharing an 'altr' group with the primary, or one whose first
        dimg input is the primary."""
        for group in meta.entity_groups:
            if group.grouping_type != "altr" or color.id not in group.entity_ids:
                continue
            for eid in group.entity_ids:
                cand = meta.items.get(eid)
                if cand is not None and cand.item_type == "sato":
                    return cand
        for cand in meta.items.values():
            if cand.item_type == "sato" and cand.refs.get("dimg", [None])[0] == color.id:
                return cand
        return None

    def _find_tmap_item(self, meta: Meta, color: Item):
        """Gain map discovery (reference: avifDecoderFindGainMapItem,
        read.c:5766): a 'tmap' item in an altr group with the primary whose
        first dimg input is the primary."""
        for cand in meta.items.values():
            if cand.item_type != "tmap":
                continue
            dimg = cand.refs.get("dimg", [])
            if dimg and dimg[0] == color.id:
                self.gain_map_present = True
                return cand
        return None

    def set_io_memory(self, data: bytes) -> None:
        self._io = MemoryIO(data)

    def set_io_file(self, path) -> None:
        from .io import FileIO

        self._io = FileIO(path)

    def parse(self, source=None) -> None:
        """reference: avifDecoderParse (read.c:5288). ``source`` may be
        bytes, a path, or an IO; omit it after set_io_*()."""
        if source is not None:
            self._io = wrap_io(source)
        if self._io is None:
            raise AvifError(Result.NO_CONTENT, "no IO source set")
        data = self._io.read(0, self._io.size_hint or (1 << 31))
        self._data = data
        try:
            c = parse_container(data)
        except AvifError as e:
            incomplete = self._io.size_hint and len(data) < self._io.size_hint
            retryable = (
                Result.BMFF_PARSE_FAILED,
                Result.TRUNCATED_DATA,
                Result.INVALID_FTYP,
                Result.NO_CONTENT,
            )
            if e.result in retryable and incomplete:
                raise AvifError(
                    Result.WAITING_ON_IO, f"parse needs more bytes ({e})"
                ) from e
            raise
        self._container = c

        has_tracks = bool(c.tracks)
        want_tracks = self.source == Source.TRACKS or (
            self.source == Source.AUTO and has_tracks and c.has_brand("avis")
        )
        if want_tracks and not has_tracks:
            raise AvifError(Result.NO_CONTENT, "no tracks in file")

        if want_tracks:
            self._use_tracks = True
            pict = [t for t in c.tracks if t.handler_type == "pict" and t.sample_table]
            if not pict:
                raise AvifError(Result.BMFF_PARSE_FAILED, "no picture track")
            self._color_track = pict[0]
            # aux alpha track references the color track (read.c track source)
            self._alpha_track = next(
                (
                    t
                    for t in c.tracks
                    if t.aux_for_id == self._color_track.id and t.sample_table
                ),
                None,
            )
            st = self._color_track.sample_table
            self.image_count = len(st.sample_sizes)
            if self.image_count_limit and self.image_count > self.image_count_limit:
                raise AvifError(Result.BMFF_PARSE_FAILED, "image count limit")
            self.timescale = self._color_track.media_timescale or 1
            self.duration_in_timescales = self._color_track.media_duration
            self.repetition_count = self._color_track.repetition_count
            self.alpha_present = self._alpha_track is not None
            self._check_dims(self._color_track.width, self._color_track.height)
        else:
            if c.meta is None:
                raise AvifError(Result.BMFF_PARSE_FAILED, "no meta box")
            meta = c.meta
            if not meta.primary_item_id:
                raise AvifError(Result.MISSING_IMAGE_ITEM, "no primary item")
            item = meta.items.get(meta.primary_item_id)
            if item is None:
                raise AvifError(Result.MISSING_IMAGE_ITEM, "primary item not found")
            if item.item_type not in ("av01", "grid"):
                raise AvifError(Result.MISSING_IMAGE_ITEM, f"unsupported {item.item_type}")
            self._color_item = item
            self._alpha_item = self._find_alpha_item(meta, item)
            self._sato_item = self._find_sato_item(meta, item)
            self._tmap_item = self._find_tmap_item(meta, item)
            self.alpha_present = self._alpha_item is not None
            self.image_count = 1
            self._layer_ends = self._progressive_layer_ends(item)
            if self._layer_ends:
                self.progressive_state = ProgressiveState.AVAILABLE
                if self.allow_progressive:
                    self.progressive_state = ProgressiveState.ACTIVE
                    self.image_count = len(self._layer_ends)
            self._check_dims(item.width, item.height)
            self._validate_properties(item)

        self.image_index = -1
        self._track_streams = {}

    def _validate_properties(self, item: Item) -> None:
        """Strictness subset (reference: avifDecoderItemValidateProperties,
        read.c:1240): av1C required; pixi required under strict flags."""
        if item.item_type == "av01" and item.find_property("av1C") is None:
            raise AvifError(Result.BMFF_PARSE_FAILED, "av01 item missing av1C")
        if (
            self.strict_flags & StrictFlags.PIXI_REQUIRED
            and item.item_type == "av01"
            and item.find_property("pixi") is None
        ):
            raise AvifError(Result.BMFF_PARSE_FAILED, "[Strict] missing pixi")

    # ---------------------------------------------------------------- decode

    def _item_payload(self, item: Item) -> bytes:
        """Merge extents through the IO reader (reference: read.c:1143-1230
        + avifDecoderPrepareSample read.c:5218 WAITING_ON_IO semantics)."""
        meta = self._container.meta
        if item.idat:
            return read_item_payload(meta, item, self._data)
        parts = []
        for ext in item.extents:
            parts.append(self._io.read_exact(ext.offset, ext.size))
        return b"".join(parts)

    def _progressive_layer_ends(self, item: Item) -> list[int]:
        """Cumulative layer byte boundaries from a1lx (read.c:690-730);
        empty when the item is not layered or lsel pins one layer."""
        a1lx = item.find_property("a1lx")
        if a1lx is None:
            return []
        lsel = item.find_property("lsel")
        if lsel is not None and lsel.layer_id != 0xFFFF:
            return []
        total = item.size or sum(e.size for e in item.extents)
        ends = []
        acc = 0
        for s in a1lx.layer_size:
            if s <= 0:
                break
            acc += s
            if acc >= total:
                break
            ends.append(acc)
        ends.append(total)
        return ends if len(ends) > 1 else []

    def _decode_item_obus(self, item: Item, width: int = 0, height: int = 0) -> Image:
        payload = self._item_payload(item)
        lsel = item.find_property("lsel")
        if lsel is not None and lsel.layer_id != 0xFFFF:
            # Layer selection: decode the prefix through the chosen layer
            # (read.c lsel handling). Sizes beyond the a1lx entries mean
            # "the rest of the payload" (the final layer).
            a1lx = item.find_property("a1lx")
            if a1lx is not None and lsel.layer_id < 3:
                sizes = [s for s in a1lx.layer_size if s > 0]
                cut = sum(sizes[: lsel.layer_id + 1])
                if lsel.layer_id < len(sizes) and 0 < cut <= len(payload):
                    payload = payload[:cut]
        elif (
            item is self._color_item
            and self.progressive_state == ProgressiveState.ACTIVE
            and self._layer_ends
        ):
            layer = min(self.image_index + 1, len(self._layer_ends) - 1)
            payload = payload[: self._layer_ends[layer]]
        return decode_frame(payload, width, height)

    def _decode_grid(self, grid_item: Item) -> Image:
        """Grid reassembly (reference: read.c:1696 generate tiles +
        read.c:1823 CopyTileToImage)."""
        meta = self._container.meta
        grid = grid_item.grid or parse_image_grid(self._item_payload(grid_item))
        cells = sorted(
            (i for i in meta.items.values() if i.dimg_for_id == grid_item.id),
            key=lambda i: i.dimg_idx,
        )
        expected = grid.rows * grid.columns
        if len(cells) != expected:
            raise AvifError(
                Result.INVALID_IMAGE_GRID, f"{len(cells)} cells, expected {expected}"
            )
        decoded = []
        incremental = self.allow_incremental and grid_item is self._color_item
        if not incremental:
            # Fast path: all cells in one pipelined device/host batch
            # (cells are independent bitstreams).
            from ..codec.frame import decode_frames_pipelined

            streams = [self._item_payload(c) for c in cells]
            decoded = decode_frames_pipelined(streams)
        else:
            for cell in cells:
                try:
                    decoded.append(self._decode_item_obus(cell))
                except AvifError as e:
                    if e.result == Result.WAITING_ON_IO and decoded:
                        break  # expose decoded rows so far (read.c:6736-6740)
                    raise
        first = decoded[0]
        cw, ch = first.width, first.height
        out = Image(grid.output_width, grid.output_height, first.depth, first.yuv_format)
        out.copy_no_pixels(first)
        out.width, out.height = grid.output_width, grid.output_height
        self._check_dims(out.width, out.height)
        out.allocate_planes("yuv")
        if grid_item is self._color_item:
            self._decoded_cell_count = len(decoded)
            self._grid_shape = (grid.rows, grid.columns, ch, out.height)
        for idx, cell_img in enumerate(decoded):
            if (cell_img.width, cell_img.height) != (cw, ch):
                raise AvifError(Result.INVALID_IMAGE_GRID, "cell size mismatch")
            if (cell_img.depth, cell_img.yuv_format) != (out.depth, out.yuv_format):
                raise AvifError(Result.INVALID_IMAGE_GRID, "cell format mismatch")
            r, col = divmod(idx, grid.columns)
            y0, x0 = r * ch, col * cw
            for p in range(3):
                src = cell_img.yuv_planes[p]
                dst = out.yuv_planes[p]
                if src is None or dst is None:
                    continue
                sx = x0 >> (0 if p == 0 else _shift_x(out.yuv_format))
                sy = y0 >> (0 if p == 0 else _shift_y(out.yuv_format))
                h = min(src.shape[0], dst.shape[0] - sy)
                w = min(src.shape[1], dst.shape[1] - sx)
                if h > 0 and w > 0:
                    dst[sy : sy + h, sx : sx + w] = src[:h, :w]
        if len(decoded) < expected:
            # Partial grid: publish progress, surface WAITING_ON_IO
            # (reference: read.c:7021-7035; idempotent and resumable).
            self.image = out
            raise AvifError(Result.WAITING_ON_IO, "grid cells pending")
        return out

    def _harvest_item_metadata(self, item: Item, img: Image) -> None:
        """colr/clli/pasp/clap/irot/imir/Exif/XMP onto the decoded image
        (reference: read.c:6596 region)."""
        meta = self._container.meta
        colr_icc = None
        colr_nclx = None
        for p in item.properties:
            if p.fourcc == "colr":
                v = p.value
                if v.icc and colr_icc is None:
                    colr_icc = v
                if v.has_nclx and colr_nclx is None:
                    colr_nclx = v
        if colr_icc is not None:
            img.icc = colr_icc.icc
        if colr_nclx is not None:
            img.color_primaries = colr_nclx.color_primaries
            img.transfer_characteristics = colr_nclx.transfer_characteristics
            img.matrix_coefficients = colr_nclx.matrix_coefficients
            img.yuv_range = colr_nclx.yuv_range
        from ..constants import TransformFlags

        pasp = item.find_property("pasp")
        if pasp is not None:
            img.pasp = pasp
            img.transform_flags |= TransformFlags.PASP
        clap = item.find_property("clap")
        if clap is not None:
            img.clap = clap
            img.transform_flags |= TransformFlags.CLAP
        irot = item.find_property("irot")
        if irot is not None:
            img.irot = irot
            img.transform_flags |= TransformFlags.IROT
        imir = item.find_property("imir")
        if imir is not None:
            img.imir = imir
            img.transform_flags |= TransformFlags.IMIR
        clli = item.find_property("clli")
        if clli is not None:
            img.clli = clli
        # Opaque/unrecognized properties pass through (avif.h:846-851;
        # reference: properties.c known-fourcc filtering).
        from ..containers.items import KNOWN_PROPERTY_TYPES

        img.properties = [
            p for p in item.properties if p.fourcc not in KNOWN_PROPERTY_TYPES
        ]
        if meta is not None:
            for other in meta.items.values():
                if other.desc_for_id != item.id:
                    continue
                if other.item_type == "Exif":
                    payload = self._item_payload(other)
                    if other.item_name == "mini-raw":
                        img.exif = payload  # mini boxes store raw Exif
                    elif len(payload) >= 4:
                        off = int.from_bytes(payload[:4], "big")
                        img.exif = payload[4 + off :] if 4 + off <= len(payload) else b""
                elif other.item_type == "mime":
                    img.xmp = self._item_payload(other)

    def _apply_sample_transform(self, sato: Item, color: Item, base_img: Image) -> Image:
        """16-bit reconstruction (reference: avifDecoderApplySampleTransform,
        read.c:6939): decode the extra dimg inputs and run the expression."""
        from ..hdr import sampletransform as st

        meta = self._container.meta
        payload = self._item_payload(sato)
        inputs_ids = sato.refs.get("dimg", [])
        expression = st.parse_sato(payload)
        if not st.validate_expression(expression, len(inputs_ids)):
            raise AvifError(Result.BMFF_PARSE_FAILED, "invalid sato expression")
        pixi = sato.find_property("pixi")
        depth = pixi.plane_depths[0] if pixi and pixi.plane_depths else 16
        if depth not in (8, 10, 12, 16):
            raise AvifError(Result.NOT_IMPLEMENTED, f"sato depth {depth}")
        inputs = []
        for iid in inputs_ids:
            if iid == color.id:
                inputs.append(base_img)
                continue
            it = meta.items.get(iid)
            if it is None:
                raise AvifError(Result.BMFF_PARSE_FAILED, "missing sato input item")
            if it.item_type == "grid":
                inputs.append(self._decode_grid(it))
            else:
                inputs.append(self._decode_item_obus(it, color.width, color.height))
        out = Image(base_img.width, base_img.height, depth, base_img.yuv_format)
        out.copy_no_pixels(base_img)
        out.depth = depth
        out.allocate_planes("yuv")
        st.apply_expression(out, expression, inputs, planes="yuv")
        return out

    def _decode_gain_map(self, tmap: Item, color: Item, img: Image) -> None:
        """Decode the gain map input item + tmap metadata onto img.gain_map
        (reference: read.c:5766-5990 gain-map plumbing)."""
        from ..hdr.gainmap import parse_tmap
        from ..image import GainMap

        meta = self._container.meta
        dimg = tmap.refs.get("dimg", [])
        if len(dimg) != 2:
            raise AvifError(Result.INVALID_TONE_MAPPED_IMAGE, "tmap needs 2 inputs")
        gm_item = meta.items.get(dimg[1])
        if gm_item is None:
            raise AvifError(Result.INVALID_TONE_MAPPED_IMAGE, "missing gain map item")
        gm = GainMap()
        try:
            gm.metadata = parse_tmap(self._item_payload(tmap))
        except AvifError as e:
            if e.result == Result.NOT_IMPLEMENTED:
                # unsupported tmap version/minimum_version: ignore the gain
                # map, keep the base image (reference read.c:5794-5799)
                return
            raise
        if gm_item.item_type == "grid":
            gm.image = self._decode_grid(gm_item)
        else:
            gm.image = self._decode_item_obus(gm_item)
        self._harvest_item_metadata(gm_item, gm.image)
        # alt rendition CICP/clli from the tmap item's properties
        for p in tmap.properties:
            if p.fourcc == "colr" and p.value.has_nclx:
                gm.alt_color_primaries = p.value.color_primaries
                gm.alt_transfer_characteristics = p.value.transfer_characteristics
                gm.alt_matrix_coefficients = p.value.matrix_coefficients
                gm.alt_yuv_range = p.value.yuv_range
            elif p.fourcc == "colr" and p.value.icc:
                gm.alt_icc = p.value.icc
            elif p.fourcc == "clli":
                gm.alt_clli = p.value
        img.gain_map = gm

    def _attach_alpha(self, img: Image, alpha_img: Image, premultiplied: bool) -> None:
        if (alpha_img.width, alpha_img.height) != (img.width, img.height):
            raise AvifError(Result.COLOR_ALPHA_SIZE_MISMATCH, "alpha size mismatch")
        plane = alpha_img.yuv_planes[0]
        if alpha_img.depth != img.depth:
            # Rescale alpha to the output depth (needed when the color path
            # was bit-depth-extended via sato but alpha was not).
            amax = (1 << alpha_img.depth) - 1
            omax = (1 << img.depth) - 1
            plane = (
                (plane.astype(np.int64) * omax + amax // 2) // amax
            ).astype(img.dtype)
            alpha_img = alpha_img.copy("none")
            alpha_img.depth = img.depth
            alpha_img.yuv_planes[0] = plane
        # Limited→full alpha fixup (reference: avifImageLimitedToFullAlpha,
        # read.c:6676): alpha samples must cover the full range.
        if alpha_img.yuv_range == Range.LIMITED:
            maxv = (1 << img.depth) - 1
            lo, hi = 16 << (img.depth - 8), 235 << (img.depth - 8)
            p = plane.astype(np.int32)
            p = np.clip((p - lo) * maxv // max(hi - lo, 1), 0, maxv)
            plane = p.astype(alpha_img.dtype)
        img.alpha_plane = plane
        img.alpha_premultiplied = premultiplied

    def next_image(self) -> bool:
        """Advance to the next frame; returns False past the end
        (reference: avifDecoderNextImage, read.c:6972)."""
        if self._container is None:
            raise AvifError(Result.NO_CONTENT, "parse() not called")
        nxt = self.image_index + 1
        if nxt >= self.image_count:
            return False

        def _item_size(it):
            if it is None:
                return 0
            total = it.size or sum(e.size for e in it.extents)
            if it.item_type == "grid":
                total += sum(
                    c.size or sum(e.size for e in c.extents)
                    for c in self._container.meta.items.values()
                    if c.dimg_for_id == it.id
                )
            return total

        if not self._use_tracks:
            self.io_stats.color_obu_size = _item_size(self._color_item)
            self.io_stats.alpha_obu_size = _item_size(self._alpha_item)
        if self._use_tracks:
            img = self._decode_track_sample(self._color_track, nxt)
            if self._alpha_track is not None:
                aimg = self._decode_track_sample(self._alpha_track, nxt)
                self._attach_alpha(img, aimg, premultiplied=False)
        else:
            item = self._color_item
            if item.item_type == "grid":
                img = self._decode_grid(item)
            else:
                img = self._decode_item_obus(item, item.width, item.height)
            self._validate_ispe(item, img)
            if self._sato_item is not None:
                img = self._apply_sample_transform(self._sato_item, item, img)
            if self._tmap_item is not None and self.decode_gain_map:
                self._decode_gain_map(self._tmap_item, item, img)
            if self._alpha_item is not None:
                if self._alpha_item.item_type == "grid":
                    aimg = self._decode_grid(self._alpha_item)
                else:
                    aimg = self._decode_item_obus(self._alpha_item)
                self._attach_alpha(
                    img, aimg, premultiplied=self._alpha_item.prem_by_id == item.id
                )
            self._harvest_item_metadata(item, img)
        self.image = img
        self.image_index = nxt
        return True

    def _validate_ispe(self, item: Item, img: Image) -> None:
        if not item.width:
            if self.strict_flags:
                raise AvifError(Result.BMFF_PARSE_FAILED, "[Strict] missing ispe")
            return
        if (item.width, item.height) != (img.width, img.height):
            # Container wins over the bitstream (read.c:5316-5349).
            if self.strict_flags and (
                img.width < item.width or img.height < item.height
            ):
                raise AvifError(
                    Result.BMFF_PARSE_FAILED,
                    f"[Strict] ispe {item.width}x{item.height} vs "
                    f"decoded {img.width}x{img.height}",
                )

    def _decode_track_sample(self, track, index: int) -> Image:
        st = track.sample_table
        ranges = st.sample_ranges()
        off, size = ranges[index]
        stream = self._track_streams.get(track.id)
        if stream is None:
            from ..codec.av1.stream import StreamDecoder

            stream = self._track_streams[track.id] = StreamDecoder()
        return decode_frame(self._io.read_exact(off, size), stream=stream)

    def decoded_row_count(self) -> int:
        """Rows of the current frame exposed so far (reference:
        avifDecoderDecodedRowCount, read.c:7213; grid math read.c:7189)."""
        if self.image is None:
            return 0
        if self._grid_shape is None:
            return self.image.height if self.image_index >= 0 else 0
        rows, cols, cell_h, out_h = self._grid_shape
        full_rows = self._decoded_cell_count // cols
        if full_rows >= rows:
            return out_h
        return min(full_rows * cell_h, out_h)

    def nth_image(self, index: int) -> Image:
        """Random access (reference: avifDecoderNthImage, read.c:7100).
        Foreign tracks may contain inter frames, so a seek restarts at the
        nearest preceding keyframe and decodes forward; our own (all-intra)
        samples resolve in one step."""
        if self._container is None:
            raise AvifError(Result.NO_CONTENT, "parse() not called")
        if index >= self.image_count:
            raise AvifError(Result.NO_IMAGES_REMAINING, f"index {index}")
        start = index
        if self._use_tracks and index != self.image_index + 1:
            start = self.nearest_keyframe(index)
            if start <= self.image_index < index:
                start = self.image_index + 1  # already mid-GOP, keep rolling
            else:
                self._track_streams = {}
        self.image_index = start - 1
        while self.image_index < index:
            if not self.next_image():
                raise AvifError(Result.NO_IMAGES_REMAINING, f"index {index}")
        return self.image

    def nth_image_timing(self, index: int):
        """(pts, duration) in timescales for frame `index`
        (reference: avifDecoderNthImageTiming)."""
        if self._use_tracks and self._color_track.sample_table is not None:
            st = self._color_track.sample_table
            if index >= self.image_count:
                raise AvifError(Result.NO_IMAGES_REMAINING, f"index {index}")
            pts = sum(st.image_delta(i) for i in range(index))
            return pts, st.image_delta(index)
        if index >= self.image_count:
            raise AvifError(Result.NO_IMAGES_REMAINING, f"index {index}")
        return 0, self.duration_in_timescales or 1

    def nth_image_max_extent(self, index: int):
        """(offset, size) byte range needed to decode frame `index`, for
        prefetching (reference: avifDecoderNthImageMaxExtent, read.c:5169)."""
        if self._container is None:
            raise AvifError(Result.NO_CONTENT, "parse() not called")
        if index >= self.image_count:
            raise AvifError(Result.NO_IMAGES_REMAINING, f"index {index}")
        ranges = []
        if self._use_tracks:
            st = self._color_track.sample_table
            ranges.append(st.sample_ranges()[index])
            if self._alpha_track is not None:
                ranges.append(self._alpha_track.sample_table.sample_ranges()[index])
        else:
            meta = self._container.meta

            def add_item(item):
                if item is None:
                    return
                for e in item.extents:
                    if not item.idat:
                        ranges.append((e.offset, e.size))
                if item.item_type == "grid":
                    for c in meta.items.values():
                        if c.dimg_for_id == item.id:
                            add_item(c)

            add_item(self._color_item)
            add_item(self._alpha_item)
            if self._tmap_item is not None and self.decode_gain_map:
                add_item(self._tmap_item)
                dimg = self._tmap_item.refs.get("dimg", [])
                if len(dimg) == 2:
                    add_item(meta.items.get(dimg[1]))
            if self._sato_item is not None:
                for iid in self._sato_item.refs.get("dimg", []):
                    add_item(meta.items.get(iid))
        if not ranges:
            return 0, 0
        start = min(o for o, _ in ranges)
        end = max(o + s for o, s in ranges)
        return start, end - start

    def read_all(self) -> list[Image]:
        """Decode every frame of an animation in one pipelined batch
        (decode-side mirror of encode_batch; codec.frame
        decode_frames_pipelined). Falls back to the sequential path for
        item-based files."""
        if self._container is None:
            raise AvifError(Result.NO_CONTENT, "parse() not called")
        if not self._use_tracks:
            out = []
            self.image_index = -1
            while self.next_image():
                out.append(self.image)
            return out
        from ..codec.frame import decode_frames_pipelined

        st = self._color_track.sample_table
        streams = [
            self._io.read_exact(off, size) for off, size in st.sample_ranges()
        ]
        frames = decode_frames_pipelined(streams)
        if self._alpha_track is not None:
            ast = self._alpha_track.sample_table
            astreams = [
                self._io.read_exact(off, size) for off, size in ast.sample_ranges()
            ]
            alphas = decode_frames_pipelined(astreams)
            for img, a in zip(frames, alphas):
                self._attach_alpha(img, a, premultiplied=False)
        if frames:
            self.image = frames[-1]
            self.image_index = len(frames) - 1
        return frames

    def read(self, data: bytes) -> Image:
        """One-shot decode (reference: avifDecoderRead, read.c:7248)."""
        self.parse(data)
        if not self.next_image():
            raise AvifError(Result.NO_IMAGES_REMAINING, "no frames")
        return self.image

    # Keyframe queries (read.c:7153-7186): all frames are sync samples for
    # the intra codec, but honor the recorded sample table for foreign files.
    def is_keyframe(self, index: int) -> bool:
        if self._use_tracks and self._color_track.sample_table:
            return self._color_track.sample_table.is_sync_sample(index)
        return True

    def nearest_keyframe(self, index: int) -> int:
        while index > 0 and not self.is_keyframe(index):
            index -= 1
        return index


def _shift_x(fmt: PixelFormat) -> int:
    from ..constants import pixel_format_info

    return pixel_format_info(fmt).chroma_shift_x


def _shift_y(fmt: PixelFormat) -> int:
    from ..constants import pixel_format_info

    return pixel_format_info(fmt).chroma_shift_y


def decode(data: bytes) -> Image:
    """Convenience one-liner (reference: avifDecoderReadMemory)."""
    return Decoder().read(data)
