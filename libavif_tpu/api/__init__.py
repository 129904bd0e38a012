"""Public API: Encoder / Decoder aggregates.

Mirrors the reference's three public aggregates (SURVEY.md §1 layer
contracts): avifImage (libavif_tpu.image.Image), avifEncoder
(api.encoder.Encoder, avif.h:1511-1625) and avifDecoder
(api.decoder.Decoder, avif.h:1253-1387).
"""

from .decoder import Decoder, decode  # noqa: F401
from .encoder import Encoder, encode, encode_batch  # noqa: F401
