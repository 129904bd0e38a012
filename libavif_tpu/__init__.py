"""libavif_tpu — a TPU-native AVIF engine (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of AOMediaCodec/libavif,
designed TPU-first:

  - ISOBMFF/HEIF/MIAF container read/write on the host (pure Python + C++).
  - A native AV1 intra-frame codec: intra prediction, integer DCT/ADST
    transforms, quantization, and the multi-symbol range coder — with the
    FLOP-heavy stages as batched JAX/Pallas programs on TPU.
  - The full YUV<->RGB/alpha/gain-map pixel pipeline vectorized on device.
  - Grid cells and animation frames sharded over a `jax.sharding.Mesh`.

Public API mirrors the reference's surface: Image/RGBImage, Decoder/Encoder,
result codes, and the pixel-conversion entry points.
"""

import os as _os

# Platform override knob. In images whose sitecustomize pre-imports jax and
# force-sets jax_platforms to "axon,cpu", the `JAX_PLATFORMS` env var is
# ignored by jax's own config init; honoring it here (before any device use)
# makes the CLIs and library usable without claiming a TPU.
#   - LIBAVIF_TPU_PLATFORM always wins.
#   - JAX_PLATFORMS is applied only while the sitecustomize default
#     ("axon,cpu") is still in effect, so test harnesses that already called
#     jax.config.update() are never overridden.
try:
    import jax as _jax

    _plat = _os.environ.get("LIBAVIF_TPU_PLATFORM")
    if not _plat:
        _env = _os.environ.get("JAX_PLATFORMS")
        if _env and _env != "axon" and _jax.config.jax_platforms == "axon,cpu":
            _plat = _env
    if _plat and _jax.config.jax_platforms != _plat:
        _jax.config.update("jax_platforms", _plat)
    del _plat
except Exception:  # pragma: no cover - jax absent or already initialized
    pass

from .constants import (
    VERSION,
    AvifError,
    ChromaSamplePosition,
    ChromaDownsampling,
    ChromaUpsampling,
    ColorPrimaries,
    MatrixCoefficients,
    PixelFormat,
    Range,
    Result,
    RGBFormat,
    StrictFlags,
    TransferCharacteristics,
    TransformFlags,
    result_to_string,
)
from .image import (
    CleanApertureBox,
    CropRect,
    GainMap,
    GainMapMetadata,
    Image,
    ImageMirror,
    ImageRotation,
    PixelAspectRatioBox,
    RGBImage,
    clap_from_crop_rect,
    crop_rect_from_clap,
)

__version__ = VERSION

__all__ = [
    "VERSION",
    "AvifError",
    "ChromaSamplePosition",
    "ChromaDownsampling",
    "ChromaUpsampling",
    "ColorPrimaries",
    "MatrixCoefficients",
    "PixelFormat",
    "Range",
    "Result",
    "RGBFormat",
    "StrictFlags",
    "TransferCharacteristics",
    "TransformFlags",
    "result_to_string",
    "CleanApertureBox",
    "CropRect",
    "GainMap",
    "GainMapMetadata",
    "Image",
    "ImageMirror",
    "ImageRotation",
    "PixelAspectRatioBox",
    "RGBImage",
    "clap_from_crop_rect",
    "crop_rect_from_clap",
]
