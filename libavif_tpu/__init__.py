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
