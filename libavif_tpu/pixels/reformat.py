"""YUV <-> RGB conversion — the device pixel pipeline.

Replaces src/reformat.c (1939 LoC), src/reformat_libyuv.c and
src/alpha.c's premultiply paths with a single vectorized JAX implementation:
no row-sliced threading (reformat.c:1611-1748), no SIMD dispatch tables —
one jitted program per (format, depth, range, matrix) configuration, fused
by XLA, batched over whole planes.

Numerics follow the reference's *built-in float path* (the ground truth per
avif.h:938-942): limited/full range scaling (reformat.c:1750-1838),
2x2 chroma averaging for 4:2:0 (reformat.c:410-470), bilinear chroma
upsampling with (9,3,3,1)/16 weights (avifImageYUVAnyToRGBAnySlow,
reformat.c:650), and round-half-away-from-zero (avifRoundf).

Identity (MC=0) and YCgCo-Re/Ro use exact integer lifting so lossless
round-trips are bit-exact.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    AvifError,
    ChromaUpsampling,
    MatrixCoefficients,
    PixelFormat,
    Range,
    Result,
)
from .colr import calc_yuv_coefficients


# ------------------------------------------------------------------ helpers


def _round_half_away(x):
    """avifRoundf semantics: round half away from zero (values here are >=0)."""
    return jnp.floor(x + 0.5)


def _limited_y_params(depth: int) -> tuple[float, float]:
    bias = 16 << (depth - 8)
    rng = 219 << (depth - 8)
    return float(bias), float(rng)


def _limited_uv_params(depth: int) -> tuple[float, float]:
    bias = 1 << (depth - 1)
    rng = 224 << (depth - 8)
    return float(bias), float(rng)


# --------------------------------------------------------------- upsampling


def _upsample_nearest(c: jnp.ndarray, out_h: int, out_w: int, sx: int, sy: int) -> jnp.ndarray:
    if sy:
        c = jnp.repeat(c, 2, axis=0)
    if sx:
        c = jnp.repeat(c, 2, axis=1)
    return c[:out_h, :out_w]


def _upsample_bilinear_axis(c: jnp.ndarray, axis: int) -> jnp.ndarray:
    """2x upsample along axis with centered (half-pel offset) weights 3/4,1/4.

    Matches reformat.c's slow-path triangle filter: output sample 2i uses
    (3*c[i] + c[i-1]) / 4, sample 2i+1 uses (3*c[i] + c[i+1]) / 4; edges
    clamp. Combined over two axes this yields the (9,3,3,1)/16 2x2 kernel.
    """
    lo = jnp.roll(c, 1, axis=axis)
    hi = jnp.roll(c, -1, axis=axis)
    # Edge clamping: fix the rolled borders.
    if axis == 0:
        lo = lo.at[0, :].set(c[0, :])
        hi = hi.at[-1, :].set(c[-1, :])
    else:
        lo = lo.at[:, 0].set(c[:, 0])
        hi = hi.at[:, -1].set(c[:, -1])
    even = (3.0 * c + lo) * 0.25
    odd = (3.0 * c + hi) * 0.25
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(c.shape)
    new_shape[axis] *= 2
    return stacked.reshape(new_shape)


def _upsample_bilinear(c: jnp.ndarray, out_h: int, out_w: int, sx: int, sy: int) -> jnp.ndarray:
    if sy:
        c = _upsample_bilinear_axis(c, axis=0)
    if sx:
        c = _upsample_bilinear_axis(c, axis=1)
    return c[:out_h, :out_w]


# ------------------------------------------------------------- downsampling


def _downsample_sharp(p: jnp.ndarray, sx: int, sy: int) -> jnp.ndarray:
    """Sharp chroma downsample: separable [1,3,3,1]/8 filter at the 2x
    decimation points — wider support than the 2-tap box, preserving
    chroma edges (our libsharpyuv-equivalent role, reformat_libsharpyuv.c;
    algorithm is original, not webp's iterative solver)."""

    def axis_sharp(x, axis):
        n = x.shape[axis]
        if n & 1:
            edge = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
            x = jnp.concatenate([x, edge], axis=axis)
            n += 1
        xm = jnp.moveaxis(x, axis, 0)
        left = jnp.concatenate([xm[:1], xm[:-1]], axis=0)
        right = jnp.concatenate([xm[1:], xm[-1:]], axis=0)
        f = (left + 3.0 * xm + 3.0 * right + jnp.concatenate([xm[2:], xm[-1:], xm[-1:]], axis=0)) / 8.0
        # decimate at even positions of the filtered signal
        out = f[0:n:2]
        return jnp.moveaxis(out, 0, axis)

    if sy:
        p = axis_sharp(p, 0)
    if sx:
        p = axis_sharp(p, 1)
    return p


def _downsample_average(p: jnp.ndarray, sx: int, sy: int) -> jnp.ndarray:
    """Chroma downsample by block averaging (reformat.c:410-470).

    Pads odd dimensions by edge replication, then averages 2x2 (420),
    1x2 (422) blocks.
    """
    h, w = p.shape
    if sy and (h & 1):
        p = jnp.concatenate([p, p[-1:, :]], axis=0)
    if sx and (w & 1):
        p = jnp.concatenate([p, p[:, -1:]], axis=1)
    h2, w2 = p.shape
    if sy and sx:
        p = p.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
    elif sx:
        p = p.reshape(h2, w2 // 2, 2).mean(axis=2)
    elif sy:
        p = p.reshape(h2 // 2, 2, w2).mean(axis=1)
    return p


# ------------------------------------------------------------------ core ops


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "rgb_depth", "yuv_range", "mc_mode", "kr", "kb",
        "sx", "sy", "bilinear", "out_h", "out_w", "has_chroma",
    ),
)
def _yuv_to_rgb_float(
    y: jnp.ndarray,
    u: Optional[jnp.ndarray],
    v: Optional[jnp.ndarray],
    *,
    depth: int,
    rgb_depth: int,
    yuv_range: int,
    mc_mode: str,
    kr: float,
    kb: float,
    sx: int,
    sy: int,
    bilinear: bool,
    out_h: int,
    out_w: int,
    has_chroma: bool,
) -> jnp.ndarray:
    """Float conversion core -> (H, W, 3) unorm of rgb_depth."""
    yf = y.astype(jnp.float32)
    if yuv_range == int(Range.LIMITED):
        y_bias, y_rng = _limited_y_params(depth)
        uv_rng = _limited_uv_params(depth)[1]
    else:
        y_bias, y_rng = 0.0, float((1 << depth) - 1)
        uv_rng = float((1 << depth) - 1)
    uv_bias = float(1 << (depth - 1))

    Y = (yf - y_bias) / y_rng
    if has_chroma:
        up = _upsample_bilinear if bilinear else _upsample_nearest
        uf = up(u.astype(jnp.float32), out_h, out_w, sx, sy)
        vf = up(v.astype(jnp.float32), out_h, out_w, sx, sy)
        Cb = (uf - uv_bias) / uv_rng
        Cr = (vf - uv_bias) / uv_rng
    else:
        Cb = jnp.zeros_like(Y)
        Cr = jnp.zeros_like(Y)

    if mc_mode == "ycgco":
        # Y already in [0,1]; Cg/Co centered (reformat.c:361-387).
        t = Y - Cb
        G = Y + Cb
        B = t - Cr
        R = t + Cr
    else:  # standard kr/kg/kb matrix
        kg = 1.0 - kr - kb
        R = Y + 2.0 * (1.0 - kr) * Cr
        B = Y + 2.0 * (1.0 - kb) * Cb
        G = Y - (2.0 * ((kr * (1.0 - kr) * Cr) + (kb * (1.0 - kb) * Cb))) / kg

    rgb_max = float((1 << rgb_depth) - 1)
    rgb = jnp.stack([R, G, B], axis=-1)
    rgb = jnp.clip(rgb, 0.0, 1.0) * rgb_max
    return _round_half_away(rgb).astype(jnp.uint16 if rgb_depth > 8 else jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "rgb_depth", "yuv_range", "mc_mode", "kr", "kb",
        "sx", "sy", "monochrome", "sharp_yuv",
    ),
)
def _rgb_to_yuv_float(
    rgb: jnp.ndarray,
    *,
    depth: int,
    rgb_depth: int,
    yuv_range: int,
    mc_mode: str,
    kr: float,
    kb: float,
    sx: int,
    sy: int,
    monochrome: bool,
    sharp_yuv: bool = False,
):
    """Float conversion core: (H, W, 3) -> (y, u, v) unorm planes."""
    rgb_max = float((1 << rgb_depth) - 1)
    Rf = rgb[..., 0].astype(jnp.float32) / rgb_max
    Gf = rgb[..., 1].astype(jnp.float32) / rgb_max
    Bf = rgb[..., 2].astype(jnp.float32) / rgb_max

    if mc_mode == "ycgco":
        Y = 0.5 * Gf + 0.25 * (Rf + Bf)
        Cg = 0.5 * Gf - 0.25 * (Rf + Bf)
        Co = 0.5 * (Rf - Bf)
        U, V = Cg, Co
    else:
        kg = 1.0 - kr - kb
        Y = kr * Rf + kg * Gf + kb * Bf
        U = (Bf - Y) / (2.0 * (1.0 - kb))
        V = (Rf - Y) / (2.0 * (1.0 - kr))

    if yuv_range == int(Range.LIMITED):
        y_bias, y_rng = _limited_y_params(depth)
        uv_rng = _limited_uv_params(depth)[1]
    else:
        y_bias, y_rng = 0.0, float((1 << depth) - 1)
        uv_rng = float((1 << depth) - 1)
    uv_bias = float(1 << (depth - 1))
    max_ch = float((1 << depth) - 1)

    dtype = jnp.uint16 if depth > 8 else jnp.uint8
    y_out = jnp.clip(_round_half_away(Y * y_rng + y_bias), 0, max_ch).astype(dtype)
    if monochrome:
        return y_out, None, None
    # Downsample chroma in float (best-quality AVERAGE mode, reformat.c:410;
    # sharp mode plays the libsharpyuv role).
    down = _downsample_sharp if sharp_yuv else _downsample_average
    Ud = down(U, sx, sy)
    Vd = down(V, sx, sy)
    u_out = jnp.clip(_round_half_away(Ud * uv_rng + uv_bias), 0, max_ch).astype(dtype)
    v_out = jnp.clip(_round_half_away(Vd * uv_rng + uv_bias), 0, max_ch).astype(dtype)
    return y_out, u_out, v_out


# -------------------------------------------------------- integer (lossless)


@functools.partial(jax.jit, static_argnames=("depth", "rgb_depth", "variant"))
def _identity_yuv_to_rgb(y, u, v, *, depth: int, rgb_depth: int, variant: str):
    """MC=0 identity GBR mapping, integer-exact (reformat.c identity rows)."""
    shift = rgb_depth - depth
    def conv(p):
        p = p.astype(jnp.int32)
        if shift > 0:
            p = p << shift
        elif shift < 0:
            p = p >> (-shift)
        return p
    G, B, R = conv(y), conv(u), conv(v)
    dtype = jnp.uint16 if rgb_depth > 8 else jnp.uint8
    return jnp.stack([R, G, B], axis=-1).astype(dtype)


@functools.partial(jax.jit, static_argnames=("depth", "rgb_depth"))
def _identity_rgb_to_yuv(rgb, *, depth: int, rgb_depth: int):
    shift = depth - rgb_depth
    def conv(p):
        p = p.astype(jnp.int32)
        if shift > 0:
            p = p << shift
        elif shift < 0:
            p = p >> (-shift)
        return p
    R = conv(rgb[..., 0])
    G = conv(rgb[..., 1])
    B = conv(rgb[..., 2])
    dtype = jnp.uint16 if depth > 8 else jnp.uint8
    return G.astype(dtype), B.astype(dtype), R.astype(dtype)


@functools.partial(jax.jit, static_argnames=("depth", "rgb_depth", "variant"))
def _ycgco_lifted_yuv_to_rgb(y, u, v, *, depth: int, rgb_depth: int, variant: str):
    """YCgCo-Re (depth = rgb_depth+2) / YCgCo-Ro (+1) exact integer lifting.

    H.273 v3 lifting inverse: t = Y - (Cg>>1); G = t + Cg; B = t - (Co>>1);
    R = B + Co.  (reformat.c:361-387 / avifimage YCGCO_RE handling)
    """
    offset = 1 << (depth - 1)
    Y = y.astype(jnp.int32)
    Cg = u.astype(jnp.int32) - offset
    Co = v.astype(jnp.int32) - offset
    t = Y - (Cg >> 1)
    G = t + Cg
    B = t - (Co >> 1)
    R = B + Co
    rgb_max = (1 << rgb_depth) - 1
    rgb = jnp.stack([R, G, B], axis=-1)
    rgb = jnp.clip(rgb, 0, rgb_max)
    return rgb.astype(jnp.uint16 if rgb_depth > 8 else jnp.uint8)


@functools.partial(jax.jit, static_argnames=("depth", "rgb_depth"))
def _ycgco_lifted_rgb_to_yuv(rgb, *, depth: int, rgb_depth: int):
    """Forward lifting: Co = R-B; t = B + (Co>>1); Cg = G-t; Y = t + (Cg>>1)."""
    R = rgb[..., 0].astype(jnp.int32)
    G = rgb[..., 1].astype(jnp.int32)
    B = rgb[..., 2].astype(jnp.int32)
    Co = R - B
    t = B + (Co >> 1)
    Cg = G - t
    Y = t + (Cg >> 1)
    offset = 1 << (depth - 1)
    dtype = jnp.uint16 if depth > 8 else jnp.uint8
    return (
        Y.astype(dtype),
        (Cg + offset).astype(dtype),
        (Co + offset).astype(dtype),
    )


# ---------------------------------------------------------------- alpha ops


@functools.partial(jax.jit, static_argnames=("max_value",))
def _premultiply(rgb_f: jnp.ndarray, alpha: jnp.ndarray, max_value: int):
    a = alpha.astype(jnp.float32) / float(max_value)
    out = rgb_f.astype(jnp.float32) * a[..., None]
    return _round_half_away(out).astype(rgb_f.dtype)


@functools.partial(jax.jit, static_argnames=("max_value",))
def _unpremultiply(rgb_f: jnp.ndarray, alpha: jnp.ndarray, max_value: int):
    a = alpha.astype(jnp.float32) / float(max_value)
    safe = jnp.where(a > 0, a, 1.0)
    out = rgb_f.astype(jnp.float32) / safe[..., None]
    out = jnp.clip(out, 0.0, float(max_value))
    out = jnp.where(a[..., None] > 0, out, 0.0)
    return _round_half_away(out).astype(rgb_f.dtype)


def premultiply_alpha(rgb: np.ndarray, alpha: np.ndarray, max_value: int) -> np.ndarray:
    """Reference: avifRGBImagePremultiplyAlpha (alpha.c:151)."""
    return np.asarray(_premultiply(rgb, alpha, max_value))


def unpremultiply_alpha(rgb: np.ndarray, alpha: np.ndarray, max_value: int) -> np.ndarray:
    """Reference: avifRGBImageUnpremultiplyAlpha (alpha.c:338)."""
    return np.asarray(_unpremultiply(rgb, alpha, max_value))


# ----------------------------------------------------------------- image API


def _mc_mode(mc: int) -> str:
    mc = int(mc)
    if mc == MatrixCoefficients.IDENTITY:
        return "identity"
    if mc == MatrixCoefficients.YCGCO:
        return "ycgco"
    if mc == MatrixCoefficients.YCGCO_RE:
        return "ycgco_re"
    if mc == MatrixCoefficients.YCGCO_RO:
        return "ycgco_ro"
    return "matrix"


def yuv_to_rgb_arrays(
    y: np.ndarray,
    u: Optional[np.ndarray],
    v: Optional[np.ndarray],
    *,
    depth: int,
    rgb_depth: int,
    yuv_format: PixelFormat,
    yuv_range: Range,
    matrix_coefficients: int,
    color_primaries: int = 2,
    chroma_upsampling: ChromaUpsampling = ChromaUpsampling.AUTOMATIC,
) -> np.ndarray:
    """Convert YUV planes to an (H, W, 3) RGB array.

    The main entry (reference: avifImageYUVToRGB, reformat.c:1649).
    """
    mode = _mc_mode(matrix_coefficients)
    out_h, out_w = y.shape
    from ..constants import pixel_format_info

    info = pixel_format_info(yuv_format)
    has_chroma = u is not None and v is not None and not info.monochrome

    if mode == "identity":
        if yuv_format != PixelFormat.YUV444 or not has_chroma:
            raise AvifError(Result.REFORMAT_FAILED, "identity requires 4:4:4")
        return np.asarray(
            _identity_yuv_to_rgb(y, u, v, depth=depth, rgb_depth=rgb_depth, variant="id")
        )
    if mode in ("ycgco_re", "ycgco_ro"):
        if yuv_format != PixelFormat.YUV444 or not has_chroma:
            raise AvifError(Result.REFORMAT_FAILED, "YCgCo-Re/Ro requires 4:4:4")
        return np.asarray(
            _ycgco_lifted_yuv_to_rgb(y, u, v, depth=depth, rgb_depth=rgb_depth, variant=mode)
        )

    kr, kg, kb = calc_yuv_coefficients(color_primaries, matrix_coefficients)
    bilinear = chroma_upsampling in (
        ChromaUpsampling.AUTOMATIC,
        ChromaUpsampling.BEST_QUALITY,
        ChromaUpsampling.BILINEAR,
    ) and (info.chroma_shift_x or info.chroma_shift_y)
    return np.asarray(
        _yuv_to_rgb_float(
            y,
            u if has_chroma else None,
            v if has_chroma else None,
            depth=depth,
            rgb_depth=rgb_depth,
            yuv_range=int(yuv_range),
            mc_mode=mode,
            kr=kr,
            kb=kb,
            sx=info.chroma_shift_x,
            sy=info.chroma_shift_y,
            bilinear=bool(bilinear),
            out_h=out_h,
            out_w=out_w,
            has_chroma=has_chroma,
        )
    )


def rgb_to_yuv_arrays(
    rgb: np.ndarray,
    *,
    depth: int,
    rgb_depth: int,
    yuv_format: PixelFormat,
    yuv_range: Range,
    matrix_coefficients: int,
    color_primaries: int = 2,
    sharp_yuv: bool = False,
):
    """Convert (H, W, 3) RGB -> YUV planes (reference: avifImageRGBToYUV,
    reformat.c:221; sharp_yuv plays the avifImageRGBToYUVLibSharpYUV role,
    reformat_libsharpyuv.c)."""
    mode = _mc_mode(matrix_coefficients)
    from ..constants import pixel_format_info

    info = pixel_format_info(yuv_format)

    if mode == "identity":
        if yuv_format != PixelFormat.YUV444:
            raise AvifError(Result.REFORMAT_FAILED, "identity requires 4:4:4")
        out = _identity_rgb_to_yuv(rgb, depth=depth, rgb_depth=rgb_depth)
        return tuple(np.asarray(p) for p in out)
    if mode in ("ycgco_re", "ycgco_ro"):
        if yuv_format != PixelFormat.YUV444:
            raise AvifError(Result.REFORMAT_FAILED, "YCgCo-Re/Ro requires 4:4:4")
        expected = rgb_depth + (2 if mode == "ycgco_re" else 1)
        if depth != expected:
            raise AvifError(
                Result.REFORMAT_FAILED,
                f"YCgCo-{mode[-2:]} needs yuv depth {expected} for rgb depth {rgb_depth}",
            )
        out = _ycgco_lifted_rgb_to_yuv(rgb, depth=depth, rgb_depth=rgb_depth)
        return tuple(np.asarray(p) for p in out)

    kr, kg, kb = calc_yuv_coefficients(color_primaries, matrix_coefficients)
    y, u, v = _rgb_to_yuv_float(
        rgb,
        depth=depth,
        rgb_depth=rgb_depth,
        yuv_range=int(yuv_range),
        mc_mode=mode,
        kr=kr,
        kb=kb,
        sx=info.chroma_shift_x,
        sy=info.chroma_shift_y,
        monochrome=info.monochrome,
        sharp_yuv=sharp_yuv,
    )
    return (
        np.asarray(y),
        None if u is None else np.asarray(u),
        None if v is None else np.asarray(v),
    )


def image_yuv_to_rgb(image, rgb) -> None:
    """High-level API: fill ``rgb.pixels`` from ``image`` (avif.h:1031)."""
    from ..constants import RGBFormat, rgb_format_has_alpha

    out = yuv_to_rgb_arrays(
        image.yuv_planes[0],
        image.yuv_planes[1],
        image.yuv_planes[2],
        depth=image.depth,
        rgb_depth=rgb.depth,
        yuv_format=image.yuv_format,
        yuv_range=image.yuv_range,
        matrix_coefficients=image.matrix_coefficients,
        color_primaries=image.color_primaries,
        chroma_upsampling=rgb.chroma_upsampling,
    )
    h, w, _ = out.shape
    n = rgb.channel_count
    pixels = np.zeros((h, w, n), dtype=out.dtype)
    order = {
        RGBFormat.RGB: [0, 1, 2],
        RGBFormat.RGBA: [0, 1, 2],
        RGBFormat.BGR: [2, 1, 0],
        RGBFormat.BGRA: [2, 1, 0],
        RGBFormat.ARGB: [0, 1, 2],
        RGBFormat.ABGR: [2, 1, 0],
    }.get(rgb.format, [0, 1, 2])
    alpha_first = rgb.format in (RGBFormat.ARGB, RGBFormat.ABGR)
    rgb_slice = slice(1, 4) if alpha_first and n == 4 else slice(0, 3)
    pixels[..., rgb_slice] = out[..., order]
    if rgb_format_has_alpha(rgb.format) and n >= 2:
        a_idx = 0 if alpha_first else n - 1
        if image.alpha_plane is not None:
            alpha = image.alpha_plane.astype(np.float32)
            scale = ((1 << rgb.depth) - 1) / ((1 << image.depth) - 1)
            pixels[..., a_idx] = np.floor(alpha * scale + 0.5).astype(out.dtype)
        else:
            pixels[..., a_idx] = (1 << rgb.depth) - 1
        # Premultiply state reconciliation (reference: reformat.c:1662-1677).
        if image.alpha_premultiplied and not rgb.alpha_premultiplied:
            pixels[..., rgb_slice] = unpremultiply_alpha(
                pixels[..., rgb_slice], pixels[..., a_idx], (1 << rgb.depth) - 1
            )
        elif not image.alpha_premultiplied and rgb.alpha_premultiplied:
            pixels[..., rgb_slice] = premultiply_alpha(
                pixels[..., rgb_slice], pixels[..., a_idx], (1 << rgb.depth) - 1
            )
    rgb.pixels = pixels


def image_rgb_to_yuv(rgb, image) -> None:
    """High-level API: fill ``image`` planes from ``rgb.pixels`` (avif.h:1032)."""
    from ..constants import ChromaDownsampling, RGBFormat, rgb_format_has_alpha

    px = rgb.pixels
    n = rgb.channel_count
    alpha_first = rgb.format in (RGBFormat.ARGB, RGBFormat.ABGR)
    rgb_slice = slice(1, 4) if alpha_first and n == 4 else slice(0, 3)
    chans = px[..., rgb_slice]
    if rgb.format in (RGBFormat.BGR, RGBFormat.BGRA, RGBFormat.ABGR):
        chans = chans[..., ::-1]
    alpha = None
    if rgb_format_has_alpha(rgb.format) and not rgb.ignore_alpha:
        a_idx = 0 if alpha_first else n - 1
        alpha = px[..., a_idx]
        if rgb.alpha_premultiplied and not image.alpha_premultiplied:
            chans = unpremultiply_alpha(chans, alpha, (1 << rgb.depth) - 1)

    y, u, v = rgb_to_yuv_arrays(
        np.ascontiguousarray(chans),
        depth=image.depth,
        rgb_depth=rgb.depth,
        yuv_format=image.yuv_format,
        yuv_range=image.yuv_range,
        matrix_coefficients=image.matrix_coefficients,
        color_primaries=image.color_primaries,
        sharp_yuv=getattr(rgb, "sharp_yuv", False)
        or rgb.chroma_downsampling == ChromaDownsampling.SHARP_YUV,
    )
    image.yuv_planes = [y, u, v]
    if alpha is not None:
        scale = ((1 << image.depth) - 1) / ((1 << rgb.depth) - 1)
        image.alpha_plane = np.floor(alpha.astype(np.float32) * scale + 0.5).astype(
            image.dtype
        )
