"""Quantization / dequantization.

Semantics mirror the reference chain: avifQuality -> quantizer
(avif.h:1549-1562, write.c:1210) -> qindex -> per-coefficient step size.

The step-size curve is this codec's own table asset (generated, exponential
like AV1's dc/ac lookups: ~2x every 24 qindex steps), stored as an explicit
table so a spec-extracted table can be swapped in without touching code.
qindex 0 means lossless (WHT path, no quantization), matching AV1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

QINDEX_RANGE = 256


def _make_q_table() -> np.ndarray:
    """Monotone step sizes, q[1]=4 (finest) to q[255]≈6400 (coarsest)."""
    q = np.arange(QINDEX_RANGE, dtype=np.float64)
    steps = 4.0 * np.power(2.0, (q - 1.0) / 24.0)
    steps = np.round(steps).astype(np.int32)
    steps[0] = 1  # lossless marker; unused by the quant path
    return np.maximum(steps, 1)


AC_QLOOKUP = _make_q_table()
DC_QLOOKUP = np.maximum((AC_QLOOKUP * 7 + 4) // 8, 1).astype(np.int32)  # DC slightly finer


def quality_to_qindex(quality: int) -> int:
    """quality 0..100 -> qindex, calibrated so a given ``quality`` lands at
    a bitrate comparable to libavif/libaom at the same setting (measured
    anchors vs Pillow->libaom on mixed gradient+noise content; our step
    table spans a different range than AV1's, so the reference's linear
    qp*4 scaling (codec_aom.c:643-654) would come out ~18x finer at q75).

    Piecewise-linear anchors: q100 -> 0 (lossless, like the reference),
    q85 -> 120, q75 -> 150, q0 -> 252."""
    quality = max(0, min(100, quality))
    if quality == 100:
        return 0  # lossless
    if quality >= 85:
        return max(1, (100 - quality) * 8)
    if quality >= 75:
        return 120 + (85 - quality) * 3
    return min(252, 150 + ((75 - quality) * 102 + 37) // 75)


@functools.partial(jax.jit, static_argnames=("dc_step", "ac_step"))
def quantize(coeffs: jnp.ndarray, dc_step: int, ac_step: int) -> jnp.ndarray:
    """Uniform deadzone-free quantization: q = round(c / step), sign-exact.

    (B, N, N) int32 -> int32 levels. DC is element [0, 0] of each block.
    """
    c = coeffs.astype(jnp.int32)
    n = c.shape[-1]
    steps = jnp.full((n, n), ac_step, dtype=jnp.int32).at[0, 0].set(dc_step)
    # round-half-away-from-zero in integers: (|c| + step/2) // step
    mag = (jnp.abs(c) + steps // 2) // steps
    return jnp.sign(c) * mag


@functools.partial(jax.jit, static_argnames=("dc_step", "ac_step"))
def dequantize(levels: jnp.ndarray, dc_step: int, ac_step: int) -> jnp.ndarray:
    q = levels.astype(jnp.int32)
    n = q.shape[-1]
    steps = jnp.full((n, n), ac_step, dtype=jnp.int32).at[0, 0].set(dc_step)
    return q * steps


def step_sizes(qindex: int, depth: int = 8) -> tuple[int, int]:
    """(dc_step, ac_step) for a qindex; higher depths scale the step to keep
    perceptual quality aligned (AV1 uses per-depth lookup tables)."""
    shift = depth - 8
    dc = int(DC_QLOOKUP[qindex]) << shift
    ac = int(AC_QLOOKUP[qindex]) << shift
    return max(dc, 1), max(ac, 1)
