"""Pallas TPU kernels for the codec's hot ops.

These are hand-scheduled variants of the XLA paths in ops/transforms.py /
ops/filters.py: the batched 2-D integer transform keeps each block tile
resident in VMEM across both 1-D passes (one HBM read + one write per
block instead of trusting XLA's fusion), with the kernel grid walking
batch tiles so DMA of tile k+1 overlaps compute of tile k (the standard
Pallas pipeline).

All arithmetic is int32 with the same round-half-up shifts as the XLA
path — outputs are bit-identical (tests enforce), so either path can
serve the bitstream. Select with env LIBAVIF_TPU_PALLAS=1 (transforms.py
consults `use_pallas()`), or call these directly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only helpers; the interpreter path works anywhere
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def use_pallas() -> bool:
    """Opt-in switch for routing the codec's transforms through Pallas.
    Compiled Pallas needs a real TPU backend; elsewhere the XLA path is
    used regardless of the flag (the interpreter path stays test-only)."""
    if os.environ.get("LIBAVIF_TPU_PALLAS", "0") != "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _round2_in_kernel(x, bit: int):
    if bit == 0:
        return x
    return (x + (1 << (bit - 1))) >> bit


def _mm_round2_kernel(shift: int, transpose_b: bool, k: int):
    """Kernel: out = round2(a @ b(ᵀ), shift) as K unrolled exact-int32
    multiply-accumulates on the VPU (Mosaic's tpu.matmul has no i32 path;
    the MXU is bf16/int8 — int32 exactness matters more than MXU here,
    and K is the tiny transform size)."""

    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[...]  # (tm, K) int32
        b = b_ref[...]  # (K, N) or (N, K) when transpose_b
        acc = None
        for j in range(k):
            col = a[:, j][:, None]  # (tm, 1)
            brow = (b[:, j] if transpose_b else b[j, :])[None, :]  # (1, N)
            term = col * brow
            acc = term if acc is None else acc + term
        out_ref[...] = _round2_in_kernel(acc, shift)

    return kernel


def _mm_round2(a, b, shift: int, *, transpose_b: bool, tile_m: int = 1024, interpret: bool = False):
    """round2(a @ b(ᵀ), shift) with a row-tiled Pallas grid: each grid step
    streams one (tile_m, K) slab of `a` into VMEM while the previous slab
    computes (automatic double-buffering)."""
    m, k = a.shape
    n = b.shape[1] if not transpose_b else b.shape[0]
    tm = min(tile_m, m)
    nm = -(-m // tm)
    padded = nm * tm
    if padded != m:
        a = jnp.pad(a, ((0, padded - m), (0, 0)))
    out = pl.pallas_call(
        _mm_round2_kernel(shift, transpose_b, k),
        out_shape=jax.ShapeDtypeStruct((padded, n), jnp.int32),
        grid=(nm,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0)),
            pl.BlockSpec(b.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0)),
        interpret=interpret,
    )(a, b)
    return out[:m]


@functools.partial(
    jax.jit, static_argnames=("shift1", "shift2", "interpret")
)
def transform_2d(blocks, col_k, row_k, *, shift1: int, shift2: int, interpret: bool = False):
    """Batched 2-D fixed-point transform on (B, n, n) int32 blocks:
    round2(ck @ x[b], shift1) then round2(t[b] @ rkᵀ, shift2) — the shared
    core of forward_transform/inverse_transform. The two 1-D passes are
    Pallas matmul kernels; XLA provides the cheap block relayout between
    them (column pass runs on the horizontally-stacked (n, B·n) layout,
    row pass on the vertically-stacked (B·n, n) layout)."""
    b, n, _ = blocks.shape
    x = blocks.astype(jnp.int32)
    # Column pass as right-multiplication: t[b]ᵀ = x[b]ᵀ @ ckᵀ, stacked
    # vertically so the Pallas grid tiles the big (B·n, n) operand.
    x1 = jnp.transpose(x, (0, 2, 1)).reshape(b * n, n)
    t1 = _mm_round2(x1, col_k, shift1, transpose_b=True, interpret=interpret)
    # Row pass: c[b] = t[b] @ rkᵀ on the untransposed stacking.
    tv = jnp.transpose(t1.reshape(b, n, n), (0, 2, 1)).reshape(b * n, n)
    cv = _mm_round2(tv, row_k, shift2, transpose_b=True, interpret=interpret)
    return cv.reshape(b, n, n)


def forward_transform_pallas(residual, tx_type: int, n: int, *, interpret: bool = False):
    """Drop-in for ops.transforms.forward_transform (non-WHT types)."""
    from . import transforms as T

    col_k, row_k = T._kernels(tx_type, n)
    return transform_2d(
        residual.astype(jnp.int32),
        jnp.asarray(col_k, jnp.int32),
        jnp.asarray(row_k, jnp.int32),
        shift1=T._COS_BIT - 2,
        shift2=T._COS_BIT - 1,
        interpret=interpret,
    )


def inverse_transform_pallas(coeffs, tx_type: int, n: int, *, interpret: bool = False):
    """Drop-in for ops.transforms.inverse_transform (non-WHT types)."""
    from . import transforms as T

    col_k, row_k = T._kernels(tx_type, n, inverse=True)
    # Inverse applies transposed kernels; fold the transpose into the
    # matrices so the kernel body stays a plain double matmul.
    ck = jnp.asarray(np.ascontiguousarray(col_k.T), jnp.int32)
    rk = jnp.asarray(np.ascontiguousarray(row_k.T), jnp.int32)
    return transform_2d(
        coeffs.astype(jnp.int32), ck, rk,
        shift1=T._COS_BIT, shift2=T._COS_BIT + 3, interpret=interpret,
    )
