"""Intra predictors, batched over blocks.

Mode numbering follows AV1 (spec §6.10.18): DC=0, V=1, H=2, D45..D67=3..8
(directional, later round), SMOOTH=9, SMOOTH_V=10, SMOOTH_H=11, PAETH=12.

All predictors are vectorized over a batch of blocks: inputs are the
reconstructed neighbor row above (``top``: (B, N)), the neighbor column to
the left (``left``: (B, N)) and the corner pixel (``topleft``: (B,)).
Neighbor synthesis for unavailable edges happens in ``prepare_neighbors`` so
encoder and decoder share identical semantics.

The smooth-prediction weight table is a generated profile asset (quadratic
fade, same shape as the spec's sm_weights) kept swappable for a
spec-extracted table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DC_PRED = 0
V_PRED = 1
H_PRED = 2
SMOOTH_PRED = 9
SMOOTH_V_PRED = 10
SMOOTH_H_PRED = 11
PAETH_PRED = 12

# Round-1 mode set (subset of the 13 AV1 intra modes; directional later).
MODE_SET = (DC_PRED, V_PRED, H_PRED, SMOOTH_PRED, SMOOTH_V_PRED, SMOOTH_H_PRED, PAETH_PRED)
N_MODES = len(MODE_SET)
MODE_TO_INDEX = {m: i for i, m in enumerate(MODE_SET)}


def smooth_weights(n: int) -> np.ndarray:
    """Quadratic fade 255 -> 32 (profile asset; same role as spec sm_weights)."""
    i = np.arange(n, dtype=np.float64)
    t = i / max(n - 1, 1)
    w = 32 + (255 - 32) * (1.0 - t) ** 2
    return np.round(w).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("n", "mid"))
def prepare_neighbors(top, left, topleft, have_top, have_left, n: int, mid: int):
    """Synthesize unavailable neighbors (shared encoder/decoder semantics).

    have_top/have_left: (B,) bool. Missing top -> replicate left[0] (or mid);
    missing left -> replicate top[0] (or mid); missing corner -> blend.
    """
    have_top = have_top[:, None]
    have_left = have_left[:, None]
    mid_v = jnp.full_like(top, mid)
    top_fill = jnp.where(have_left, left[:, :1], mid_v[:, :1])
    left_fill = jnp.where(have_top, top[:, :1], mid_v[:, :1])
    top = jnp.where(have_top, top, jnp.broadcast_to(top_fill, top.shape))
    left = jnp.where(have_left, left, jnp.broadcast_to(left_fill, left.shape))
    topleft = jnp.where(
        (have_top & have_left)[:, 0],
        topleft,
        jnp.where(have_top[:, 0], top[:, 0], jnp.where(have_left[:, 0], left[:, 0], mid)),
    )
    return top, left, topleft


@functools.partial(jax.jit, static_argnames=("n",))
def predict_all_modes(top, left, topleft, n: int):
    """All round-1 modes at once: returns (B, N_MODES, n, n) int32.

    Used by the encoder's exhaustive parallel mode search (the TPU replaces
    libaom's pruned search with brute force, SURVEY §7 hard-parts #4).
    """
    preds = [
        dc_pred(top, left, n),
        v_pred(top, n),
        h_pred(left, n),
        smooth_pred(top, left, n),
        smooth_v_pred(top, left, n),
        smooth_h_pred(top, left, n),
        paeth_pred(top, left, topleft, n),
    ]
    return jnp.stack(preds, axis=1)


@functools.partial(jax.jit, static_argnames=("n", "mode"))
def predict_mode(top, left, topleft, n: int, mode: int):
    """Single-mode prediction: (B, n, n) int32."""
    if mode == DC_PRED:
        return dc_pred(top, left, n)
    if mode == V_PRED:
        return v_pred(top, n)
    if mode == H_PRED:
        return h_pred(left, n)
    if mode == SMOOTH_PRED:
        return smooth_pred(top, left, n)
    if mode == SMOOTH_V_PRED:
        return smooth_v_pred(top, left, n)
    if mode == SMOOTH_H_PRED:
        return smooth_h_pred(top, left, n)
    if mode == PAETH_PRED:
        return paeth_pred(top, left, topleft, n)
    raise ValueError(f"mode {mode}")


def dc_pred(top, left, n: int):
    """(sum(top)+sum(left)+n) >> (log2(n)+1) — AV1 DC for square blocks."""
    s = jnp.sum(top.astype(jnp.int32), axis=1) + jnp.sum(left.astype(jnp.int32), axis=1)
    shift = int(np.log2(n)) + 1
    dc = (s + n) >> shift
    return jnp.broadcast_to(dc[:, None, None], (top.shape[0], n, n)).astype(jnp.int32)


def v_pred(top, n: int):
    return jnp.broadcast_to(top[:, None, :], (top.shape[0], n, n)).astype(jnp.int32)


def h_pred(left, n: int):
    return jnp.broadcast_to(left[:, :, None], (left.shape[0], n, n)).astype(jnp.int32)


def paeth_pred(top, left, topleft, n: int):
    t = top[:, None, :].astype(jnp.int32)  # (B,1,N)
    l = left[:, :, None].astype(jnp.int32)  # (B,N,1)
    tl = topleft[:, None, None].astype(jnp.int32)
    base = t + l - tl
    pt = jnp.abs(base - t)
    pl = jnp.abs(base - l)
    ptl = jnp.abs(base - tl)
    take_l = (pl <= pt) & (pl <= ptl)
    take_t = (pt <= ptl)
    b = jnp.broadcast_to
    shape = (top.shape[0], n, n)
    return jnp.where(take_l, b(l, shape), jnp.where(take_t, b(t, shape), b(tl, shape)))


def _smooth_core(top, left, n: int, vertical: bool, horizontal: bool):
    B = top.shape[0]
    w = jnp.asarray(smooth_weights(n), dtype=jnp.int32)
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)
    bottom_left = l[:, -1]  # (B,)
    top_right = t[:, -1]
    acc = jnp.zeros((B, n, n), dtype=jnp.int32)
    count = 0
    if vertical:
        wv = w[None, :, None]  # weight by row
        acc = acc + wv * t[:, None, :] + (256 - wv) * bottom_left[:, None, None]
        count += 1
    if horizontal:
        wh = w[None, None, :]  # weight by col
        acc = acc + wh * l[:, :, None] + (256 - wh) * top_right[:, None, None]
        count += 1
    return (acc + (128 * count)) >> (8 + (count - 1))


def smooth_pred(top, left, n: int):
    return _smooth_core(top, left, n, True, True)


def smooth_v_pred(top, left, n: int):
    return _smooth_core(top, left, n, True, False)


def smooth_h_pred(top, left, n: int):
    return _smooth_core(top, left, n, False, True)
