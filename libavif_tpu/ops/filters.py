"""In-loop reconstruction filters.

Role of AV1's loop filter / CDEF (the reference delegates these to the
codec; SURVEY.md §2.2 "CDEF + loop restoration" in the native-codec
charter). Design is this codec's own: intra prediction reads the
*unfiltered* reconstruction (AV1 semantics), and the deblocking filter is
a deterministic whole-frame pass applied identically by encoder-side
output and decoder — so it parallelizes perfectly on device (no wavefront
dependency).

Filter: at every transform-block boundary, a conditional 2-pixel smooth —
applied only where the step looks like a quantization artifact (local
gradients below a quantizer-derived threshold), never across real edges.
All arithmetic is int32; bit-exact across backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _filter_columns(plane, idx, thresh):
    """Filter vertical boundaries at columns `idx` (p1 p0 | q0 q1)."""
    p1 = plane[:, idx - 2]
    p0 = plane[:, idx - 1]
    q0 = plane[:, idx]
    q1 = plane[:, idx + 1]
    flat = (
        (jnp.abs(p0 - q0) < thresh)
        & (jnp.abs(p1 - p0) < (thresh >> 1) + 1)
        & (jnp.abs(q1 - q0) < (thresh >> 1) + 1)
    )
    p0f = (p1 + 3 * p0 + 3 * q0 + q1 + 4) >> 3
    q0f = (p1 + 3 * p0 + 3 * q0 + q1 + 4) >> 3
    p1f = (2 * p1 + p0 + q0 + 2) >> 2
    q1f = (p0 + q0 + 2 * q1 + 2) >> 2
    plane = plane.at[:, idx - 1].set(jnp.where(flat, p0f, p0))
    plane = plane.at[:, idx].set(jnp.where(flat, q0f, q0))
    plane = plane.at[:, idx - 2].set(jnp.where(flat, p1f, p1))
    plane = plane.at[:, idx + 1].set(jnp.where(flat, q1f, q1))
    return plane


@functools.partial(jax.jit, static_argnames=("n",))
def deblock_plane(plane, thresh, *, n: int):
    """Deblock an (H, W) int32 plane across n-aligned boundaries.

    thresh: int32 scalar, quantizer-derived (0 disables)."""
    h, w = plane.shape
    cols = jnp.arange(n, w - 1, n)
    rows = jnp.arange(n, h - 1, n)
    if cols.size:
        plane = _filter_columns(plane, cols, thresh)
    if rows.size:
        plane = _filter_columns(plane.T, rows, thresh).T
    return plane


def deblock_threshold(ac_step: int, depth: int) -> int:
    """Quantization-artifact threshold: about half the AC step in pixel
    units (transform gain 8), scaled to depth. 0 when steps are tiny."""
    t = (ac_step + 8) // 16
    if t <= 1:
        return 0
    return min(t, 16 << (depth - 8))


# ------------------------------------------------------------- CDEF stage


def _shift2(plane, dy: int, dx: int):
    """Shift with edge replication (static offsets)."""
    p = plane
    if dy:
        p = jnp.roll(p, dy, axis=0)
        if dy > 0:
            p = p.at[:dy, :].set(p[dy : dy + 1, :] * 0 + plane[0:1, :])
        else:
            p = p.at[dy:, :].set(plane[-1:, :])
    if dx:
        p = jnp.roll(p, dx, axis=1)
        if dx > 0:
            p = p.at[:, :dx].set(plane[:, 0:1])
        else:
            p = p.at[:, dx:].set(plane[:, -1:])
    return p


_CDEF_DIRS = ((0, 1), (1, 0), (1, 1), (1, -1))  # h, v, diag down-right, down-left


@functools.partial(jax.jit, static_argnames=())
def cdef_plane(plane, thresh):
    """Direction-adaptive constrained filter — the CDEF role.

    Per 8×8 block, the direction of least variation is estimated from the
    decoded pixels (so encoder and decoder agree with no signaling), and
    pixels are smoothed ALONG that direction with CDEF-style constrained
    deltas: corrections are clamped to ±thresh so real edges survive.
    Fully parallel whole-plane int32 op; thresh==0 disables.
    """
    h, w = plane.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 8) * 8
    p = plane
    if (hp, wp) != (h, w):
        p = jnp.pad(plane, ((0, hp - h), (0, wp - w)), mode="edge")

    energies = []
    filtered = []
    for dy, dx in _CDEF_DIRS:
        fwd = _shift2(p, dy, dx)
        bwd = _shift2(p, -dy, -dx)
        fwd2 = _shift2(p, 2 * dy, 2 * dx)
        bwd2 = _shift2(p, -2 * dy, -2 * dx)
        diff = jnp.abs(p - fwd)
        e = diff.reshape(hp // 8, 8, wp // 8, 8).sum(axis=(1, 3))  # (Hb, Wb)
        energies.append(e)
        c1 = jnp.clip(fwd - p, -thresh, thresh) + jnp.clip(bwd - p, -thresh, thresh)
        c2 = jnp.clip(fwd2 - p, -thresh, thresh) + jnp.clip(bwd2 - p, -thresh, thresh)
        filtered.append(p + ((4 * c1 + 2 * c2 + 8) >> 4))
    en = jnp.stack(energies)  # (4, Hb, Wb)
    best = jnp.argmin(en, axis=0)  # (Hb, Wb)
    best_px = jnp.repeat(jnp.repeat(best, 8, axis=0), 8, axis=1)  # (hp, wp)
    out = p
    for i, f in enumerate(filtered):
        out = jnp.where(best_px == i, f, out)
    out = jnp.where(thresh > 0, out, p)
    return out[:h, :w]


def cdef_threshold(ac_step: int, depth: int) -> int:
    """Constraint strength: about a quarter of the AC step in pixel units."""
    t = (ac_step + 16) // 32
    if t <= 1:
        return 0
    return min(t, 12 << (depth - 8))
