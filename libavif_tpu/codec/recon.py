"""Device-side codec core: wavefront reconstruction & encoder mode search.

TPU-first design
----------------
The sequential dependency of intra prediction (each block predicts from its
reconstructed top/left neighbors — SURVEY.md §7 hard-parts #3) is scheduled
as a **wavefront over anti-diagonals**: all blocks with the same r+c are
independent, so a `lax.scan` over diagonals processes up to `Rb` blocks per
step as one batched tensor op. Everything with no recon dependency — the
inverse transforms on decode, and nothing less than the *entire* per-mode
transform/quant/distortion pipeline on encode — runs as large batched int32
matmuls that XLA tiles onto the MXU.

The encoder replaces libaom's pruned mode search (codec_aom.c speed ladder)
with an exhaustive parallel search over the mode set: every mode's full
residual→transform→quant→dequant→inverse→distortion pipeline is evaluated
for every block in the diagonal at once (SURVEY.md §7 hard-parts #4 says
brute force is the right TPU call).

All arithmetic is int32 (bit-exact across backends); costs are integer so
mode decisions — hence the bitstream — are backend-deterministic.

Layout: a plane is padded to whole blocks (edge replication, host-side).
The recon buffer carries a 1-pixel halo on top/left initialized to the
mid-level value, which doubles as the "unavailable neighbor" synthesis rule
(our codec's convention; self-consistent between encoder and decoder).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.intra import N_MODES, predict_all_modes
from ..ops.transforms import DCT_DCT, WHT_WHT, forward_transform, inverse_transform


def pad_to_blocks(plane: np.ndarray, n: int) -> np.ndarray:
    """Pad (H, W) to whole n×n blocks with edge replication (host-side)."""
    h, w = plane.shape
    hp = -(-h // n) * n
    wp = -(-w // n) * n
    return np.pad(plane, ((0, hp - h), (0, wp - w)), mode="edge")


def _steps_mat(n: int, dc_step, ac_step):
    dc_mask = jnp.zeros((n, n), dtype=bool).at[0, 0].set(True)
    return jnp.where(dc_mask, dc_step, ac_step).astype(jnp.int32)


def _bitlength(a: jnp.ndarray, maxbits: int = 16) -> jnp.ndarray:
    """Integer bit length of |a| (exact, no float): sum of threshold tests."""
    bits = jnp.zeros_like(a)
    for k in range(maxbits):
        bits = bits + (a >= (1 << k)).astype(a.dtype)
    return bits


def _rate_bits(levels: jnp.ndarray) -> jnp.ndarray:
    """Integer rate proxy (bits) per block for the entropy layer: roughly
    3 + 2·bitlen per nonzero coefficient. Sums over the last two axes."""
    a = jnp.abs(levels)
    per = jnp.where(a > 0, 3 + 2 * _bitlength(a), 0)
    return jnp.sum(per, axis=(-1, -2))


def _gather_neighbors(recon, r, c, n: int):
    """Per-lane top row / left col / corner from the haloed recon buffer.

    Block (r, c) occupies recon[1+r*n : 1+(r+1)*n, 1+c*n : 1+(c+1)*n].
    """

    def one(ri, ci):
        top = jax.lax.dynamic_slice(recon, (ri * n, 1 + ci * n), (1, n))[0]
        left = jax.lax.dynamic_slice(recon, (1 + ri * n, ci * n), (n, 1))[:, 0]
        tl = jax.lax.dynamic_slice(recon, (ri * n, ci * n), (1, 1))[0, 0]
        return top, left, tl

    return jax.vmap(one)(r, c)


def _scatter_blocks(recon, vals, r, c, valid, n: int):
    """Scatter (L, n, n) blocks into the haloed recon; invalid lanes dropped."""
    ii = jnp.arange(n)
    shape = (r.shape[0], n, n)
    rows = jnp.broadcast_to(1 + r[:, None, None] * n + ii[None, :, None], shape)
    cols = jnp.broadcast_to(1 + c[:, None, None] * n + ii[None, None, :], shape)
    # Push invalid lanes out of bounds; mode="drop" discards them.
    rows = jnp.where(valid[:, None, None], rows, recon.shape[0] + 1)
    return recon.at[rows.reshape(-1), cols.reshape(-1)].set(
        vals.reshape(-1), mode="drop"
    )


# ------------------------------------------------------------------ decode


@functools.partial(jax.jit, static_argnames=("n", "depth", "lossless"))
def decode_plane(levels, modes, dc_step, ac_step, *, n: int, depth: int, lossless: bool):
    """Reconstruct a padded plane from entropy-decoded levels and modes.

    levels: (Rb, Cb, n, n) int32; modes: (Rb, Cb) int32 (index into
    intra.MODE_SET). Returns (Rb*n, Cb*n) int32 reconstruction.
    """
    rb, cb = modes.shape
    maxv = (1 << depth) - 1
    mid = 1 << (depth - 1)

    # Residual synthesis is recon-independent: one big batched MXU pass.
    flat = levels.reshape(-1, n, n)
    if lossless:
        residuals = inverse_transform(flat, WHT_WHT, n)
    else:
        deq = flat * _steps_mat(n, dc_step, ac_step)[None]
        # Hostile-stream guard: bound dequantized coefficients to the largest
        # magnitude a legitimate encode can produce (8·n·maxv transform gain),
        # so adversarial levels can't drive the inverse transform to wrap.
        cmax = 1 << (depth + 4 + n.bit_length())
        deq = jnp.clip(deq, -cmax, cmax)
        residuals = inverse_transform(deq, DCT_DCT, n)
    residuals = residuals.reshape(rb, cb, n, n)

    recon0 = jnp.full((rb * n + 1, cb * n + 1), mid, dtype=jnp.int32)
    lanes = jnp.arange(rb, dtype=jnp.int32)

    def step(recon, d):
        r = lanes
        c = d - lanes
        valid = (c >= 0) & (c < cb)
        cs = jnp.clip(c, 0, cb - 1)
        top, left, tl = _gather_neighbors(recon, r, cs, n)
        preds = predict_all_modes(top, left, tl, n)  # (L, M, n, n)
        mode = modes[r, cs]
        pred = jnp.take_along_axis(preds, mode[:, None, None, None], axis=1)[:, 0]
        block = jnp.clip(pred + residuals[r, cs], 0, maxv)
        return _scatter_blocks(recon, block, r, cs, valid, n), None

    recon, _ = jax.lax.scan(step, recon0, jnp.arange(rb + cb - 1, dtype=jnp.int32))
    return recon[1:, 1:]


# ------------------------------------------------------------------ encode


@functools.partial(jax.jit, static_argnames=("n", "depth", "lossless"))
def encode_plane(src, dc_step, ac_step, *, n: int, depth: int, lossless: bool):
    """Exhaustive-parallel mode search + quantization over a padded plane.

    src: (Rb*n, Cb*n) int32 (already padded). Returns (modes (Rb,Cb) int32,
    levels (Rb,Cb,n,n) int32, recon (Rb*n, Cb*n) int32).
    """
    hp, wp = src.shape
    rb, cb = hp // n, wp // n
    maxv = (1 << depth) - 1
    mid = 1 << (depth - 1)
    tx = WHT_WHT if lossless else DCT_DCT
    steps = _steps_mat(n, dc_step, ac_step)
    # Integer lambda for SSE (8-bit-scaled) + lam·bits cost. acs8 is the AC
    # step in 8-bit pixel units; transform gain is 2^3 over orthonormal, so
    # qstep_pix = acs8/8 and lambda ≈ 0.12·qstep_pix² = 15·acs8²/8000.
    dshift = depth - 8
    acs8 = ac_step >> dshift if dshift else ac_step
    lam = jnp.maximum(1, (acs8 * acs8 * 15) // 8000).astype(jnp.int32)

    src_blocks = src.reshape(rb, n, cb, n).transpose(0, 2, 1, 3)  # (Rb,Cb,n,n)

    recon0 = jnp.full((hp + 1, wp + 1), mid, dtype=jnp.int32)
    levels0 = jnp.zeros((rb, cb, n, n), dtype=jnp.int32)
    modes0 = jnp.zeros((rb, cb), dtype=jnp.int32)
    lanes = jnp.arange(rb, dtype=jnp.int32)

    def step(carry, d):
        recon, levels_out, modes_out = carry
        r = lanes
        c = d - lanes
        valid = (c >= 0) & (c < cb)
        cs = jnp.clip(c, 0, cb - 1)
        top, left, tl = _gather_neighbors(recon, r, cs, n)
        preds = predict_all_modes(top, left, tl, n)  # (L, M, n, n)
        sb = src_blocks[r, cs]  # (L, n, n)
        resid = sb[:, None] - preds  # (L, M, n, n)

        coeffs = forward_transform(resid.reshape(-1, n, n), tx, n)
        if lossless:
            lv = coeffs
            deq = lv
        else:
            mag = (jnp.abs(coeffs) + steps[None] // 2) // steps[None]
            lv = jnp.sign(coeffs) * mag
            deq = lv * steps[None]
        res_hat = inverse_transform(deq, tx, n).reshape(resid.shape)
        lv = lv.reshape(resid.shape)

        cand = jnp.clip(preds + res_hat, 0, maxv)  # (L, M, n, n)
        err = (sb[:, None] - cand) >> dshift if dshift else sb[:, None] - cand
        sse = jnp.sum(err * err, axis=(-1, -2))  # (L, M) int32-safe
        bits = _rate_bits(lv)  # (L, M)
        cost = sse + lam * bits
        best = jnp.argmin(cost, axis=1)  # (L,)

        sel = best[:, None, None, None]
        best_lv = jnp.take_along_axis(lv, sel, axis=1)[:, 0]
        best_rec = jnp.take_along_axis(cand, sel, axis=1)[:, 0]

        recon = _scatter_blocks(recon, best_rec, r, cs, valid, n)
        cd = jnp.where(valid, cs, cb)  # OOB column drops invalid lanes
        levels_out = levels_out.at[r, cd].set(best_lv, mode="drop")
        modes_out = modes_out.at[r, cd].set(best.astype(jnp.int32), mode="drop")
        return (recon, levels_out, modes_out), None

    (recon, levels, modes), _ = jax.lax.scan(
        step, (recon0, levels0, modes0), jnp.arange(rb + cb - 1, dtype=jnp.int32)
    )
    return modes, levels, recon[1:, 1:]


assert N_MODES == 7  # entropy layer alphabet size; bump both together
