"""YCbCr <-> linear RGBA colour conversion stages.

These reproduce the fused convert stage of every reference read/write
kernel (e.g. v210.ts:65-78 read, v210.ts:145-156 write):

read:  integer Y/Cb/Cr codes -> 3x4 colour matrix -> gamma'->linear LUT
       -> 3x3 gamut matrix -> linear RGBA, alpha = 1
write: linear RGBA -> linear->gamma' LUT -> 3x4 matrix -> integer codes

Frames are planar (4, H, W) float32 RGBA.  Chroma is pre-upsampled to
full resolution by the format unpacker (nearest / sample-and-hold,
matching the reference's per-pixel-pair reuse, v210.ts:58-63).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp

from .quant import u16_sat_rte

__all__ = ["ycbcr_to_rgba", "rgba_to_ycbcr", "rgb_gamut", "GammaPair"]

# g2l / l2g: gamma-encoded [0,1] -> linear and back.  Provided by
# graph.coeffs as either a LUT gather or the analytic formula.
GammaFn = Callable[[jnp.ndarray], jnp.ndarray]


@dataclass(frozen=True)
class GammaPair:
    g2l: GammaFn
    l2g: GammaFn


def _assemble(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """(H, W) channel planes -> (4, H, W) via channel-index selection.

    Pure selection (bit-identical values to stacking), but elementwise —
    a jnp.stack lowers to an XLA concatenate that breaks fusion with the
    surrounding elementwise chain on TPU."""
    ch = jnp.arange(4, dtype=jnp.int32)[:, None, None]
    return jnp.where(
        ch == 0,
        r[None],
        jnp.where(ch == 1, g[None], jnp.where(ch == 2, b[None], a[None])),
    )


def ycbcr_to_rgba(
    y: jnp.ndarray,
    cb: jnp.ndarray,
    cr: jnp.ndarray,
    col_matrix: jnp.ndarray,  # (3, 4) f32: rows R', G', B' over (Y, U, V, 1)
    g2l: GammaFn,
    gamut_matrix: jnp.ndarray,  # (3, 3) f32 linear-light gamut conversion
) -> jnp.ndarray:
    """Integer code planes (H, W) -> linear RGBA (4, H, W)."""
    yf = y.astype(jnp.float32)
    uf = cb.astype(jnp.float32)
    vf = cr.astype(jnp.float32)
    m = col_matrix

    def channel(c: int) -> jnp.ndarray:
        gamma_val = m[c, 0] * yf + m[c, 1] * uf + m[c, 2] * vf + m[c, 3]
        return g2l(gamma_val)

    r, g, b = channel(0), channel(1), channel(2)
    gm = gamut_matrix
    out_r = gm[0, 0] * r + gm[0, 1] * g + gm[0, 2] * b
    out_g = gm[1, 0] * r + gm[1, 1] * g + gm[1, 2] * b
    out_b = gm[2, 0] * r + gm[2, 1] * g + gm[2, 2] * b
    alpha = jnp.ones_like(out_r)
    return _assemble(out_r, out_g, out_b, alpha)


def rgb_gamut(rgba: jnp.ndarray, gamut_matrix: jnp.ndarray) -> jnp.ndarray:
    """Apply a 3x3 linear gamut matrix to (4, H, W) RGBA, alpha untouched."""
    r, g, b, a = rgba[0], rgba[1], rgba[2], rgba[3]
    gm = gamut_matrix
    return _assemble(
        gm[0, 0] * r + gm[0, 1] * g + gm[0, 2] * b,
        gm[1, 0] * r + gm[1, 1] * g + gm[1, 2] * b,
        gm[2, 0] * r + gm[2, 1] * g + gm[2, 2] * b,
        a,
    )


def rgba_to_ycbcr(
    rgba: jnp.ndarray,  # (4, H, W) linear RGBA
    col_matrix: jnp.ndarray,  # (3, 4) f32: rows Y, U, V over (R', G', B', 1)
    l2g: GammaFn,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Linear RGBA -> full-resolution integer Y/Cb/Cr code planes (int32).

    Codes are rounded rte and saturated as the reference's
    convert_ushort_sat_rte does (v210.ts:153-155); the caller masks to
    its bit depth when packing.
    """
    rp = l2g(rgba[0])
    gp = l2g(rgba[1])
    bp = l2g(rgba[2])
    m = col_matrix

    def channel(c: int) -> jnp.ndarray:
        return u16_sat_rte(m[c, 0] * rp + m[c, 1] * gp + m[c, 2] * bp + m[c, 3])

    return channel(0), channel(1), channel(2)
