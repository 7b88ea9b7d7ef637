"""to_rgba / from_rgba — the ToRGBA/FromRGBA stage equivalents.

The reference's ToRGBA/FromRGBA (io.ts:26-179) pair a format kernel
with Loader/Saver colour constants and per-plane buffers.  Here the
composition is purely functional: ``to_rgba`` maps packed plane arrays
to a linear (4, H, W) RGBA frame; ``from_rgba`` maps a frame back to
packed planes.  Both are designed to live inside a larger jitted
program so XLA fuses unpack, colour math and pack into one pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from .coeffs import Loader, Saver
from .colorspace import rgb_gamut, rgba_to_ycbcr, ycbcr_to_rgba
from .quant import u8_sat_rte

__all__ = ["to_rgba", "from_rgba", "interleave_rgba_fields"]


def to_rgba(fmt, planes, loader: Loader, width: int, height: int) -> jnp.ndarray:
    """Packed planes -> linear RGBA (4, H, W) float32."""
    if fmt.INFO.is_rgb:
        codes = fmt.unpack_rgba_codes(planes, width, height)  # (4,H,W) 0..255
        # index = rte(c * 65535 / 255) == c * 257 exactly (rgba8.ts:53-61)
        decoded = loader.gamma.at(codes * 257)
        rgba = rgb_gamut(decoded, loader.gamut_matrix)
        return rgba.astype(jnp.float32)
    y, cb, cr = fmt.unpack_codes(planes, width, height)
    return ycbcr_to_rgba(
        y, cb, cr, loader.col_matrix, loader.gamma.of, loader.gamut_matrix
    )


def from_rgba(
    fmt,
    rgba: jnp.ndarray,
    saver: Saver,
    width: int,
    height: int,
) -> list[jnp.ndarray]:
    """Linear RGBA (4, H, W) -> packed planes (progressive)."""
    if fmt.INFO.is_rgb:
        gamma = saver.gamma.of(rgba[:3])
        codes = u8_sat_rte(gamma * 255.0)
        alpha = jnp.full_like(codes[0], 255)  # write forces A=255 (rgba8.ts:97)
        return fmt.pack_rgba_codes(
            jnp.concatenate([codes, alpha[None]], axis=0), width, height
        )
    y, cb, cr = rgba_to_ycbcr(rgba, saver.col_matrix, saver.gamma.of)
    return fmt.pack_codes(y, cb, cr, width, height)


def interleave_rgba_fields(top: jnp.ndarray, bottom: jnp.ndarray) -> jnp.ndarray:
    """Merge two full-height field frames into one interlaced frame:
    even lines from ``top``, odd lines from ``bottom``.

    Functional equivalent of the reference consumer's two write passes
    with TopField/BottomField line addressing (macadamConsumer.ts:224-244,
    v210.ts:126-129).  Note: for 4:2:0 outputs the chroma of the merged
    frame comes from even (top-field) lines, where the reference's
    second pass would leave bottom-field chroma; 4:2:0 interlaced output
    is not used by any reference consumer.
    """
    sel = (jnp.arange(top.shape[-2]) % 2 == 0)[None, :, None]
    return jnp.where(sel, top, bottom)

