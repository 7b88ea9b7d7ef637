"""Shared helpers for pixel-format modules."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

__all__ = [
    "FormatInfo",
    "Interlace",
    "upsample_422",
    "upsample_420",
    "even_pixels",
    "even_lines_even_pixels",
    "interleave_fields",
    "pad_axis1",
]


class Interlace:
    """Field addressing for write kernels (packer.ts:24-28)."""

    PROGRESSIVE = 0
    TOP_FIELD = 1
    BOTTOM_FIELD = 3


@dataclass(frozen=True)
class FormatInfo:
    """Static format description (mirrors PackImpl fields, packer.ts:30-52)."""

    name: str
    num_bits: int
    luma_black: int
    luma_white: int
    chroma_range: int
    is_rgb: bool
    # chroma subsampling factors (x, y); (1, 1) for RGB formats
    sub_x: int = 1
    sub_y: int = 1


def upsample_422(c: jnp.ndarray, width: int) -> jnp.ndarray:
    """Chroma (H, Wc) -> (H, W) by horizontal sample-and-hold.

    Matches the read kernels' per-pixel-pair chroma reuse
    (e.g. yuv422p10.ts:62-69).
    """
    return jnp.repeat(c, 2, axis=-1)[..., :width]


def upsample_420(c: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Chroma (H/2, Wc) -> (H, W): hold across the line pair and pixel pair
    (yuv420p.ts:62-99 processes a line pair per chroma row)."""
    c = jnp.repeat(c, 2, axis=-1)[..., :width]
    return jnp.repeat(c, 2, axis=-2)[..., :height, :]


def even_pixels(c: jnp.ndarray) -> jnp.ndarray:
    """4:2:2 chroma downsample: take chroma of even pixels (no filtering),
    as the write kernels do (yuv422p10.ts:169-170)."""
    return c[..., 0::2]


def even_lines_even_pixels(c: jnp.ndarray) -> jnp.ndarray:
    """4:2:0 chroma downsample: even lines, even pixels
    (yuv420p.ts:191-201, chroma written only for l==0 of each line pair)."""
    return c[..., 0::2, 0::2]


def interleave_fields(top: jnp.ndarray, bottom: jnp.ndarray) -> jnp.ndarray:
    """Interleave two field-line arrays (each (..., H/2, W)) into (..., H, W).

    Equivalent to the reference's two write passes into one output buffer
    with alternate-line addressing (v210.ts:126-129).
    """
    h2 = top.shape[-2]
    stacked = jnp.stack([top, bottom], axis=-2)  # (..., H/2, 2, W)
    return stacked.reshape(*top.shape[:-2], h2 * 2, top.shape[-1])


def pad_axis1(x: jnp.ndarray, target: int, value: int | float = 0) -> jnp.ndarray:
    """Pad the last axis up to ``target`` with a constant (pitch padding)."""
    pad = target - x.shape[-1]
    if pad <= 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths, constant_values=value)


def np_view_u16(buf: np.ndarray, rows: int, cols: int) -> np.ndarray:
    return buf.view(np.uint16).reshape(rows, cols)
