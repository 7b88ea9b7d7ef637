"""Rounding / saturation primitives matching OpenCL convert_* semantics.

The reference kernels rely on specific OpenCL conversion modes for
bit-exactness (e.g. v210.ts:68-70 `convert_ushort_sat_rte`,
v210.ts:176-183 `convert_ushort_sat_rtz` + `round()`).  These helpers
reproduce them exactly on f32 inputs:

- ``_rte``: round to nearest, ties to even (jnp.rint semantics)
- ``_rtz``: truncate toward zero
- ``round()`` in OpenCL: round half away from zero
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "u16_sat_rte",
    "u16_sat_rtz",
    "u16_sat_round_half_away",
    "u10_sat_rte",
    "u8_sat_rte",
    "round_half_away",
]


def u16_sat_rte(x: jnp.ndarray) -> jnp.ndarray:
    """convert_ushort_sat_rte: round-to-nearest-even, clamp [0, 65535]."""
    return jnp.clip(jnp.rint(x), 0, 65535).astype(jnp.int32)


def u16_sat_rtz(x: jnp.ndarray) -> jnp.ndarray:
    """convert_ushort_sat_rtz: truncate toward zero, clamp [0, 65535]."""
    return jnp.clip(jnp.trunc(x), 0, 65535).astype(jnp.int32)


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """OpenCL round(): round half away from zero."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def u16_sat_round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """convert_ushort_sat(round(x)): used on remainder tails (v210.ts:181)."""
    return jnp.clip(round_half_away(x), 0, 65535).astype(jnp.int32)


def u10_sat_rte(x: jnp.ndarray) -> jnp.ndarray:
    """10-bit code from float: rte then clamp to the packing field width.

    The reference converts with ushort saturation and then shifts into
    10-bit fields (v210.ts:153-163); legal video levels never exceed
    1023, so masking to the field width is equivalent and safe.
    """
    return jnp.clip(jnp.rint(x), 0, 65535).astype(jnp.int32) & 0x3FF


def u8_sat_rte(x: jnp.ndarray) -> jnp.ndarray:
    """convert_uchar_sat_rte: round-to-nearest-even, clamp [0, 255]."""
    return jnp.clip(jnp.rint(x), 0, 255).astype(jnp.int32)
