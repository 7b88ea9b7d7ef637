"""Transfer-function (gamma) application on device.

The reference applies gamma through 2^16-entry LUTs indexed by
``convert_ushort_sat_rte(value * 65535)`` (e.g. v210.ts:68-70,148-150).
Two device implementations are provided:

- ``mode='lut'``   — a real gather from the 65536-entry f32 LUT.
  Bit-identical to the reference by construction.  Fast on CPU; on TPU
  gathers are served by the scatter/gather unit and are slower than
  arithmetic.
- ``mode='analytic'`` — quantizes to the same 16-bit index, then
  evaluates the ITU transfer formula directly on the VPU.  Identical
  indices in, near-identical values out; ``tests/test_gamma.py``
  verifies equivalence exhaustively over all 65536 indices.

Both paths quantize first, so switching modes never changes which LUT
cell a pixel lands in.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .colour_maths import COLOUR_SPECS, LUT_ENTRIES
from .quant import u16_sat_rte

__all__ = [
    "gamma_lut_apply",
    "gamma2linear_analytic",
    "linear2gamma_analytic",
    "gamma2linear_at_index",
    "linear2gamma_at_index",
]


def gamma_lut_apply(lut: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """lut[convert_ushort_sat_rte(x * 65535)] — the reference's exact op."""
    idx = u16_sat_rte(x * 65535.0)
    return jnp.take(lut, idx)


def _index_to_f(idx: jnp.ndarray) -> jnp.ndarray:
    # LUT generation computes i / (2^16 - 1) in float64 then the formula in
    # float64, storing float32 (colourMaths.ts:143-147).  On device we
    # evaluate in float32; equivalence is verified exhaustively in tests.
    return idx.astype(jnp.float32) * np.float32(1.0 / (LUT_ENTRIES - 1))


def gamma2linear_at_index(col_spec: str, idx: jnp.ndarray) -> jnp.ndarray:
    """Analytic LUT cell value at an integer index in [0, 65535]."""
    p = COLOUR_SPECS[col_spec]
    fi = _index_to_f(idx)
    beta = np.float32(p.beta * p.delta)
    lo = fi * np.float32(1.0 / p.delta)
    hi = jnp.power(
        (fi + np.float32(p.alpha - 1.0)) * np.float32(1.0 / p.alpha),
        np.float32(1.0 / p.gamma),
    )
    return jnp.where(fi < beta, lo, hi)


def linear2gamma_at_index(col_spec: str, idx: jnp.ndarray) -> jnp.ndarray:
    p = COLOUR_SPECS[col_spec]
    fi = _index_to_f(idx)
    lo = fi * np.float32(p.delta)
    hi = np.float32(p.alpha) * jnp.power(fi, np.float32(p.gamma)) - np.float32(
        p.alpha - 1.0
    )
    return jnp.where(fi < np.float32(p.beta), lo, hi)


def gamma2linear_analytic(col_spec: str, x: jnp.ndarray) -> jnp.ndarray:
    """Analytic equivalent of gamma_lut_apply(gamma2linear_lut(spec), x)."""
    return gamma2linear_at_index(col_spec, u16_sat_rte(x * 65535.0))


def linear2gamma_analytic(col_spec: str, x: jnp.ndarray) -> jnp.ndarray:
    """Analytic equivalent of gamma_lut_apply(linear2gamma_lut(spec), x)."""
    return linear2gamma_at_index(col_spec, u16_sat_rte(x * 65535.0))
