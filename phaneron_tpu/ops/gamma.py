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

from functools import lru_cache

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
    "gamma2linear_poly_fn",
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


@lru_cache(maxsize=None)
def _g2l_poly_coeffs(col_spec: str, degree: int = 9):
    """Chebyshev fit of the hi (power-law) branch of gamma->linear on
    its own domain [beta*delta, 1], returned as Horner coefficients in
    the normalized variable t = (fi - mid)/half (conditioning: power
    basis on [-1, 1], exact to convert at this degree).

    The polynomial replaces ``jnp.power`` — the transcendental is
    10-20 VPU slots per element where Horner is ``degree`` FMAs — in
    kernels whose error class is already ~2^-17 (the packed warp
    family).  Fit residual over every representable LUT index is
    ~3e-7 (degree 9), two decades inside that class; the exactness
    invariant paths (unpack kernels, 'lut'=='analytic') never use it.
    """
    p = COLOUR_SPECS[col_spec]
    lo_edge = float(np.float32(p.beta * p.delta))
    idx = np.arange(LUT_ENTRIES)
    fi = (idx / (LUT_ENTRIES - 1)).astype(np.float32)
    m = fi >= lo_edge
    x = fi[m].astype(np.float64)
    y = (
        ((fi[m] + np.float32(p.alpha - 1.0)) * np.float32(1.0 / p.alpha))
        ** np.float64(1.0 / p.gamma)
    )
    mid, half = (x[0] + 1.0) / 2.0, (1.0 - x[0]) / 2.0
    cheb = np.polynomial.chebyshev.Chebyshev.fit(
        (x - mid) / half, y, degree, domain=[-1.0, 1.0]
    )
    coeffs = np.polynomial.chebyshev.cheb2poly(cheb.coef)[::-1]
    approx = np.polyval(coeffs, (x - mid) / half).astype(np.float32)
    resid = np.abs(approx - y.astype(np.float32)).max()
    assert resid < 1.5e-6, (col_spec, resid)
    return (
        float(mid),
        float(half),
        tuple(float(c) for c in coeffs),
    )


def gamma2linear_poly_fn(col_spec: str):
    """g2l(x) with the power branch as a Horner polynomial — a scalar-
    literal closure safe to trace inside Pallas kernels (no captured
    arrays).  Same u16 quantization as the analytic path; error vs
    analytic <= ~3e-7 linear units (asserted at fit time and by
    tests/test_gamma.py exhaustively)."""
    p = COLOUR_SPECS[col_spec]
    mid, half, coeffs = _g2l_poly_coeffs(col_spec)
    inv_half = np.float32(1.0 / half)
    midf = np.float32(mid)
    beta = np.float32(p.beta * p.delta)
    inv_delta = np.float32(1.0 / p.delta)

    def g2l(x):
        fi = _index_to_f(u16_sat_rte(x * 65535.0))
        t = (fi - midf) * inv_half
        acc = jnp.full_like(fi, np.float32(coeffs[0]))
        for c in coeffs[1:]:
            acc = acc * t + np.float32(c)
        return jnp.where(fi < beta, fi * inv_delta, acc)

    return g2l


def gamma2linear_analytic(col_spec: str, x: jnp.ndarray) -> jnp.ndarray:
    """Analytic equivalent of gamma_lut_apply(gamma2linear_lut(spec), x)."""
    return gamma2linear_at_index(col_spec, u16_sat_rte(x * 65535.0))


def linear2gamma_analytic(col_spec: str, x: jnp.ndarray) -> jnp.ndarray:
    """Analytic equivalent of gamma_lut_apply(linear2gamma_lut(spec), x)."""
    return linear2gamma_at_index(col_spec, u16_sat_rte(x * 65535.0))
