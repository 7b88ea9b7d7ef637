"""LUT vs analytic gamma equivalence — exhaustive over all 65536 indices.

The analytic path evaluates the ITU formula in float32 on the VPU; the
LUT is built in float64 and rounded.  f32 pow differs from rounded-f64
pow by up to ~3e-6 — far below the ~5.7e-4 (10-bit) / 2.3e-3 (8-bit)
code-step sizes, so pack/unpack round-trips stay bit-exact in both
modes (verified directly in test_format_roundtrip.py with
gamma_mode='analytic')."""

import jax.numpy as jnp
import numpy as np

from phaneron_tpu.ops import colour_maths as cm
from phaneron_tpu.ops.gamma import (
    gamma2linear_at_index,
    gamma2linear_poly_fn,
    linear2gamma_at_index,
)

MAX_ABS_DIFF = 1e-5


def test_analytic_matches_lut_g2l():
    idx = jnp.arange(65536)
    for spec in ("709", "2020", "sRGB"):
        lut = cm.gamma2linear_lut(spec)
        analytic = np.asarray(gamma2linear_at_index(spec, idx))
        diff = np.abs(analytic - lut)
        assert float(diff.max()) < MAX_ABS_DIFF, (spec, float(diff.max()))


def test_analytic_matches_lut_l2g():
    idx = jnp.arange(65536)
    for spec in ("709", "2020", "sRGB"):
        lut = cm.linear2gamma_lut(spec)
        analytic = np.asarray(linear2gamma_at_index(spec, idx))
        diff = np.abs(analytic - lut)
        assert float(diff.max()) < MAX_ABS_DIFF, (spec, float(diff.max()))


def test_poly_matches_analytic_g2l():
    """The Horner-polynomial transfer (packed-warp family's pow
    replacement) vs the analytic formula — exhaustive over every LUT
    index, for every spec the producer surface accepts.  Bound is two
    decades inside the packed family's ~2^-17 parity class."""
    x = jnp.arange(65536, dtype=jnp.float32) / 65535.0
    for spec in ("709", "601-625", "601_525", "2020", "sRGB"):
        poly = np.asarray(gamma2linear_poly_fn(spec)(x))
        analytic = np.asarray(gamma2linear_at_index(spec, jnp.arange(65536)))
        diff = np.abs(poly - analytic)
        assert float(diff.max()) < 1.5e-6, (spec, float(diff.max()))
