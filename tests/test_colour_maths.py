"""Golden-value and property tests for the colour science module
(parity with reference colourMaths.ts, SURVEY.md §2.2)."""

import numpy as np
import pytest

from phaneron_tpu.ops import colour_maths as cm


def test_gamma_lut_shapes_and_endpoints():
    for spec in cm.COLOUR_SPECS:
        g2l = cm.gamma2linear_lut(spec)
        l2g = cm.linear2gamma_lut(spec)
        assert g2l.shape == (65536,)
        assert g2l.dtype == np.float32
        assert g2l[0] == 0.0
        assert abs(float(g2l[-1]) - 1.0) < 1e-6
        assert l2g[0] == 0.0
        assert abs(float(l2g[-1]) - 1.0) < 1e-6
        # monotone except for a tiny dip where the ITU piecewise segments
        # meet (the published 1.099/0.099 constants are rounded)
        assert np.all(np.diff(g2l) >= -1e-4)
        assert np.all(np.diff(l2g) >= -1e-4)


def test_gamma_709_known_values():
    # ITU BT.709 OETF inverse: below beta*delta linear = V/4.5
    g2l = cm.gamma2linear_lut("709")
    i = 1000  # fi = 1000/65535 ≈ 0.01526 < 0.081
    fi = 1000 / 65535
    assert abs(float(g2l[i]) - fi / 4.5) < 1e-9
    # above: ((fi + 0.099)/1.099)^(1/0.45)
    i = 40000
    fi = 40000 / 65535
    expected = ((fi + 0.099) / 1.099) ** (1 / 0.45)
    assert abs(float(g2l[i]) - expected) < 1e-6


def test_lut_mutual_inverse():
    for spec in ("709", "2020", "sRGB"):
        g2l = cm.gamma2linear_lut(spec).astype(np.float64)
        l2g = cm.linear2gamma_lut(spec).astype(np.float64)
        x = np.linspace(0, 1, 1001)
        idx = np.rint(x * 65535).astype(int)
        lin = g2l[idx]
        back = l2g[np.rint(lin * 65535).astype(int)]
        assert np.max(np.abs(back - x)) < 1e-3


@pytest.mark.parametrize("bits,black,white,chroma", [(10, 64, 940, 896), (8, 16, 235, 224)])
def test_ycbcr2rgb_black_white(bits, black, white, chroma):
    m = cm.ycbcr2rgb_matrix("709", bits, black, white, chroma)
    assert m.shape == (3, 4)
    null = 128 << (bits - 8)
    blackv = m @ np.array([black, null, null, 1.0])
    whitev = m @ np.array([white, null, null, 1.0])
    assert np.allclose(blackv, 0.0, atol=1e-6)
    assert np.allclose(whitev, 1.0, atol=1e-5)


def test_matrices_mutual_inverse():
    fwd = cm.ycbcr2rgb_matrix("709", 10, 64, 940, 896).astype(np.float64)
    bwd = cm.rgb2ycbcr_matrix("709", 10, 64, 940, 896).astype(np.float64)
    codes = np.array([500.0, 400.0, 600.0, 1.0])
    rgb = fwd @ codes
    back = bwd @ np.append(rgb, 1.0)
    assert np.allclose(back, codes[:3], atol=1e-3)


def test_gamut_identity_and_white_preservation():
    ident = cm.rgb2rgb_matrix("709", "709")
    assert np.allclose(ident, np.eye(3), atol=1e-6)
    m = cm.rgb2rgb_matrix("709", "2020")
    # white (1,1,1) maps to white: both spaces share the D65 white point
    assert np.allclose(m @ np.ones(3), np.ones(3), atol=1e-4)
    # round trip 709 -> 2020 -> 709
    back = cm.rgb2rgb_matrix("2020", "709").astype(np.float64) @ m.astype(np.float64)
    assert np.allclose(back, np.eye(3), atol=1e-5)


def test_unknown_spec_falls_back_to_709():
    assert np.array_equal(cm.gamma2linear_lut("nonsense"), cm.gamma2linear_lut("709"))
