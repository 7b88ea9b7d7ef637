"""BASELINE config 1: gamma + BT.709<->BT.2020 gamut conversion chain.

HDR-path fidelity is float-tolerant (BASELINE.md): unpack in 709,
convert to 2020 working space, back to 709, repack — the packed output
must match the straight-through result within one code step."""

import jax
import numpy as np

from phaneron_tpu.ops import io as fio
from phaneron_tpu.ops.coeffs import make_loader, make_saver
from phaneron_tpu.ops.colorspace import rgb_gamut
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.ops import colour_maths as cm

W, H = 1920, 16


def test_709_to_2020_chain_roundtrip():
    fmt = get_format("v210")
    src = [np.asarray(p) for p in fmt.fill_buf(W, H)]

    # unpack 709 source into a BT.2020 working space (Loader gamut path)
    loader_2020 = make_loader(fmt.INFO, "709", "2020")
    saver_709 = make_saver(fmt.INFO, "709")
    back = jax.numpy.asarray(cm.rgb2rgb_matrix("2020", "709"))

    @jax.jit
    def chain(planes):
        rgba_2020 = fio.to_rgba(fmt, planes, loader_2020, W, H)
        rgba_709 = rgb_gamut(rgba_2020, back)
        return fio.from_rgba(fmt, rgba_709, saver_709, W, H)

    out = np.asarray(chain(src)[0])

    # compare code planes against the identity roundtrip: one 10-bit
    # code of tolerance for the float gamut round trip
    y0, cb0, cr0 = (np.asarray(a) for a in fmt.unpack_codes([src[0]], W, H))
    y1, cb1, cr1 = (np.asarray(a) for a in fmt.unpack_codes([out], W, H))
    assert np.abs(y1 - y0).max() <= 1
    assert np.abs(cb1 - cb0).max() <= 1
    assert np.abs(cr1 - cr0).max() <= 1


def test_2020_working_space_widens_gamut():
    # a saturated 709 red maps inside 2020 (all positive, smaller values)
    m = cm.rgb2rgb_matrix("709", "2020").astype(np.float64)
    red_709 = np.array([1.0, 0.0, 0.0])
    red_2020 = m @ red_709
    assert red_2020[0] < 1.0 and np.all(red_2020 >= 0)
    # and back maps outside-capable values correctly
    inv = cm.rgb2rgb_matrix("2020", "709").astype(np.float64)
    back = inv @ red_2020
    assert np.allclose(back, red_709, atol=1e-5)
