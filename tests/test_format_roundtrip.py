"""Bit-exact pack -> unpack -> pack round-trips for every pixel format.

This reproduces the reference's kernel-correctness test design
(src/process/test/*.ts, SURVEY.md §4): deterministic fillBuf ramp ->
unpack to float RGBA -> pack back -> byte-compare, including pitch
padding and width-remainder tails.
"""

import jax
import numpy as np
import pytest

from phaneron_tpu.ops import io as fio
from phaneron_tpu.ops.coeffs import make_loader, make_saver
from phaneron_tpu.ops.formats import get_format

# widths chosen to hit remainder paths: 1920 (clean for all), 1280
# (v210 remain=2), 1282 (v210 remain=4), 136 (%48=40, %8=0), 720
YUV_CASES = [
    ("v210", 1920, 32),
    ("v210", 1280, 16),
    ("v210", 1282, 16),
    ("v210", 136, 8),
    ("yuv422p10le", 1920, 32),
    ("yuv422p10le", 720, 16),
    ("yuv422p8", 1920, 32),
    ("yuv422p8", 136, 8),
    ("yuv420p", 1920, 32),
    ("yuv420p", 640, 16),
    ("nv12", 1920, 32),
    ("nv12", 640, 16),
]


@pytest.mark.parametrize("gamma_mode", ["lut", "analytic"])
@pytest.mark.parametrize("name,width,height", YUV_CASES)
def test_yuv_roundtrip_bit_exact(name, width, height, gamma_mode):
    fmt = get_format(name)
    col_spec = "709"
    loader = make_loader(fmt.INFO, col_spec, col_spec, gamma_mode)
    saver = make_saver(fmt.INFO, col_spec, gamma_mode)

    src_planes = fmt.fill_buf(width, height)

    @jax.jit
    def roundtrip(planes):
        rgba = fio.to_rgba(fmt, planes, loader, width, height)
        return fio.from_rgba(fmt, rgba, saver, width, height)

    out_planes = roundtrip([np.asarray(p) for p in src_planes])
    assert len(out_planes) == len(src_planes)
    for i, (src, out) in enumerate(zip(src_planes, out_planes)):
        out_np = np.asarray(out)
        assert out_np.dtype == src.dtype, f"plane {i} dtype"
        assert out_np.shape == src.shape, f"plane {i} shape"
        mismatches = np.nonzero(out_np != src)
        assert out_np.tobytes() == src.tobytes(), (
            f"{name} {width}x{height} plane {i}: "
            f"{len(mismatches[0])} mismatching samples, first at "
            f"{[m[0] for m in mismatches][:3]} "
            f"src={src[mismatches][:4]} out={out_np[mismatches][:4]}"
        )


@pytest.mark.parametrize("name", ["rgba8", "bgra8"])
def test_rgb_roundtrip_bit_exact(name):
    # sRGB gamma like the screen consumer (screenConsumer.ts:128-133)
    fmt = get_format(name)
    width, height = 640, 16
    loader = make_loader(fmt.INFO, "sRGB", "sRGB")
    saver = make_saver(fmt.INFO, "sRGB")

    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, size=(height, width, 4), dtype=np.uint8)
    src[..., 3] = 255  # writer forces alpha 255; make source match

    @jax.jit
    def roundtrip(planes):
        rgba = fio.to_rgba(fmt, planes, loader, width, height)
        return fio.from_rgba(fmt, rgba, saver, width, height)

    out = np.asarray(roundtrip([src])[0])
    assert out.tobytes() == src.tobytes()


def test_v210_full_code_sweep():
    """Every legal 10-bit luma code survives the round trip."""
    fmt = get_format("v210")
    width, height = 1920, 1
    loader = make_loader(fmt.INFO, "709", "709")
    saver = make_saver(fmt.INFO, "709")

    # luma sweep 64..940 with chroma null, packed manually
    import jax.numpy as jnp

    y = np.zeros((1, width), dtype=np.int32)
    y[0, : 877 * 2] = np.repeat(np.arange(64, 941), 2)[: 877 * 2]
    y[0, 877 * 2 :] = 64
    cb = np.full((1, width), 512, dtype=np.int32)
    cr = np.full((1, width), 512, dtype=np.int32)
    planes = fmt.pack_codes(jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), width, height)
    src = np.asarray(planes[0])

    rgba = fio.to_rgba(fmt, [src], loader, width, height)
    out = np.asarray(fio.from_rgba(fmt, rgba, saver, width, height)[0])
    assert out.tobytes() == src.tobytes()


def test_unpack_values_match_fill_ramp():
    """Spot-check the unpacked codes equal the fillBuf ramp definition."""
    fmt = get_format("v210")
    width, height = 1920, 4
    planes = fmt.fill_buf(width, height)
    y, cb, cr = fmt.unpack_codes([np.asarray(p) for p in planes], width, height)
    y = np.asarray(y)
    # first line: Y = 64 + group index, six pixels per group
    groups = width // 6
    expected0 = 64 + np.repeat(np.arange(groups), 6) % 877
    assert np.array_equal(y[0], expected0)
    # second line continues the ramp
    expected1 = 64 + (groups + np.repeat(np.arange(groups), 6)) % 877
    assert np.array_equal(y[1], expected1)
    assert np.all(np.asarray(cb) == 512)
    assert np.all(np.asarray(cr) == 512)
