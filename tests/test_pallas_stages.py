"""Pallas v210 unpack/pack stage kernels inside XLA programs: bit
identity with the pure-XLA formulation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phaneron_tpu.graph.pipeline import ChannelSpec, LayerSpec, make_channel_program
from phaneron_tpu.ops.coeffs import make_loader
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.ops.io import to_rgba
from phaneron_tpu.ops.pallas_kernels import make_v210_pack_rgba, make_v210_unpack_rgba


@pytest.mark.parametrize("width,height", [(1920, 16), (1280, 16), (96, 32)])
def test_stage_unpack_matches_xla(width, height):
    v210 = get_format("v210")
    src = np.asarray(v210.fill_buf(width, height)[0])
    loader = make_loader(v210.INFO, "709", "709", "analytic")
    xla = np.asarray(to_rgba(v210, [jnp.asarray(src)], loader, width, height))
    pallas = np.asarray(make_v210_unpack_rgba(width, height, interpret=True)(jnp.asarray(src)))
    assert pallas.shape == xla.shape
    # FMA formation differs between the kernels, so gamma values landing
    # on rte .5 boundaries (common for ramp codes) may flip one 16-bit
    # LUT index: linear values differ by at most a single LUT step
    # (~3.4e-5 near white).  A 10-bit output code spans ~75 LUT steps,
    # so packed outputs re-quantize identically (tests below) and
    # round-trips stay bit-exact.
    assert np.abs(pallas - xla).max() <= 4e-5


@pytest.mark.parametrize("width,height", [(1920, 16), (1280, 16)])
def test_stage_pack_roundtrip(width, height):
    v210 = get_format("v210")
    src = np.asarray(v210.fill_buf(width, height)[0])
    unpack = make_v210_unpack_rgba(width, height, interpret=True)
    pack = make_v210_pack_rgba(width, height, interpret=True)
    out = np.asarray(pack(unpack(jnp.asarray(src))))
    assert out.tobytes() == src.tobytes()


def test_channel_program_with_pallas_stages_bit_identical():
    w, h = 96, 32
    v210 = get_format("v210")
    src = np.asarray(v210.fill_buf(w, h)[0])
    base = ChannelSpec(w, h, "v210", layers=(LayerSpec("v210"),))
    staged = base._replace(pallas_stages=True)
    a = np.asarray(make_channel_program(base)({"layers": [{"src": [src]}]})[0])
    b = np.asarray(make_channel_program(staged)({"layers": [{"src": [src]}]})[0])
    assert a.tobytes() == b.tobytes()


@pytest.mark.parametrize("fmt_name", ["yuv422p10le", "yuv422p8"])
@pytest.mark.parametrize("width,height", [(1920, 16), (720, 16)])
def test_planar422_stage_roundtrip(fmt_name, width, height):
    from phaneron_tpu.ops.pallas_kernels import (
        make_planar422_pack_rgba,
        make_planar422_unpack_rgba,
    )

    fmt = get_format(fmt_name)
    src = [np.asarray(p) for p in fmt.fill_buf(width, height)]
    unpack = make_planar422_unpack_rgba(fmt_name, width, height, interpret=True)
    pack = make_planar422_pack_rgba(fmt_name, width, height, interpret=True)
    outs = pack(unpack([jnp.asarray(p) for p in src]))
    for a, b in zip(src, outs):
        out = np.asarray(b)
        assert out.dtype == a.dtype and out.shape == a.shape
        assert out.tobytes() == a.tobytes()


def test_planar422_stage_matches_xla_codes():
    fmt = get_format("yuv422p10le")
    w, h = 720, 16
    src = [np.asarray(p) for p in fmt.fill_buf(w, h)]
    loader = make_loader(fmt.INFO, "709", "709", "analytic")
    xla = np.asarray(to_rgba(fmt, [jnp.asarray(p) for p in src], loader, w, h))
    from phaneron_tpu.ops.pallas_kernels import make_planar422_unpack_rgba

    pallas = np.asarray(
        make_planar422_unpack_rgba("yuv422p10le", w, h, interpret=True)(
            [jnp.asarray(p) for p in src]
        )
    )
    assert np.abs(pallas - xla).max() <= 4e-5  # one LUT step (FMA formation)


def test_channel_program_planar422_stages():
    w, h = 96, 32
    fmt = get_format("yuv422p8")
    src = [np.asarray(p) for p in fmt.fill_buf(w, h)]
    base = ChannelSpec(w, h, "yuv422p8", layers=(LayerSpec("yuv422p8"),))
    staged = base._replace(pallas_stages=True)
    a = make_channel_program(base)({"layers": [{"src": src}]})
    b = make_channel_program(staged)({"layers": [{"src": src}]})
    for pa, pb in zip(a, b):
        assert np.asarray(pa).tobytes() == np.asarray(pb).tobytes()


@pytest.mark.parametrize("fmt_name", ["yuv420p", "nv12"])
@pytest.mark.parametrize("width,height", [(1920, 16), (720, 16), (100, 16)])
def test_planar420_stage_roundtrip(fmt_name, width, height):
    from phaneron_tpu.ops.pallas_kernels import (
        make_planar420_pack_rgba,
        make_planar420_unpack_rgba,
    )

    fmt = get_format(fmt_name)
    src = [np.asarray(p) for p in fmt.fill_buf(width, height)]
    unpack = make_planar420_unpack_rgba(fmt_name, width, height, interpret=True)
    pack = make_planar420_pack_rgba(fmt_name, width, height, interpret=True)
    outs = pack(unpack([jnp.asarray(p) for p in src]))
    for a, b in zip(src, outs):
        out = np.asarray(b)
        assert out.dtype == a.dtype and out.shape == a.shape
        assert out.tobytes() == a.tobytes()


@pytest.mark.parametrize("fmt_name", ["yuv420p", "nv12"])
def test_planar420_stage_matches_xla(fmt_name):
    fmt = get_format(fmt_name)
    w, h = 720, 16
    src = [np.asarray(p) for p in fmt.fill_buf(w, h)]
    loader = make_loader(fmt.INFO, "709", "709", "analytic")
    xla = np.asarray(to_rgba(fmt, [jnp.asarray(p) for p in src], loader, w, h))
    from phaneron_tpu.ops.pallas_kernels import make_planar420_unpack_rgba

    pallas = np.asarray(
        make_planar420_unpack_rgba(fmt_name, w, h, interpret=True)(
            [jnp.asarray(p) for p in src]
        )
    )
    assert np.abs(pallas - xla).max() <= 4e-5  # one LUT step (FMA formation)


@pytest.mark.parametrize("fmt_name", ["yuv420p", "nv12"])
def test_channel_program_planar420_stages(fmt_name):
    w, h = 96, 32
    fmt = get_format(fmt_name)
    src = [np.asarray(p) for p in fmt.fill_buf(w, h)]
    base = ChannelSpec(w, h, fmt_name, layers=(LayerSpec(fmt_name),))
    staged = base._replace(pallas_stages=True)
    a = make_channel_program(base)({"layers": [{"src": src}]})
    b = make_channel_program(staged)({"layers": [{"src": src}]})
    for pa, pb in zip(a, b):
        assert np.asarray(pa).tobytes() == np.asarray(pb).tobytes()


def test_fused_combine_pack_tail_matches_staged():
    """UHD-geometry channel program routes the combine+pack tail into
    one kernel; output matches the XLA path <=1 packed code."""
    import jax.numpy as jnp

    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        make_channel_program,
    )
    from phaneron_tpu.ops.formats import get_format
    from phaneron_tpu.ops.geometry import transform_matrix
    from phaneron_tpu.ops.pallas_warp import bucket_of

    w, h = 3840, 16  # g = 640 (128-multiple): the fused-tail geometry
    v210 = get_format("v210")
    srcs = [
        np.roll(np.asarray(v210.fill_buf(w, h)[0]), 5 * k, axis=1) for k in range(3)
    ]
    m = transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.01)
    layer = LayerSpec(
        "v210", transition="dissolve", src_b_format="v210",
        has_transform=True, axis_aligned=True, warp_bucket=bucket_of(m),
    )
    single = LayerSpec("v210")
    spec = ChannelSpec(w, h, "v210", layers=(layer, single), pallas_stages=True)
    base = spec._replace(
        pallas_stages=False,
        layers=tuple(l._replace(warp_bucket=-1) for l in spec.layers),
    )
    params = {
        "layers": [
            {"src": [srcs[0]], "src_b": [srcs[1]], "matrix": jnp.asarray(m),
             "mix": jnp.float32(0.4)},
            {"src": [srcs[2]]},
        ]
    }
    a = np.asarray(make_channel_program(spec)(params)[0])
    b = np.asarray(make_channel_program(base)(params)[0])
    for qa, qb in zip(
        v210.unpack_codes([jnp.asarray(a)], w, h),
        v210.unpack_codes([jnp.asarray(b)], w, h),
    ):
        assert np.abs(np.asarray(qa).astype(int) - np.asarray(qb).astype(int)).max() <= 1
