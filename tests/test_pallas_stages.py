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
