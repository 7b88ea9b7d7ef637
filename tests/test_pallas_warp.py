"""Pallas DVE warp kernel vs the gather formulation (interpret mode is
f32-exact; compiled TPU runs single-pass bf16 MXU weights, ~4e-3 — the
reference's OpenCL LINEAR sampler precision class)."""

import jax.numpy as jnp
import numpy as np
import pytest

from phaneron_tpu.graph.pipeline import ChannelSpec, LayerSpec, make_channel_program
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.ops.geometry import transform_matrix, warp_axis_aligned
from phaneron_tpu.ops.pallas_warp import fits, make_warp_program

H, W = 64, 256


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(scale_x=0.9, scale_y=0.9, offset_x=0.02),
        dict(scale_x=0.5, scale_y=2.0, offset_y=-0.1),
        dict(flip_h=True, scale_x=1.3),
        dict(flip_v=True),
        dict(anchor_x=0.3, scale_x=1.5, scale_y=0.7, offset_y=0.1),
        dict(),
    ],
)
def test_warp_matches_gather(kwargs):
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.random((4, H, W), dtype=np.float32))
    m = transform_matrix(W, H, **kwargs)
    assert fits(m)
    ref = np.asarray(warp_axis_aligned(src, jnp.asarray(m)))
    out = np.asarray(make_warp_program(H, W, interpret=True)(src, jnp.asarray(m)))
    assert np.abs(ref - out).max() <= 2e-5  # FMA formation ulps in fx/fy


def test_fits_bounds():
    assert not fits(transform_matrix(W, H, rotate=0.1))  # rotation
    assert not fits(transform_matrix(W, H, scale_y=0.1))  # |m11|=10 window
    assert fits(transform_matrix(W, H, scale_y=0.25))  # |m11|=4 ok


def test_channel_program_uses_warp_kernel(monkeypatch):
    from phaneron_tpu.graph import pipeline

    monkeypatch.setattr(pipeline, "ENABLE_PALLAS_WARP", True)
    w, h = 128, 32
    v210 = get_format("v210")
    src = np.asarray(v210.fill_buf(w, h)[0])
    m = transform_matrix(w, h, scale_x=0.8, scale_y=0.8)
    layer = LayerSpec("v210", has_transform=True, axis_aligned=True, warp_fits=True)
    spec = ChannelSpec(w, h, "v210", layers=(layer,), pallas_stages=True)
    base = spec._replace(pallas_stages=False, layers=(layer._replace(warp_fits=False),))
    a = np.asarray(
        make_channel_program(spec)({"layers": [{"src": [src], "matrix": jnp.asarray(m)}]})[0]
    )
    b = np.asarray(
        make_channel_program(base)({"layers": [{"src": [src], "matrix": jnp.asarray(m)}]})[0]
    )
    # interpret-mode pallas path vs XLA path: packed codes may differ by
    # a single code on rte boundaries
    ya, _, _ = v210.unpack_codes([jnp.asarray(a)], w, h)
    yb, _, _ = v210.unpack_codes([jnp.asarray(b)], w, h)
    assert np.abs(np.asarray(ya) - np.asarray(yb)).max() <= 1
