"""Fused multi-layer composite kernel (v210 decode + warp + dissolve +
over-composite in one pallas_call) vs the staged formulation.

Error class: the resample is the same bf16 hi/lo split as the pair warp
(~2^-17, <=1 packed code); decode/alpha are exact."""

import jax.numpy as jnp
import numpy as np
import pytest

from phaneron_tpu.graph.pipeline import ChannelSpec, LayerSpec, make_channel_program
from phaneron_tpu.ops.composite import combine, dissolve
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.ops.geometry import transform_matrix, warp_axis_aligned
from phaneron_tpu.ops.pallas_composite import (
    composite_supported,
    make_composite_program,
)
from phaneron_tpu.ops.pallas_kernels import words_to_planes
from phaneron_tpu.ops.pallas_warp import bucket_of

W, H = 384, 64  # width % 48 == 0 and % 128 == 0; g = 64 (full-width window)


def _staged_reference(srcs_words, mats, mixes, layer_cfg, w, h):
    """XLA staged oracle: unpack -> warp -> dissolve -> combine."""
    from phaneron_tpu.ops import io as fio
    from phaneron_tpu.ops.coeffs import make_loader

    v210 = get_format("v210")
    loader = make_loader(v210.INFO, "709", "709", "analytic")
    it = iter(srcs_words)
    frames = [jnp.zeros((4, h, w), jnp.float32)]
    for (n_src, _b), mat, mix in zip(layer_cfg, mats, mixes):
        a = warp_axis_aligned(fio.to_rgba(v210, [next(it)], loader, w, h), mat)
        if n_src == 2:
            b = warp_axis_aligned(fio.to_rgba(v210, [next(it)], loader, w, h), mat)
            frames.append(dissolve(a, b, mix))
        else:
            frames.append(a)
    return combine(frames)


def _sources(w, h, n):
    v210 = get_format("v210")
    out = []
    for k in range(n):
        words = np.asarray(v210.fill_buf(w, h)[0])
        out.append(np.roll(words, k * 7, axis=0))  # distinct per source
    return [jnp.asarray(s) for s in out]


@pytest.mark.parametrize(
    "layer_cfg,scales",
    [
        (((2, None), (1, None)), (0.9, 1.2)),  # pair + single
        (((2, None), (2, None), (2, None), (2, None)), (0.9, 0.8, 1.1, 0.95)),
    ],
)
def test_composite_matches_staged(layer_cfg, scales):
    mats = [
        jnp.asarray(transform_matrix(W, H, scale_x=s, scale_y=s, offset_x=0.02 * i))
        for i, s in enumerate(scales)
    ]
    layer_cfg = tuple(
        (n, bucket_of(np.asarray(m))) for (n, _), m in zip(layer_cfg, mats)
    )
    n_srcs = sum(n for n, _ in layer_cfg)
    srcs = _sources(W, H, n_srcs)
    mixes = [jnp.float32(0.3 + 0.1 * i) for i in range(len(layer_cfg))]

    want = np.asarray(_staged_reference(srcs, mats, mixes, layer_cfg, W, H))
    prog = make_composite_program(H, W, layer_cfg, interpret=True)
    got = np.asarray(
        prog([words_to_planes(s) for s in srcs], jnp.stack(mats), jnp.stack(mixes))
    )
    assert got.shape == want.shape
    assert np.abs(want - got).max() <= 4e-4, np.abs(want - got).max()  # pair-warp error class at this geometry (see test_pallas_warp)


def test_composite_windowed_path_uhd_width():
    """UHD width exercises the 128-aligned dynamic group-window slices
    (wcg < g) — the path the real serving shape uses."""
    w, h = 3840, 16
    m = jnp.asarray(transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.05))
    layer_cfg = ((2, bucket_of(np.asarray(m))),)
    srcs = _sources(w, h, 2)
    mixes = [jnp.float32(0.4)]
    from phaneron_tpu.ops.pallas_composite import _composite_config

    _, _, wcg = _composite_config(h, w, layer_cfg[0][1])
    assert wcg < w // 6  # genuinely windowed
    want = np.asarray(_staged_reference(srcs, [m], mixes, layer_cfg, w, h))
    prog = make_composite_program(h, w, layer_cfg, interpret=True)
    got = np.asarray(
        prog([words_to_planes(s) for s in srcs], jnp.stack([m]), jnp.stack(mixes))
    )
    assert np.abs(want - got).max() <= 4e-4, np.abs(want - got).max()  # pair-warp error class at this geometry (see test_pallas_warp)


def test_channel_program_routes_through_fused_composite(monkeypatch):
    """A supported spec's channel program matches the XLA path to <=1
    packed code, end to end (unpack->composite->pack)."""
    from phaneron_tpu.graph import pipeline as pl_mod

    monkeypatch.setattr(pl_mod, "ENABLE_FUSED_COMPOSITE", True)
    v210 = get_format("v210")
    m = transform_matrix(W, H, scale_x=0.85, scale_y=0.85)
    layer = LayerSpec(
        "v210", transition="dissolve", src_b_format="v210",
        has_transform=True, axis_aligned=True, warp_bucket=bucket_of(m),
    )
    spec = ChannelSpec(W, H, "v210", layers=(layer, layer), pallas_stages=True)
    assert composite_supported(spec)
    base = spec._replace(
        pallas_stages=False,
        layers=tuple(l._replace(warp_bucket=-1) for l in spec.layers),
    )
    srcs = _sources(W, H, 4)
    params = {
        "layers": [
            {"src": [srcs[0]], "src_b": [srcs[1]], "matrix": jnp.asarray(m),
             "mix": jnp.float32(0.4)},
            {"src": [srcs[2]], "src_b": [srcs[3]], "matrix": jnp.asarray(m),
             "mix": jnp.float32(0.7)},
        ]
    }
    a = np.asarray(make_channel_program(spec)(params)[0])
    b = np.asarray(make_channel_program(base)(params)[0])
    ya, ua, va = (np.asarray(x) for x in v210.unpack_codes([jnp.asarray(a)], W, H))
    yb, ub, vb = (np.asarray(x) for x in v210.unpack_codes([jnp.asarray(b)], W, H))
    assert np.abs(ya - yb).max() <= 1
    assert np.abs(ua - ub).max() <= 1
    assert np.abs(va - vb).max() <= 1


def test_supported_gating():
    m = transform_matrix(W, H, scale_x=0.9)
    ok = LayerSpec(
        "v210", transition="dissolve", src_b_format="v210",
        has_transform=True, axis_aligned=True, warp_bucket=bucket_of(m),
    )
    spec = ChannelSpec(W, H, "v210", layers=(ok,), pallas_stages=True)
    assert composite_supported(spec)
    # any unsupported layer disqualifies
    for bad in (
        ok._replace(src_format="yuv422p8"),
        ok._replace(has_transform=False),
        ok._replace(axis_aligned=False),
        ok._replace(warp_bucket=-1),
        ok._replace(transition="wipe"),
        ok._replace(warp_same_mat=False),
        ok._replace(deinterlace=True, src_format="rgba_f32"),
    ):
        assert not composite_supported(spec._replace(layers=(ok, bad)))
    # geometry gates
    assert not composite_supported(spec._replace(width=W + 48))  # % 128
    assert not composite_supported(spec._replace(width=256))  # % 48
