"""The 3-channel opaque ring path (alpha-free deinterlace + warp).

Opaque wire sources (v210 et al.) unpack with alpha == the constant 1;
the 3-channel path drops the alpha plane from the ring entirely —
unpack, yadif and the warp windows each shed 1/4 of their traffic —
and the combine rebuilds the warped alpha as the separable outer
product wy x wx (pallas_warp.warp_alpha_vectors).  These tests pin:

- yadif on (3, H, W) rings bit-equal to the RGB planes of the
  4-channel kernel (Pallas interpret AND the XLA fallback);
- the 3-channel warp/pair kernels bit-equal on RGB, with the alpha
  vectors matching the 4-channel kernel's warped alpha to the family's
  ~2^-17 class;
- combine_rgb == combine on reconstructed frames;
- the v210 pack on (3, H, W) bit-equal to the 4-channel pack;
- the full interlaced channel program: 3-channel rings vs 4-channel
  rings -> packed output within 1 code (the alpha arithmetic moves
  from bf16 dots to exact f32, the family's documented class).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phaneron_tpu.graph.pipeline import ChannelSpec, LayerSpec, make_channel_program
from phaneron_tpu.ops.composite import combine, combine_rgb
from phaneron_tpu.ops.formats import get_format, host_split
from phaneron_tpu.ops.geometry import transform_matrix
from phaneron_tpu.ops.pallas_warp import (
    bucket_of,
    make_warp_pair_program,
    make_warp_program,
    warp_alpha_vectors,
)
from phaneron_tpu.ops.pallas_yadif import make_yadif_ring_program, yadif_ring_fits
from phaneron_tpu.ops.yadif import yadif_frame

W, H = 256, 64


def _opaque_frames(n, w=W, h=H, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(n):
        f = rng.random((4, h, w), dtype=np.float32)
        f[3] = 1.0
        frames.append(jnp.asarray(f))
    return frames


def test_yadif3_matches_yadif4_pallas():
    assert yadif_ring_fits(H, W, 3)
    ring = _opaque_frames(3)
    p4 = make_yadif_ring_program(H, W, True, interpret=True, opaque=True)
    p3 = make_yadif_ring_program(H, W, True, interpret=True, channels=3)
    for par in (0, 1):
        o4 = np.asarray(p4(*ring, jnp.int32(par)))
        o3 = np.asarray(p3(*(r[:3] for r in ring), jnp.int32(par)))
        assert o3.shape == (3, H, W)
        np.testing.assert_array_equal(o4[:3], o3)


def test_yadif3_matches_yadif4_xla():
    ring = _opaque_frames(3, seed=5)
    for par in (0, 1):
        o4 = np.asarray(yadif_frame(*ring, jnp.int32(par), True))
        o3 = np.asarray(
            yadif_frame(*(r[:3] for r in ring), jnp.int32(par), True)
        )
        np.testing.assert_array_equal(o4[:3], o3)


def test_warp3_rgb_bit_equal_and_alpha_separable():
    a, b = _opaque_frames(2, seed=3)
    m = transform_matrix(W, H, scale_x=0.9, scale_y=0.85, offset_x=0.03, offset_y=-0.02)
    bk = bucket_of(m)
    mj = jnp.asarray(m)
    o4 = np.asarray(make_warp_program(H, W, bk, interpret=True)(a, mj))
    o3 = np.asarray(make_warp_program(H, W, bk, interpret=True, n_ch=3)(a[:3], mj))
    np.testing.assert_array_equal(o4[:3], o3)
    wy, wx = warp_alpha_vectors(H, W, mj)
    alpha = np.asarray(wy)[:, None] * np.asarray(wx)[None, :]
    # kernel alpha rides the bf16 hi/lo dots: the family's ~2^-17 class
    assert np.abs(o4[3] - alpha).max() <= 5e-5

    mix = jnp.float32(0.37)
    q4 = np.asarray(make_warp_pair_program(H, W, bk, True, interpret=True)(a, b, mj, mj, mix))
    q3 = np.asarray(
        make_warp_pair_program(H, W, bk, True, interpret=True, n_ch=3)(
            a[:3], b[:3], mj, mj, mix
        )
    )
    np.testing.assert_array_equal(q4[:3], q3)
    assert np.abs(q4[3] - alpha).max() <= 5e-5


def test_combine_rgb_matches_combine():
    rng = np.random.default_rng(11)
    base = jnp.asarray(rng.random((4, H, W), dtype=np.float32))
    rgb = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    wy = jnp.asarray(rng.random((H,), dtype=np.float32))
    wx = jnp.asarray(rng.random((W,), dtype=np.float32))
    rgba = jnp.concatenate([rgb, (wy[:, None] * wx[None, :])[None]], axis=0)
    want = np.asarray(combine([jnp.zeros((4, H, W)), base, rgba]))[:3]
    got = np.asarray(combine_rgb([base, (rgb, wy, wx)]))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pack3_bit_equal():
    from phaneron_tpu.ops.pallas_kernels import make_v210_pack_rgba

    (frame,) = _opaque_frames(1, w=384, h=16, seed=7)
    p4 = np.asarray(make_v210_pack_rgba(384, 16, interpret=True)(frame))
    p3 = np.asarray(
        make_v210_pack_rgba(384, 16, interpret=True, channels=3)(frame[:3])
    )
    np.testing.assert_array_equal(p4, p3)


def test_combine_pack_mixed_layer_chs():
    from phaneron_tpu.ops.pallas_kernels import (
        combine_pack_fits,
        make_v210_combine_pack,
    )

    w, h = 3840, 16
    assert combine_pack_fits(w, h, 2)
    bottom, top = _opaque_frames(2, w=w, h=h, seed=9)
    rng = np.random.default_rng(10)
    wy = jnp.asarray(rng.random((h,), dtype=np.float32))
    wx = jnp.asarray(rng.random((w,), dtype=np.float32))
    top4 = jnp.concatenate(
        [top[:3], (wy[:, None] * wx[None, :])[None]], axis=0
    )
    want = np.asarray(make_v210_combine_pack(w, h, 2, interpret=True)([bottom, top4]))
    got = np.asarray(
        make_v210_combine_pack(w, h, 2, interpret=True, layer_chs=(4, 3))(
            [bottom, (top[:3], wy, wx)]
        )
    )
    v210 = get_format("v210")
    yw, uw, vw = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(want)], w, h))
    yg, ug, vg = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(got)], w, h))
    worst = max(
        np.abs(a.astype(int) - b.astype(int)).max()
        for a, b in ((yg, yw), (ug, uw), (vg, vw))
    )
    assert worst <= 1


@pytest.mark.parametrize("transition", ["none", "dissolve"])
def test_interlaced_channel_rgb3_vs_rgb4(transition):
    """Full channel program: 3-channel opaque rings vs 4-channel rings
    -> packed v210 within 1 code (f32 outer alpha vs bf16 dot alpha)."""
    v210 = get_format("v210")
    rng = np.random.default_rng(21)

    def ring_words(k):
        words = np.asarray(v210.fill_buf(W, H)[0]).copy()
        words[:] = rng.integers(0, 2**30, size=words.shape, dtype=np.uint32)
        return np.asarray(host_split(v210, [words])[0])

    from phaneron_tpu.graph.pipeline import make_unpack_program

    up4 = make_unpack_program("v210", W, H, "709", "709")
    up3 = make_unpack_program("v210", W, H, "709", "709", channels=3)
    n_rings = 2 if transition == "dissolve" else 1
    rings4, rings3 = [], []
    for s in range(n_rings):
        planes = [jnp.asarray(ring_words(3 * s + a)) for a in range(3)]
        rings4.append(tuple(jax.block_until_ready(up4([p])) for p in planes))
        rings3.append(tuple(jax.block_until_ready(up3([p])) for p in planes))
        for r4, r3 in zip(rings4[-1], rings3[-1]):
            np.testing.assert_array_equal(np.asarray(r4)[:3], np.asarray(r3))

    m = transform_matrix(W, H, scale_x=0.9, scale_y=0.9, offset_x=0.02)
    layer = LayerSpec(
        "rgba_f32", transition=transition, has_transform=True,
        axis_aligned=True, deinterlace=True, warp_bucket=bucket_of(m),
        src_b_format="rgba_f32" if transition == "dissolve" else None,
        src_opaque=True,
    )
    spec = ChannelSpec(W, H, "v210", layers=(layer,), pallas_stages=True)
    prog = make_channel_program(spec)

    def params(rings):
        p = {
            "src_ring": rings[0],
            "parity": jnp.int32(0),
            "matrix": jnp.asarray(m),
        }
        if transition == "dissolve":
            p["src_b_ring"] = rings[1]
            p["mix"] = jnp.float32(0.42)
        return {"layers": [p]}

    want = np.asarray(prog(params(rings4))[0])
    got = np.asarray(prog(params(rings3))[0])
    yw, uw, vw = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(want)], W, H))
    yg, ug, vg = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(got)], W, H))
    worst = max(
        np.abs(a.astype(int) - b.astype(int)).max()
        for a, b in ((yg, yw), (ug, uw), (vg, vw))
    )
    assert worst <= 1
