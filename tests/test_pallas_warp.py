"""Pallas DVE warp kernel vs the gather formulation.  The row pass is
f32-exact; the column pass runs hi/lo-split bf16 MXU passes carrying
~2^-17 relative error — packed codes match the XLA path to <=1 code."""

import jax.numpy as jnp
import numpy as np
import pytest

from phaneron_tpu.graph.pipeline import ChannelSpec, LayerSpec, make_channel_program
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.ops.geometry import transform_matrix, warp_axis_aligned
from phaneron_tpu.ops.pallas_warp import bucket_of, make_warp_program

H, W = 64, 256


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(scale_x=0.9, scale_y=0.9, offset_x=0.02),
        dict(scale_x=0.5, scale_y=2.0, offset_y=-0.1),
        dict(flip_h=True, scale_x=1.3),
        dict(flip_v=True),
        dict(anchor_x=0.3, scale_x=1.5, scale_y=0.7, offset_y=0.1),
        dict(scale_x=0.26, scale_y=0.26),  # bucket 2 (|m| just under 4)
        dict(),
    ],
)
def test_warp_matches_gather(kwargs):
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.random((4, H, W), dtype=np.float32))
    m = transform_matrix(W, H, **kwargs)
    bucket = bucket_of(m)
    assert bucket >= 0
    ref = np.asarray(warp_axis_aligned(src, jnp.asarray(m)))
    out = np.asarray(make_warp_program(H, W, bucket, interpret=True)(src, jnp.asarray(m)))
    # hi/lo bf16 split residual + FMA formation ulps in fx/fy
    assert np.abs(ref - out).max() <= 5e-5


def test_every_bucket_geometry():
    """Exhaustive per-bucket window coverage: extreme offsets push the
    row/col windows against both borders."""
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.random((4, H, W), dtype=np.float32))
    for scale, bucket in ((1.5, 0), (0.92, 1), (0.85, 2), (0.6, 3), (0.27, 4)):
        for off in (-0.4, 0.0, 0.4):
            m = transform_matrix(W, H, scale_x=scale, scale_y=scale, offset_x=off, offset_y=-off)
            assert bucket_of(m) == bucket
            ref = np.asarray(warp_axis_aligned(src, jnp.asarray(m)))
            out = np.asarray(
                make_warp_program(H, W, bucket, interpret=True)(src, jnp.asarray(m))
            )
            assert np.abs(ref - out).max() <= 5e-5, (scale, off)


@pytest.mark.parametrize("cchunk", [256, 384])
def test_warp_cchunk_bit_equals_128(cchunk):
    """Wider column chunks (the alignment-slack amortisation knob) are
    BIT-IDENTICAL to the 128-chunk kernel: the extra window lanes carry
    exact-zero one-hot weights, and the dots accumulate in f32."""
    from phaneron_tpu.ops.pallas_warp import make_warp_pair_program

    w, h = 768, 64
    rng = np.random.default_rng(11)
    src = jnp.asarray(rng.random((4, h, w), dtype=np.float32))
    src_b = jnp.asarray(rng.random((4, h, w), dtype=np.float32))
    m = transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.03)
    bucket = bucket_of(m)
    mj = jnp.asarray(m)
    base = np.asarray(
        make_warp_program(h, w, bucket, interpret=True, cchunk=128)(src, mj)
    )
    out = np.asarray(
        make_warp_program(h, w, bucket, interpret=True, cchunk=cchunk)(src, mj)
    )
    assert np.array_equal(base, out)
    # pair kernel too (the interlaced default load's per-layer op)
    mix = 0.35
    basep = np.asarray(
        make_warp_pair_program(h, w, bucket, interpret=True, cchunk=128)(
            src, src_b, mj, mj, mix
        )
    )
    outp = np.asarray(
        make_warp_pair_program(h, w, bucket, interpret=True, cchunk=cchunk)(
            src, src_b, mj, mj, mix
        )
    )
    assert np.array_equal(basep, outp)


def test_bucket_bounds():
    assert bucket_of(transform_matrix(W, H, rotate=0.1)) == -1  # rotation
    assert bucket_of(transform_matrix(W, H, scale_y=0.1)) == -1  # |m11|=10
    assert bucket_of(transform_matrix(W, H, scale_y=0.25)) == 4  # |m11|=4
    assert bucket_of(transform_matrix(W, H, scale_y=0.9)) == 1  # the common fill
    assert bucket_of(transform_matrix(W, H, scale_y=0.6)) == 3
    assert bucket_of(transform_matrix(W, H)) == 0
    # joint bucket over transition matrices takes the widest span
    assert bucket_of(transform_matrix(W, H), transform_matrix(W, H, scale_y=0.5)) == 3


def test_channel_program_uses_warp_kernel():
    w, h = 128, 32
    v210 = get_format("v210")
    src = np.asarray(v210.fill_buf(w, h)[0])
    m = transform_matrix(w, h, scale_x=0.8, scale_y=0.8)
    layer = LayerSpec(
        "v210", has_transform=True, axis_aligned=True, warp_bucket=bucket_of(m)
    )
    spec = ChannelSpec(w, h, "v210", layers=(layer,), pallas_stages=True)
    base = spec._replace(pallas_stages=False, layers=(layer._replace(warp_bucket=-1),))
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


@pytest.mark.parametrize("same_mat", [True, False])
def test_warp_pair_matches_two_warps_plus_mix(same_mat):
    """The fused dissolve pair kernel must equal warp(a)*mix +
    warp(b)*(1-mix) computed with two single-source kernels."""
    from phaneron_tpu.ops.pallas_warp import make_warp_pair_program

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.random((4, H, W), dtype=np.float32))
    b = jnp.asarray(rng.random((4, H, W), dtype=np.float32))
    ma = transform_matrix(W, H, scale_x=0.9, scale_y=0.8, offset_x=0.05)
    mb = ma if same_mat else transform_matrix(W, H, scale_x=1.2, offset_y=-0.1)
    bucket = bucket_of(ma, mb)
    mix = 0.3
    single = make_warp_program(H, W, bucket, interpret=True)
    want = np.asarray(single(a, jnp.asarray(ma))) * np.float32(mix) + np.asarray(
        single(b, jnp.asarray(mb))
    ) * np.float32(1.0 - mix)
    pair = make_warp_pair_program(H, W, bucket, same_mat=same_mat, interpret=True)
    got = np.asarray(
        pair(a, b, jnp.asarray(ma), jnp.asarray(mb), jnp.float32(mix))
    )
    # same_mat PREMIXES the windows (warp is linear in its source), so
    # the mixed values pass through one bf16 hi/lo split instead of two
    # — same ~2^-17 class as warp-vs-gather, not bit-identical order;
    # different matrices keep the two-pass arithmetic exactly
    tol = 5e-5 if same_mat else 1e-6
    assert np.abs(want - got).max() <= tol


def test_channel_program_uses_pair_kernel():
    """A dissolve+DVE layer routes through the fused pair kernel and
    matches the XLA path to <=1 packed code."""
    w, h = 128, 32
    v210 = get_format("v210")
    src = np.asarray(v210.fill_buf(w, h)[0])
    src_b = np.asarray(v210.fill_buf(w, h)[0])
    m = transform_matrix(w, h, scale_x=0.8, scale_y=0.8)
    layer = LayerSpec(
        "v210", transition="dissolve", src_b_format="v210",
        has_transform=True, axis_aligned=True, warp_bucket=bucket_of(m),
    )
    spec = ChannelSpec(w, h, "v210", layers=(layer,), pallas_stages=True)
    base = spec._replace(pallas_stages=False, layers=(layer._replace(warp_bucket=-1),))
    params = {
        "layers": [
            {"src": [src], "src_b": [src_b], "matrix": jnp.asarray(m),
             "mix": jnp.float32(0.4)}
        ]
    }
    a = np.asarray(make_channel_program(spec)(params)[0])
    b = np.asarray(make_channel_program(base)(params)[0])
    ya, _, _ = v210.unpack_codes([jnp.asarray(a)], w, h)
    yb, _, _ = v210.unpack_codes([jnp.asarray(b)], w, h)
    assert np.abs(np.asarray(ya) - np.asarray(yb)).max() <= 1


@pytest.mark.parametrize("same_mat", [True, False])
def test_wipe_pair_matches_two_warps_plus_mask_blend(same_mat):
    """The fused wipe pair kernel must equal warp(a)*(1-m) + warp(b)*m
    computed with two single-source kernels + an elementwise blend."""
    from phaneron_tpu.ops.pallas_warp import make_wipe_pair_program

    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.random((4, H, W), dtype=np.float32))
    b = jnp.asarray(rng.random((4, H, W), dtype=np.float32))
    mask = jnp.asarray(rng.random((H, W), dtype=np.float32))
    ma = transform_matrix(W, H, scale_x=0.9, scale_y=0.8, offset_x=0.05)
    mb = ma if same_mat else transform_matrix(W, H, scale_x=1.2, offset_y=-0.1)
    bucket = bucket_of(ma, mb)
    single = make_warp_program(H, W, bucket, interpret=True)
    m = np.asarray(mask)
    want = np.asarray(single(a, jnp.asarray(ma))) * (1.0 - m) + np.asarray(
        single(b, jnp.asarray(mb))
    ) * m
    pair = make_wipe_pair_program(H, W, bucket, same_mat=same_mat, interpret=True)
    got = np.asarray(pair(a, b, jnp.asarray(ma), jnp.asarray(mb), mask))
    assert np.abs(want - got).max() <= 1e-6


def test_channel_program_uses_wipe_pair_kernel():
    """A wipe+DVE layer routes through the fused wipe pair kernel and
    matches the XLA path to <=1 packed code."""
    w, h = 128, 32
    v210 = get_format("v210")
    src = np.asarray(v210.fill_buf(w, h)[0])
    src_b = np.asarray(v210.fill_buf(w, h)[0])
    mask_words = np.asarray(v210.fill_buf(w, h)[0])  # luma ramp -> varying mask
    m = transform_matrix(w, h, scale_x=0.8, scale_y=0.8)
    layer = LayerSpec(
        "v210", transition="wipe", src_b_format="v210", mask_format="v210",
        has_transform=True, axis_aligned=True, warp_bucket=bucket_of(m),
    )
    spec = ChannelSpec(w, h, "v210", layers=(layer,), pallas_stages=True)
    base = spec._replace(pallas_stages=False, layers=(layer._replace(warp_bucket=-1),))
    params = {
        "layers": [
            {"src": [src], "src_b": [src_b], "mask": [mask_words],
             "matrix": jnp.asarray(m)}
        ]
    }
    a = np.asarray(make_channel_program(spec)(params)[0])
    b = np.asarray(make_channel_program(base)(params)[0])
    ya, _, _ = v210.unpack_codes([jnp.asarray(a)], w, h)
    yb, _, _ = v210.unpack_codes([jnp.asarray(b)], w, h)
    assert np.abs(np.asarray(ya) - np.asarray(yb)).max() <= 1


def test_vmem_budget_all_formats_all_buckets():
    """Every served geometry x bucket must yield a warp config whose
    scratch fits the VMEM budget (8K x strong-minification used to
    overflow in the non-persistent fallback), or be reported unfit so
    the pipeline falls back to the XLA gather."""
    from phaneron_tpu.ops.pallas_warp import (
        BUCKET_BOUNDS,
        VMEM_BUDGET,
        _config,
        warp_fits,
    )

    for h, w in ((720, 1280), (1080, 1920), (2160, 3840), (4320, 7680)):
        for bucket in range(len(BUCKET_BOUNDS)):
            for n_mat in (1, 2):
                assert warp_fits(h, w, bucket, n_mat), (h, w, bucket, n_mat)
                cfg = _config(h, w, bucket, n_mat)
                n_chunks = w // 128
                win = 4 * cfg.win_r * w * 4
                win2 = 4 * 2 * cfg.win_r * w * 2
                rows = 2 * 4 * cfg.rpb * w * 2
                out = 2 * 4 * cfg.rpb * w * 4
                flat = 2 * 4 * cfg.rpb * cfg.win_c * 2
                slots = n_mat * n_chunks if cfg.persist_cw else 1
                cw = slots * 2 * cfg.win_c * 128 * 2
                assert win + win2 + rows + out + flat + cw <= VMEM_BUDGET
                # the wipe variant adds a double-buffered mask block and
                # must still fit (or honestly report unfit)
                assert warp_fits(h, w, bucket, n_mat, with_mask=True), (
                    h, w, bucket, n_mat,
                )
    assert not warp_fits(64, 256, -1)


def test_layers_combine_program_matches_staged(monkeypatch):
    """All-layers warp+combine (one launch) vs the per-layer XLA path:
    end-to-end packed output within <=1 code (pair-warp error class).
    The path is gated OFF in production (see ENABLE_LAYERS_COMBINE);
    this keeps the kernel correct for future use."""
    from phaneron_tpu.graph import pipeline as pl_mod
    from phaneron_tpu.graph.pipeline import _layers_combine_ok

    monkeypatch.setattr(pl_mod, "ENABLE_LAYERS_COMBINE", True)

    w, h = 256, 64
    v210 = get_format("v210")
    srcs = [
        np.roll(np.asarray(v210.fill_buf(w, h)[0]), 3 * k, axis=0) for k in range(5)
    ]
    mats = [
        transform_matrix(w, h, scale_x=s, scale_y=s, offset_x=0.01 * i)
        for i, s in enumerate((0.9, 1.1, 0.85))
    ]
    bucket = bucket_of(*mats)
    dis = LayerSpec(
        "v210", transition="dissolve", src_b_format="v210",
        has_transform=True, axis_aligned=True, warp_bucket=bucket,
    )
    cut = LayerSpec("v210", has_transform=True, axis_aligned=True, warp_bucket=bucket)
    spec = ChannelSpec(w, h, "v210", layers=(dis, cut, dis), pallas_stages=True)
    assert _layers_combine_ok(spec)
    base = spec._replace(
        pallas_stages=False,
        layers=tuple(l._replace(warp_bucket=-1) for l in spec.layers),
    )
    params = {
        "layers": [
            {"src": [srcs[0]], "src_b": [srcs[1]], "matrix": jnp.asarray(mats[0]),
             "mix": jnp.float32(0.35)},
            {"src": [srcs[2]], "matrix": jnp.asarray(mats[1])},
            {"src": [srcs[3]], "src_b": [srcs[4]], "matrix": jnp.asarray(mats[2]),
             "mix": jnp.float32(0.75)},
        ]
    }
    a = np.asarray(make_channel_program(spec)(params)[0])
    b = np.asarray(make_channel_program(base)(params)[0])
    for qa, qb in zip(
        v210.unpack_codes([jnp.asarray(a)], w, h),
        v210.unpack_codes([jnp.asarray(b)], w, h),
    ):
        d = np.abs(np.asarray(qa).astype(int) - np.asarray(qb).astype(int))
        assert d.max() <= 1, d.max()
