"""Two-pass shear rotation kernel vs the direct bilinear gather.

The decomposition reproduces the affine GEOMETRY exactly and each pass
performs a true single lerp (3-tap carry); the only deviation from the
direct sampler is px evaluated at integer y' taps — visible solely at
content step edges.  Tests bound that difference away from edges and
check degenerate cases tightly."""

import jax.numpy as jnp
import numpy as np
import pytest

from phaneron_tpu.ops.geometry import transform_matrix, warp_affine
from phaneron_tpu.ops.pallas_rotate import (
    make_rotate_program,
    rot_bucket_of,
    rotate_fits,
)

W, H = 256, 64


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    chans = [
        0.5 + 0.4 * np.sin(2 * np.pi * (x / w + 0.7 * y / h)),
        0.5 + 0.3 * np.cos(2 * np.pi * (0.5 * x / w + 1.3 * y / h)),
        0.25 + 0.5 * (x / w) * (y / h),
        np.ones((h, w), np.float32),
    ]
    return jnp.asarray(np.stack(chans).astype(np.float32))


def _erode(mask, r):
    """Shrink a boolean mask by r pixels (both axes)."""
    out = mask.copy()
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            out &= np.roll(np.roll(mask, dy, 0), dx, 1)
    return out


def _run(mat, src):
    b = rot_bucket_of(np.asarray(mat), W, H)
    assert b >= 0 and rotate_fits(H, W, b)
    rot = make_rotate_program(H, W, b, interpret=True)
    return np.asarray(rot(src, jnp.asarray(mat)))


def test_axis_aligned_degenerate_matches_direct():
    """b == 0 on both passes -> identical taps to separable bilinear."""
    m = transform_matrix(W, H, scale_x=0.9, scale_y=1.1, offset_x=0.03)
    src = _smooth(H, W)
    got = _run(m, src)
    want = np.asarray(warp_affine(src, jnp.asarray(m)))
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()


@pytest.mark.parametrize("rot,scale", [(0.01, 0.9), (-0.025, 1.0), (0.05, 0.8)])  # turns
def test_rotation_close_to_direct_on_smooth_content(rot, scale):
    m = transform_matrix(W, H, rotate=rot, scale_x=scale, scale_y=scale)
    src = _smooth(H, W)
    got = _run(m, src)
    want = np.asarray(warp_affine(src, jnp.asarray(m)))
    gi, wi = got[:, 4:-4, 8:-8], want[:, 4:-4, 8:-8]
    rms = float(np.sqrt(np.mean((gi - wi) ** 2)))
    assert rms < 2e-3, rms
    # pointwise max away from the rotated frame boundary: the passes
    # evaluate px at the two integer y' taps, which differs from the
    # direct sampler by <=1 texel exactly AT the content step edge
    interior = _erode(want[3] > 0.999, 2)[4:-4, 8:-8]
    err = np.abs(gi - wi).max(axis=0)
    assert float(err[interior].max()) < 0.01, err[interior].max()


def test_impulse_geometry_matches_direct():
    """The energy of a rotated impulse lands at the same place as the
    direct gather puts it (geometric exactness of the decomposition)."""
    m = transform_matrix(W, H, rotate=0.03, scale_x=0.95, scale_y=0.95)
    src = np.zeros((4, H, W), np.float32)
    src[:, H // 2 + 7, W // 2 - 11] = 1.0
    got = _run(m, jnp.asarray(src))
    want = np.asarray(warp_affine(jnp.asarray(src), jnp.asarray(m)))
    gp = np.unravel_index(np.argmax(got[0]), got[0].shape)
    wp = np.unravel_index(np.argmax(want[0]), want[0].shape)
    assert abs(gp[0] - wp[0]) <= 1 and abs(gp[1] - wp[1]) <= 1, (gp, wp)
    assert abs(got[0].sum() - want[0].sum()) < 0.05  # energy preserved


def test_border_transparent_black():
    m = transform_matrix(W, H, rotate=0.04, scale_x=1.0, scale_y=1.0)
    src = jnp.ones((4, H, W), jnp.float32)
    got = _run(m, src)
    want = np.asarray(warp_affine(src, jnp.asarray(m)))
    inside = _erode(want[0] > 0.999, 2)
    outside = _erode(want[0] < 1e-3, 2)
    assert np.all(np.abs(got[0][inside] - 1.0) < 1e-3)
    assert np.all(np.abs(got[0][outside]) < 1e-3)


def test_bucket_gating():
    ok = transform_matrix(W, H, rotate=0.02)
    assert rot_bucket_of(np.asarray(ok), W, H) >= 0
    # 90 degrees: quarter-turn composition (code encodes quarter 1 or 3)
    ninety = transform_matrix(W, H, rotate=0.25)  # turns
    code = rot_bucket_of(np.asarray(ninety), W, H)
    assert code >= 0 and (code // 8) % 2 == 1
    # axis-aligned matrices are also coverable (degenerate b = 0)
    aa = transform_matrix(W, H, scale_x=0.9)
    assert rot_bucket_of(np.asarray(aa), W, H) >= 0


@pytest.mark.parametrize("angle_deg", list(range(0, 360, 15)))
def test_full_revolution_always_covered(angle_deg):
    """Every angle of a full revolution lands in a valid quarter+bucket
    (the reference sampler's uniform-cost rotation, transform.ts:26-29)
    and fits the pass geometry."""
    m = transform_matrix(W, H, rotate=angle_deg / 360.0, scale_x=0.9, scale_y=0.9)
    code = rot_bucket_of(np.asarray(m), W, H)
    assert code >= 0, angle_deg
    assert rotate_fits(H, W, code), angle_deg


@pytest.mark.parametrize(
    "angle_deg", [45, 90, 117, 180, 222, 270, 303]
)
def test_large_angle_matches_direct_gather(angle_deg):
    """Quarter-turn + shear residual vs the direct bilinear gather at
    angles across the revolution, including the exact quarter turns."""
    m = transform_matrix(
        W, H, rotate=angle_deg / 360.0, scale_x=0.85, scale_y=0.85
    )
    src = _smooth(H, W)
    got = _run(m, src)
    want = np.asarray(warp_affine(src, jnp.asarray(m)))
    gi, wi = got[:, 4:-4, 8:-8], want[:, 4:-4, 8:-8]
    # the rotated frame BORDER is a content step edge — exactly where
    # the documented y'-tap deviation concentrates (<=1 texel of
    # geometric shift).  Measure RMS on the interior and near-zero on
    # the far exterior; the transition band is excluded by erosion.
    interior = _erode(want[3] > 0.999, 2)[4:-4, 8:-8]
    exterior = _erode(want[3] < 1e-3, 2)[4:-4, 8:-8]
    err = np.abs(gi - wi).max(axis=0)
    if interior.any():
        rms = float(np.sqrt(np.mean((gi - wi)[:, interior] ** 2)))
        assert rms < 2e-3, (angle_deg, rms)
        assert float(err[interior].max()) < 0.03, (angle_deg, err[interior].max())
    if exterior.any():
        assert float(err[exterior].max()) < 1e-3, (angle_deg, err[exterior].max())


def test_dissolve_pair_with_different_quarters():
    """A dissolve between a 30-degree and a 60-degree layer: the two
    matrices need DIFFERENT quarter turns at this aspect, so the layer
    carries per-source codes (rot_bucket / rot_bucket_b) and the
    channel program runs two rotate kernels — no gather fallback."""
    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        make_channel_program,
    )
    from phaneron_tpu.ops.formats import get_format

    w, h = 384, 64
    m1 = transform_matrix(w, h, rotate=30 / 360.0, scale_x=0.9, scale_y=0.9)
    m2 = transform_matrix(w, h, rotate=60 / 360.0, scale_x=0.9, scale_y=0.9)
    c1 = rot_bucket_of(np.asarray(m1), w, h)
    c2 = rot_bucket_of(np.asarray(m2), w, h)
    assert c1 >= 0 and c2 >= 0 and c1 // 8 != c2 // 8

    v210 = get_format("v210")
    src = np.asarray(v210.fill_buf(w, h)[0])
    src_b = np.roll(src, 7, axis=0)
    layer = LayerSpec(
        "v210", transition="dissolve", has_transform=True, axis_aligned=False,
        src_b_format="v210", rot_bucket=c1, rot_bucket_b=c2, warp_same_mat=False,
    )
    spec = ChannelSpec(w, h, "v210", layers=(layer,), pallas_stages=True)
    base = spec._replace(
        pallas_stages=False,
        layers=(layer._replace(rot_bucket=-1, rot_bucket_b=-1),),
    )
    params = {"layers": [{
        "src": [src], "src_b": [src_b],
        "matrix": jnp.asarray(m1), "matrix_b": jnp.asarray(m2),
        "mix": jnp.float32(0.6),
    }]}
    a = np.asarray(make_channel_program(spec)(params)[0])
    b = np.asarray(make_channel_program(base)(params)[0])
    ya, _, _ = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(a)], w, h))
    yb, _, _ = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(b)], w, h))
    dy = np.abs(ya.astype(int) - yb.astype(int))
    # at 30-60 degrees the rotated-border step band covers a visible
    # fraction of this tiny frame; routing correctness shows as the
    # overwhelming majority agreeing and a small mean (a wrong quarter
    # or matrix would differ almost everywhere)
    assert float((dy > 8).mean()) < 0.02, (dy > 8).mean()
    assert float(np.median(dy)) == 0
    assert float(dy.mean()) < 1.0, dy.mean()


def test_channel_program_routes_through_rotate_kernel():
    """A rotated layer on the Pallas path matches the XLA-gather path
    to <=1 packed code end to end (unpack->rotate->pack)."""
    from phaneron_tpu.graph.pipeline import (
        ChannelSpec,
        LayerSpec,
        make_channel_program,
    )
    from phaneron_tpu.ops.formats import get_format

    w, h = 384, 64
    v210 = get_format("v210")
    src = np.asarray(v210.fill_buf(w, h)[0])
    m = transform_matrix(w, h, rotate=0.01, scale_x=0.9, scale_y=0.9)
    rb = rot_bucket_of(np.asarray(m), w, h)
    assert rb >= 0
    layer = LayerSpec(
        "v210", has_transform=True, axis_aligned=False, rot_bucket=rb
    )
    spec = ChannelSpec(w, h, "v210", layers=(layer,), pallas_stages=True)
    base = spec._replace(
        pallas_stages=False, layers=(layer._replace(rot_bucket=-1),)
    )
    params = {"layers": [{"src": [src], "matrix": jnp.asarray(m)}]}
    a = np.asarray(make_channel_program(spec)(params)[0])
    b = np.asarray(make_channel_program(base)(params)[0])
    ya, ua, va = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(a)], w, h))
    yb, ub, vb = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(b)], w, h))
    # the decomposition's y'-tap evaluation differs from the direct
    # sampler only AT step edges; codes stay within a few counts on
    # nearly every pixel — bound the 99.9th percentile and the mean
    dy = np.abs(ya.astype(int) - yb.astype(int))
    assert float(np.percentile(dy, 99.9)) <= 4, np.percentile(dy, 99.9)
    assert float(dy.mean()) < 0.2, dy.mean()
