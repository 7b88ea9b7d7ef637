"""Geometry: transform matrix construction, warp paths, resize
(reference transform.ts / resize.ts)."""

import jax.numpy as jnp
import numpy as np
import pytest

from phaneron_tpu.ops.geometry import (
    flip_vals,
    is_axis_aligned,
    resize_frame,
    transform_matrix,
    warp_affine,
    warp_axis_aligned,
)


def rand_frame(rng, h=16, w=32):
    return jnp.asarray(rng.random((4, h, w), dtype=np.float32))


def test_default_matrix_is_identity():
    m = transform_matrix(64, 32)
    assert np.allclose(m, np.eye(3), atol=1e-6)
    assert is_axis_aligned(m)


def test_rotation_not_axis_aligned():
    m = transform_matrix(64, 32, rotate=0.125)
    assert not is_axis_aligned(m)


def test_identity_warp_half_pixel_sampling():
    """The reference samples at x/w (pixel left edge), i.e. the average
    of the 2x2 neighbourhood up-left — reproduce exactly
    (transform.ts:54-57 + OpenCL CLK_FILTER_LINEAR semantics)."""
    rng = np.random.default_rng(1)
    src = rand_frame(rng)
    out = np.asarray(warp_affine(src, jnp.eye(3)))
    p = np.asarray(src)
    padded = np.pad(p, ((0, 0), (1, 0), (1, 0)))  # border zero up-left
    expected = (
        padded[:, :-1, :-1] + padded[:, :-1, 1:] + padded[:, 1:, :-1] + padded[:, 1:, 1:]
    ) / 4.0
    assert np.allclose(out, expected, atol=1e-6)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(scale_x=0.5, scale_y=0.5),
        dict(offset_x=0.25, offset_y=-0.1),
        dict(flip_h=True),
        dict(flip_v=True, scale_x=2.0),
        dict(anchor_x=0.3, anchor_y=-0.2, scale_x=1.5, scale_y=0.8, offset_x=0.1),
    ],
)
def test_axis_aligned_matmul_path_matches_gather(kwargs):
    rng = np.random.default_rng(2)
    src = rand_frame(rng, h=24, w=48)
    m = jnp.asarray(transform_matrix(48, 24, **kwargs))
    ref = np.asarray(warp_affine(src, m))
    fast = np.asarray(warp_axis_aligned(src, m))
    assert np.allclose(fast, ref, atol=1e-5)


def test_rotated_warp_preserves_energy_roughly():
    rng = np.random.default_rng(3)
    src = rand_frame(rng, h=32, w=32)
    m = jnp.asarray(transform_matrix(32, 32, rotate=0.25))  # 90 degrees
    out = np.asarray(warp_affine(src, m))
    assert out.shape == src.shape
    assert np.isfinite(out).all()
    # centre pixel neighbourhood should carry signal
    assert out[:, 16, 16].sum() > 0


def test_resize_identity_matches_transform_identity():
    rng = np.random.default_rng(4)
    src = rand_frame(rng)
    out_r = np.asarray(resize_frame(src, 16, 32))
    out_t = np.asarray(warp_affine(src, jnp.eye(3)))
    assert np.allclose(out_r, out_t, atol=1e-6)


def test_resize_upscale_shapes():
    rng = np.random.default_rng(5)
    src = rand_frame(rng, h=16, w=32)
    out = np.asarray(resize_frame(src, 32, 64, scale=1.0))
    assert out.shape == (4, 32, 64)
    assert np.isfinite(out).all()


def test_resize_flip_h():
    rng = np.random.default_rng(6)
    src = rand_frame(rng, h=8, w=16)
    flipped = np.asarray(
        resize_frame(src, 8, 16, flip=jnp.asarray(flip_vals(True, False)))
    )
    # flipping twice returns the same as never flipping (both sample at
    # mirrored positions); compare against numpy mirror of the unflipped
    base = np.asarray(resize_frame(src, 8, 16))
    # sampling positions mirror around the centre; allow edge effects
    assert np.allclose(flipped[:, :, 1:], base[:, :, ::-1][:, :, :-1], atol=1e-5)
