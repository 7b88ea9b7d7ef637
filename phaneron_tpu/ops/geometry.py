"""Geometric transforms: 2-D DVE (anchor/fill/rotate/flip) and resize.

The reference implements these as OpenCL image samplers with normalized
coordinates, bilinear filtering and transparent-black borders
(transform.ts:26-59, resize.ts:24-60).  Here:

- the 3x3 homogeneous matrix is built host-side exactly as the
  reference does (transform.ts:119-175) and fed to the jitted program
  as a traced argument — animating DVE params never recompiles;
- axis-aligned warps (no rotation) run as separable row/column
  gather+lerp passes — memory-bound on TPU;
- general (rotated) warps fall back to a 2-D gather.

Both paths share identical index/weight math; tests assert they agree.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "transform_matrix",
    "is_axis_aligned",
    "warp_affine",
    "warp_axis_aligned",
    "resize_frame",
    "flip_vals",
]


# ----------------------------------------------------------- host-side


def transform_matrix(
    width: int,
    height: int,
    flip_h: bool = False,
    flip_v: bool = False,
    anchor_x: float = 0.0,
    anchor_y: float = 0.0,
    scale_x: float = 1.0,
    scale_y: float = 1.0,
    offset_x: float = 0.0,
    offset_y: float = 0.0,
    rotate: float = 0.0,
) -> np.ndarray:
    """Build the 3x3 output->input mapping matrix (transform.ts:119-175).

    ``rotate`` is in turns (the reference multiplies by 2*pi).  The
    matrix maps centred normalized output coords (x/w-0.5, y/h-0.5, 1)
    to centred normalized input coords; the sampler adds back 0.5.
    """
    aspect = width / height
    fx = -1.0 if flip_h else 1.0
    fy = -1.0 if flip_v else 1.0
    sx = scale_x * fx
    sy = scale_y * fy
    rot = rotate * 2.0 * math.pi

    anchor_in = np.array(
        [[1, 0, anchor_x], [0, 1, anchor_y], [0, 0, 1]], dtype=np.float64
    )
    scale_m = np.array(
        [[1.0 / (sx * aspect), 0, 0], [0, 1.0 / sy, 0], [0, 0, 1]], dtype=np.float64
    )
    rot_m = np.array(
        [
            [math.cos(rot), -math.sin(rot), 0],
            [math.sin(rot), math.cos(rot), 0],
            [0, 0, 1],
        ],
        dtype=np.float64,
    )
    translate = np.array(
        [[1, 0, offset_x * aspect], [0, 1, offset_y], [0, 0, 1]], dtype=np.float64
    )
    anchor_out = np.array(
        [[1, 0, -anchor_x * aspect], [0, 1, -anchor_y], [0, 0, 1]], dtype=np.float64
    )
    project = np.array([[aspect, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64)

    m = anchor_in @ scale_m @ rot_m @ translate @ anchor_out @ project
    return m.astype(np.float32)


def is_axis_aligned(mat: np.ndarray, eps: float = 1e-12) -> bool:
    """True when the warp has no rotation/shear term, enabling the
    separable fast path.  Host-side (static bucketing) decision."""
    return abs(float(mat[0, 1])) <= eps and abs(float(mat[1, 0])) <= eps


def flip_vals(flip_h: bool, flip_v: bool) -> np.ndarray:
    """The resize kernel's 4-float flip buffer (resize.ts:85-90)."""
    return np.array(
        [
            1.0 if flip_h else 0.0,
            -1.0 if flip_h else 1.0,
            1.0 if flip_v else 0.0,
            -1.0 if flip_v else 1.0,
        ],
        dtype=np.float32,
    )


# --------------------------------------------------------- device-side


def _bilinear_setup(pos: jnp.ndarray, size: int):
    """Normalized coords -> (i0, frac) per OpenCL CLK_FILTER_LINEAR:
    u = pos*size - 0.5; texels floor(u), floor(u)+1 with weight frac."""
    u = pos * size - 0.5
    i0 = jnp.floor(u)
    frac = u - i0
    return i0.astype(jnp.int32), frac.astype(jnp.float32)


def _gather2d(src: jnp.ndarray, xi: jnp.ndarray, yi: jnp.ndarray) -> jnp.ndarray:
    """Border-zero 2-D texel fetch from (4, H, W) at integer coords."""
    h, w = src.shape[-2], src.shape[-1]
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
    flat = src.reshape(src.shape[0], -1)
    vals = jnp.take(flat, idx.reshape(-1), axis=1).reshape(src.shape[0], *idx.shape)
    return vals * valid[None].astype(src.dtype)


def _sample_bilinear(src: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of (4, H, W) at normalized coords grids (Ho, Wo),
    transparent-black border (CLK_ADDRESS_CLAMP)."""
    h, w = src.shape[-2], src.shape[-1]
    x0, fx = _bilinear_setup(px, w)
    y0, fy = _bilinear_setup(py, h)
    v00 = _gather2d(src, x0, y0)
    v10 = _gather2d(src, x0 + 1, y0)
    v01 = _gather2d(src, x0, y0 + 1)
    v11 = _gather2d(src, x0 + 1, y0 + 1)
    fx = fx[None]
    fy = fy[None]
    top = v00 * (1.0 - fx) + v10 * fx
    bot = v01 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def _out_grid(height: int, width: int):
    ix = (jnp.arange(width, dtype=jnp.float32) / width) - 0.5
    iy = (jnp.arange(height, dtype=jnp.float32) / height) - 0.5
    return ix[None, :], iy[:, None]


def warp_affine(src: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """General DVE warp (transform.ts:36-59): output pixel (x, y) samples
    input at mat @ (x/w-0.5, y/h-0.5, 1) + 0.5, bilinear, border 0."""
    h, w = src.shape[-2], src.shape[-1]
    ix, iy = _out_grid(h, w)
    px = mat[0, 0] * ix + mat[0, 1] * iy + mat[0, 2] + 0.5
    py = mat[1, 0] * ix + mat[1, 1] * iy + mat[1, 2] + 0.5
    px, py = jnp.broadcast_to(px, (h, w)), jnp.broadcast_to(py, (h, w))
    return _sample_bilinear(src, px, py)


def _interp_1d(src: jnp.ndarray, pos: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Bilinear interpolation along one axis via two gathers + lerp,
    border-zero.  On TPU this is memory-bound (~1.4 ms per 1080p warp)
    and beats both the dense interpolation-matrix MXU formulation
    (~1.8 ms + one-hot churn) and the full 2-D gather (minutes to
    compile at HD)."""
    size = src.shape[axis]
    i0, frac = _bilinear_setup(pos, size)

    def shape1(x):
        expand = [None] * src.ndim
        expand[axis] = slice(None)
        return x[tuple(expand)]

    def tap(idx):
        valid = shape1(jnp.where((idx >= 0) & (idx < size), 1.0, 0.0))
        return jnp.take(src, jnp.clip(idx, 0, size - 1), axis=axis) * valid

    f = shape1(frac)
    return tap(i0) * (1.0 - f) + tap(i0 + 1) * f


def warp_axis_aligned(src: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned warp (scale/translate/flip — the common broadcast
    'fill' case, mat[0,1] == mat[1,0] == 0) as separable row/column
    interpolation.  Identical indices and weights to warp_affine."""
    h, w = src.shape[-2], src.shape[-1]
    ix = (jnp.arange(w, dtype=jnp.float32) / w) - 0.5
    iy = (jnp.arange(h, dtype=jnp.float32) / h) - 0.5
    px = mat[0, 0] * ix + mat[0, 2] + 0.5  # (W,)
    py = mat[1, 1] * iy + mat[1, 2] + 0.5  # (H,)
    rows = _interp_1d(src, py, axis=1)
    return _interp_1d(rows, px, axis=2)


def resize_frame(
    src: jnp.ndarray,
    out_height: int,
    out_width: int,
    scale: jnp.ndarray | float = 1.0,
    offset_x: jnp.ndarray | float = 0.0,
    offset_y: jnp.ndarray | float = 0.0,
    flip: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Resize/scale/flip (resize.ts:35-59): posIn = inPos * mul + off with
    mul/off from scale, offsets and the 4-float flip buffer.

    The map is axis-aligned by construction, so the sample runs as two
    SEPARABLE 1-D passes (horizontal then vertical — the same lerp
    order as the 2-D sampler, hence identical arithmetic) instead of a
    pointwise 2-D gather, which is orders of magnitude slower on TPU.
    This is the hot path for stretch-fitting sources whose geometry
    differs from the channel (pipeline._unpack src_size)."""
    if flip is None:
        flip = jnp.asarray(flip_vals(False, False))
    scale = jnp.asarray(scale, dtype=jnp.float32)
    offset_x = jnp.asarray(offset_x, dtype=jnp.float32)
    offset_y = jnp.asarray(offset_y, dtype=jnp.float32)

    ix = jnp.arange(out_width, dtype=jnp.float32) / out_width
    iy = jnp.arange(out_height, dtype=jnp.float32) / out_height
    centre_x = (-0.5 - offset_x) / scale + 0.5
    centre_y = (-0.5 - offset_y) / scale + 0.5
    off_x = centre_x * flip[1] + flip[0]
    off_y = centre_y * flip[3] + flip[2]
    px = ix * (flip[1] / scale) + off_x  # (W_out,)
    py = iy * (flip[3] / scale) + off_y  # (H_out,)
    cols = _interp_1d(src, px, axis=2)
    return _interp_1d(cols, py, axis=1)
