"""Rotated/sheared DVE warp as TWO separable Pallas passes.

MIXER ROTATION in the reference is an ordinary transform — the OpenCL
sampler reads at a rotated coordinate per pixel (transform.ts:119-175,
26-29).  A TPU has no texture sampler, and a per-pixel 2-D gather costs
~40 ms/frame at 1080p in XLA.  This module implements the classic
two-pass shear decomposition instead (each pass a 1-D resample the MXU
machinery can express):

    in-coords:  px = A00·x + A01·y + Cx ;  py = A10·x + A11·y + Cy
    pass H:     t(y, x)  = in(y, a·x + b·y + c)          (horizontal)
    pass V:     out(y,x) = t(A11·y + A10·x + Cy, x)      (vertical,
                run as pass H on the transposed intermediate)
    with  b = A01/A11,  a = A00 − A01·A10/A11,  c = Cx − b·Cy
    (requires |A11| bounded away from 0 — rotations beyond ±60° fall
    back to the XLA gather; the reference's DVE use is small-angle).

Inside a pass, the tap position q(x) + o(y) = a·x + b·y + c splits as
(floor q + floor o) + (fx + fy).  The integer per-row part floor(o) is
handled by SELECTING among R statically-shifted views of a 128-aligned
column window (R = ceil(|b|·(rows_per_block−1))+2, bounded by shrinking
the row block as |b| grows); the combined fraction phi = fx + fy in
[0, 2) is handled EXACTLY by fetching THREE consecutive taps with pure
one-hot selection matmuls and blending them elementwise with the 1-D
linear weights relu(1−phi) / 1−|phi−1| / relu(phi−1) — i.e. each pass
performs a genuine SINGLE lerp (no double-lerp blur at edges).  The
input is zero-padded by 128 lanes per side in XLA, which makes every
border case (off-frame taps, window clipping at frame edges) fall out
of the one-hot bounds with no masks: on-frame taps always land at
window offsets >= PAD − R > 0.

The two passes compose the exact affine geometry; the only deviation
from the direct bilinear gather is that pass H evaluates px at the two
integer y' taps of pass V rather than at the output's fractional y —
a sub-texel difference visible only ON a content step edge.  Tests
bound it against ops.geometry.warp_affine away from edges and check
the degenerate axis-aligned case to float tolerance.

Mosaic hard-won rules encoded here: dynamic-offset lane slices need a
128-multiple slice LENGTH too (unaligned lengths compiled but returned
garbage); a bf16 hi@w + lo@w dot pair may be merged by the compiler
into one bf16 sum (2^-9 error) — the selection dots therefore run in
f32, whose 3-term MXU decomposition is exact for one-hot contractions.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_warp import COL_CHUNK, _ceil_to, _hi_lo

__all__ = ["make_rotate_program", "rot_bucket_of", "rotate_fits", "decompose"]

PAD = 128  # zero lanes each side; absorbs borders and window alignment

# (|a| scale bound, |b| shear-per-row bound, rows per block).  R stays
# small because rpb shrinks as |b| grows; the 0.05 bucket exists
# because broadcast DVE rotations are mostly a few degrees and the
# select-variant count r_var = ceil(bb*(rpb-1))+2 is paid at the
# BUCKET bound, not the actual angle.
ROT_BUCKETS = (
    (1.25, 0.05, 40),
    (1.25, 0.2, 40),
    (1.25, 0.5, 16),
    (1.25, 1.0, 8),
    (2.0, 2.0, 8),
)
VMEM_BUDGET = 13 * 1024 * 1024


def decompose(a00, a01, a10, a11, cx, cy):
    """Texel-space affine -> per-pass (a, b, c) coefficient triples."""
    b = a01 / a11
    a = a00 - a01 * a10 / a11
    c = cx - b * cy
    return (a, b, c), (a11, a10, cy)


def _texel_coeffs(mat: np.ndarray, width: int, height: int):
    """Normalized-coords matrix (geometry.transform_matrix convention,
    matching pallas_warp.prologue) -> texel-space affine terms."""
    m = np.asarray(mat, np.float64)
    a00 = m[0, 0]
    a01 = m[0, 1] * (width / height)
    cx = (m[0, 2] + 0.5) * width - 0.5 - (a00 * width + a01 * height) / 2
    a11 = m[1, 1]
    a10 = m[1, 0] * (height / width)
    cy = (m[1, 2] + 0.5) * height - 0.5 - (a10 * width + a11 * height) / 2
    return a00, a01, a10, a11, cx, cy


def rot_bucket_of(mat: np.ndarray, width: int, height: int) -> int:
    """Smallest rotation bucket covering BOTH passes of this matrix, or
    -1 (fall back to the XLA gather).  Host-side static decision."""
    a00, a01, a10, a11, cx, cy = _texel_coeffs(mat, width, height)
    if abs(a11) < 0.2 or abs(a00) < 1e-6:
        return -1  # near-90-degree: decomposition ill-conditioned
    (ah, bh, _), (av, bv, _) = decompose(a00, a01, a10, a11, cx, cy)
    span_a = max(abs(ah), abs(av))
    span_b = max(abs(bh), abs(bv))
    for i, (ab, bb, _) in enumerate(ROT_BUCKETS):
        if span_a <= ab and span_b <= bb:
            return i
    return -1


def _config(height: int, width: int, bucket: int):
    ab, bb, rpb = ROT_BUCKETS[bucket]
    # row block: multiple of 8 (Mosaic sublane rule); height % 8 gated
    rpb = next(c for c in (rpb, 32, 24, 16, 8) if c <= rpb and height % c == 0)
    r_var = int(np.ceil(bb * (rpb - 1))) + 2
    slack = _ceil_to(r_var + 2, 16)  # shift variants + the 3-tap carry
    win_c = _ceil_to(ab * (COL_CHUNK - 1) + 2 + 127 + r_var, 128)
    wp = width + 2 * PAD
    # dynamic-offset slices want a lane count that is a 128 multiple
    win_cs = min(_ceil_to(win_c + slack, 128), wp)
    # whole-(padded-)width window: shift slack eats zero padding only
    # (slack < PAD, so every real tap stays coverable)
    win_c = min(win_c, win_cs - slack)
    return rpb, r_var, win_c, win_cs


def _pass_fits(rows: int, lanes: int, bucket: int) -> bool:
    if lanes % COL_CHUNK or rows % 8:
        return False
    rpb, r_var, win_c, win_cs = _config(rows, lanes, bucket)
    wp = lanes + 2 * PAD
    blk = 4 * rpb * wp * 4
    out = 4 * rpb * lanes * 4
    sh = 3 * 4 * rpb * win_c * 4
    cw = win_c * COL_CHUNK * 4
    return 2 * blk + 2 * out + sh + cw + 4 * rpb * win_cs * 4 <= VMEM_BUDGET


def rotate_fits(height: int, width: int, bucket: int) -> bool:
    """Both passes (the vertical one runs on the transposed frame with
    the height padded up to a lane multiple of 128) must fit."""
    if bucket < 0:
        return False
    return _pass_fits(height, _ceil_to(width, 128), bucket) and _pass_fits(
        width, _ceil_to(height, 128), bucket
    )


@lru_cache(maxsize=None)
def _make_pass(height: int, width: int, bucket: int, interpret: bool):
    """One horizontal pass: (4, H, W+2*PAD) padded src ->
    (4, H, W) resampled at a·x + b·y + c."""
    rpb, r_var, win_c, win_cs = _config(height, width, bucket)
    wp = width + 2 * PAD
    n_blocks = height // rpb
    n_chunks = width // COL_CHUNK

    def kernel(ws_ref, kmin_ref, oy_ref, qx_ref, src_ref, out_ref, sh2, cw):
        # Exact single-lerp semantics despite two stages: the tap
        # position q(x) + o(y) has fractional part phi = fx(x) + fy(y)
        # in [0, 2) around integer base floor(q) + floor(o).  Three
        # PURE-SELECTION matmuls fetch taps base+0/1/2 (one-hot weights
        # are exact in bf16), and the 1-D linear weights on those taps
        # — relu(1-phi), 1-|phi-1|, relu(phi-1) — are separable-free
        # ELEMENTWISE math on the output tile.  No double-lerp blur.
        i = pl.program_id(0)
        oy = oy_ref[:, :]  # (rpb, 1) f32: b*y
        ktot = jnp.floor(oy)
        fy = (oy - ktot).astype(jnp.float32)[None]  # (1, rpb, 1)
        kmin = kmin_ref[i]
        krel = ktot.astype(jnp.int32)[None] - kmin  # (1, rpb, 1) in [0, r_var)

        def one_chunk(j):
            o0 = pl.multiple_of(j * COL_CHUNK, COL_CHUNK)
            ws = pl.multiple_of(ws_ref[i, j], COL_CHUNK)
            win = src_ref[:, :, pl.ds(ws, win_cs)]  # (4, rpb, win_cs)
            # per-row integer shift: select among static shifted views,
            # three tap planes (base, +1, +2)
            taps = []
            for t in range(3):
                acc = jnp.zeros((4, rpb, win_c), jnp.float32)
                for k in range(r_var):
                    if k + t + win_c <= win_cs:
                        acc = acc + jnp.where(
                            krel == k, win[:, :, k + t : k + t + win_c], 0.0
                        )
                taps.append(acc)
            for t in range(3):
                sh2[t] = taps[t]
            # shared integer selection matrix (one-hot at floor(u)).
            # f32 dots: the values must survive selection EXACTLY, and
            # Mosaic is free to merge a bf16 hi@w + lo@w pair into one
            # bf16 sum (observed: 2^-9 error); the f32 MXU path's
            # 3-term decomposition is exact for a one-hot contraction.
            qc = qx_ref[pl.ds(0, 1), pl.ds(o0, COL_CHUNK)]  # (1, 128)
            u = qc + kmin.astype(jnp.float32) - ws.astype(jnp.float32)
            x0 = jnp.floor(u)
            fx = (u - x0).astype(jnp.float32)[None]  # (1, 1, 128)
            x0i = x0.astype(jnp.int32)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (win_c, COL_CHUNK), 0)
            cw[:, :] = jnp.where(lanes == x0i, 1.0, 0.0)
            sel = []
            for t in range(3):
                fv = sh2[t].reshape(4 * rpb, win_c)
                sel.append(
                    jnp.dot(
                        fv, cw[:, :], preferred_element_type=jnp.float32
                    ).reshape(4, rpb, COL_CHUNK)
                )
            phi = fx + fy  # (1, rpb, 128) in [0, 2)
            w0 = jnp.maximum(1.0 - phi, 0.0)
            w2 = jnp.maximum(phi - 1.0, 0.0)
            w1 = 1.0 - w0 - w2
            out_ref[:, :, pl.ds(o0, COL_CHUNK)] = (
                sel[0] * w0 + sel[1] * w1 + sel[2] * w2
            )

        unroll = 2 if n_chunks % 2 == 0 else 1

        def body(j2, _):
            for k in range(unroll):
                one_chunk(j2 * unroll + k)
            return 0

        jax.lax.fori_loop(0, n_chunks // unroll, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ws (n_blocks, n_chunks), kmin (n_blocks,)
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rpb, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qx (1, W)
            pl.BlockSpec(
                (4, rpb, wp), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, rpb, width), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((3, 4, rpb, win_c), jnp.float32),
            pltpu.VMEM((win_c, COL_CHUNK), jnp.float32),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, height, width), jnp.float32),
        interpret=interpret,
    )

    def hpass(src, a, b, c):
        """src (4, H, W) -> (4, H, W) resampled at a·x + b·y + c."""
        padded = jnp.pad(src, ((0, 0), (0, 0), (PAD, PAD)))
        y = jnp.arange(height, dtype=jnp.float32)
        x = jnp.arange(width, dtype=jnp.float32)
        oy = (b * y).reshape(height, 1)
        qx = (a * x + c + PAD).reshape(1, width)
        ktot = jnp.floor(oy).astype(jnp.int32)
        blocks = jnp.arange(n_blocks) * rpb
        kmin = jnp.minimum(ktot[blocks, 0], ktot[blocks + rpb - 1, 0])
        chunks = jnp.arange(n_chunks) * COL_CHUNK
        q_lo = jnp.minimum(qx[0, chunks], qx[0, chunks + COL_CHUNK - 1])
        ws = jnp.clip(
            (jnp.floor(q_lo[None, :]).astype(jnp.int32) + kmin[:, None])
            // COL_CHUNK
            * COL_CHUNK,
            0,
            max(wp - win_cs, 0),
        )
        return call(ws, kmin, oy, qx, padded)

    return hpass


@lru_cache(maxsize=None)
def make_rotate_program(height: int, width: int, bucket: int, interpret: bool | None = None):
    """fn(rgba (4,H,W), mat (3,3)) -> rotated/sheared (4,H,W).

    Matches ops.geometry.warp_affine's sampling convention (normalized
    coords, zero border) via the two-pass decomposition above.  The
    vertical pass runs on the transposed intermediate, so both passes
    share one kernel; H and W must both satisfy the pass geometry."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    hp_w = _ceil_to(width, 128)
    vp_w = _ceil_to(height, 128)  # transposed lanes = original height
    h_pass = _make_pass(height, hp_w, bucket, interpret)
    v_pass = _make_pass(width, vp_w, bucket, interpret)

    @jax.jit
    def rotate(rgba, mat):
        m = mat.astype(jnp.float32)
        a00 = m[0, 0]
        a01 = m[0, 1] * (width / height)
        cx = (m[0, 2] + 0.5) * width - 0.5 - (a00 * width + a01 * height) / 2
        a11 = m[1, 1]
        a10 = m[1, 0] * (height / width)
        cy = (m[1, 2] + 0.5) * height - 0.5 - (a10 * width + a11 * height) / 2
        b = a01 / a11
        a = a00 - a01 * a10 / a11
        c = cx - b * cy
        x = rgba
        if hp_w != width:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, hp_w - width)))
        t = h_pass(x, a, b, c)[:, :, :width]
        t = jnp.swapaxes(t, 1, 2)  # (4, W, H)
        if vp_w != height:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, vp_w - height)))
        t = v_pass(t, a11, a10, cy)[:, :, :height]
        return jnp.swapaxes(t, 1, 2)

    return rotate
