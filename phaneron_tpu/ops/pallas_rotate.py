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
    (requires |A11| bounded away from 0).

FULL-ANGLE coverage comes from quarter-turn composition.  In this
build's sampling convention every axis is normalized by its OWN
dimension (geometry.warp_affine: centred coords x/w-0.5, y/h-0.5), so
an array rot90 — a transpose + lane flip, cheap XLA data movement —
corresponds EXACTLY to the coordinate map Q = [[0,-1],[1,0]]
irrespective of aspect ratio:  src(Q·v) == rot90(src)(v)  for every
continuous v (bilinear interpolation commutes with grid-aligned
rotation).  Hence for any matrix M and quarter q,

    warp(src, M) = two_pass_warp(rot90(src, q), Q^-q · M)

and picking q = the nearest quarter turn leaves a residual rotation of
at most 45 deg, which always lands in a shear bucket: every angle of
MIXER ROTATION runs at two-pass cost, matching the reference sampler's
uniform-cost rotation (transform.ts:26-29,119-175) with no 40 ms
gather band.  Odd quarters swap the input array's geometry, so the
passes support differing input/output lane counts.  Bucket codes pack
quarter and shear bucket as  code = quarter*8 + bucket  (-1 = no
cover, e.g. a genuinely degenerate matrix).

Inside a pass, the tap position q(x) + o(y) = a·x + b·y + c splits as
(floor q + floor o) + (fx + fy).  The integer per-row part floor(o) is
handled by a LOG SHIFT LADDER over a 128-aligned column window: stage
s shifts by s lanes where bit s of the row's offset is set, so R
possible shifts (R = ceil(|b|·(rows_per_block−1))+2, bounded by
shrinking the row block as |b| grows) cost ceil(log2 R) exact selects
instead of R; the combined fraction phi = fx + fy in
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

__all__ = [
    "make_rotate_program",
    "rot_bucket_of",
    "rotate_fits",
    "decompose",
]

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


# homogeneous Q^-q for q quarter-turn rot90 applications of the SOURCE
# array (see module docstring: rot90(src)(v) == src(Q.v))
_QINV = (
    np.eye(3),
    np.array([[0.0, 1, 0], [-1, 0, 0], [0, 0, 1]]),
    np.array([[-1.0, 0, 0], [0, -1, 0], [0, 0, 1]]),
    np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]]),
)
# preference order: no data movement, then pure flips, then transposes
_Q_ORDER = (0, 2, 1, 3)


def _in_dims(q: int, width: int, height: int) -> tuple[int, int]:
    """(W_in, H_in) of the quarter-rotated source array for an
    (height, width) output frame."""
    return (height, width) if q & 1 else (width, height)


def _texel_coeffs(
    mat: np.ndarray, w_in: int, h_in: int, w_out: int, h_out: int
):
    """Normalized-coords matrix (geometry.warp_affine convention:
    output x/w_out-0.5, input sampled at pos*w_in-0.5) -> texel-space
    affine terms.  Input and output geometry may differ (odd quarter
    turns swap the source array's axes)."""
    m = np.asarray(mat, np.float64)
    a00 = m[0, 0] * (w_in / w_out)
    a01 = m[0, 1] * (w_in / h_out)
    cx = (m[0, 2] + 0.5) * w_in - 0.5 - (a00 * w_out + a01 * h_out) / 2
    a11 = m[1, 1] * (h_in / h_out)
    a10 = m[1, 0] * (h_in / w_out)
    cy = (m[1, 2] + 0.5) * h_in - 0.5 - (a10 * w_out + a11 * h_out) / 2
    return a00, a01, a10, a11, cx, cy


def _bucket_for_quarter(mat: np.ndarray, q: int, width: int, height: int) -> int:
    """Shear bucket of the q-quarter residual matrix, or -1."""
    m_res = _QINV[q] @ np.asarray(mat, np.float64)
    w_in, h_in = _in_dims(q, width, height)
    a00, a01, a10, a11, cx, cy = _texel_coeffs(m_res, w_in, h_in, width, height)
    if abs(a11) < 0.2 or abs(a00) < 1e-6:
        return -1  # residual still ill-conditioned for this quarter
    (ah, bh, _), (av, bv, _) = decompose(a00, a01, a10, a11, cx, cy)
    span_a = max(abs(ah), abs(av))
    span_b = max(abs(bh), abs(bv))
    for i, (ab, bb, _) in enumerate(ROT_BUCKETS):
        if span_a <= ab and span_b <= bb:
            return i
    return -1


def rot_bucket_of(
    mat: np.ndarray, width: int, height: int, quarter: int | None = None
) -> int:
    """Smallest quarter+bucket CODE (quarter*8 + bucket) covering both
    passes of this matrix, or -1 (fall back to the XLA gather).
    Host-side static decision.  ``quarter`` forces a specific quarter
    turn (pair programs need both matrices on one quarter)."""
    for q in _Q_ORDER if quarter is None else (quarter,):
        b = _bucket_for_quarter(mat, q, width, height)
        if b >= 0:
            return q * 8 + b
    return -1


def _config(height: int, width_in: int, bucket: int):
    ab, bb, rpb = ROT_BUCKETS[bucket]
    # row block: multiple of 8 (Mosaic sublane rule); height % 8 gated
    rpb = next(c for c in (rpb, 32, 24, 16, 8) if c <= rpb and height % c == 0)
    r_var = int(np.ceil(bb * (rpb - 1))) + 2
    # the shift LADDER consumes sum(1,2,4,...) = 2^ceil(log2 r_var) - 1
    # lanes of window length, plus the 3-tap carry
    ladder_span = (1 << (r_var - 1).bit_length()) - 1
    slack = _ceil_to(ladder_span + 3, 16)
    win_c = _ceil_to(ab * (COL_CHUNK - 1) + 2 + 127 + r_var, 128)
    wp = width_in + 2 * PAD
    # dynamic-offset slices want a lane count that is a 128 multiple
    win_cs = min(_ceil_to(win_c + slack, 128), wp)
    # whole-(padded-)width window: shift slack eats zero padding only
    # (slack < PAD, so every real tap stays coverable)
    win_c = min(win_c, win_cs - slack)
    return rpb, r_var, win_c, win_cs


def _pass_fits(rows: int, lanes_in: int, lanes_out: int, bucket: int) -> bool:
    if lanes_in % COL_CHUNK or lanes_out % COL_CHUNK or rows % 8:
        return False
    rpb, r_var, win_c, win_cs = _config(rows, lanes_in, bucket)
    wp = lanes_in + 2 * PAD
    blk = 4 * rpb * wp * 4
    out = 4 * rpb * lanes_out * 4
    sh = 3 * 4 * rpb * win_c * 4
    cw = win_c * COL_CHUNK * 4
    return 2 * blk + 2 * out + sh + cw + 4 * rpb * win_cs * 4 <= VMEM_BUDGET


def rotate_fits(height: int, width: int, code: int) -> bool:
    """Both passes must fit (pass 1 reads the quarter-rotated source,
    pass 2 the transposed intermediate; odd quarters swap the input
    geometry, so pass rows/lanes follow the quarter in the code)."""
    if code < 0:
        return False
    q, bucket = code // 8, code % 8
    w_in, h_in = _in_dims(q, width, height)
    return _pass_fits(
        h_in, _ceil_to(w_in, 128), _ceil_to(width, 128), bucket
    ) and _pass_fits(width, _ceil_to(h_in, 128), _ceil_to(height, 128), bucket)


@lru_cache(maxsize=None)
def _make_pass(height: int, width_in: int, width_out: int, bucket: int, interpret: bool):
    """One horizontal pass: (4, H, W_in+2*PAD) padded src ->
    (4, H, W_out) resampled at a·x + b·y + c.  In/out lane counts may
    differ (quarter-rotated sources of non-square frames)."""
    rpb, r_var, win_c, win_cs = _config(height, width_in, bucket)
    wp = width_in + 2 * PAD
    n_blocks = height // rpb
    n_chunks = width_out // COL_CHUNK

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
            # per-row integer shift as a LOG LADDER: stage s shifts the
            # whole window by s lanes where bit s of krel is set —
            # ceil(log2 r_var) selects instead of r_var full-window
            # where-accumulates (an ~r_var/log2 cut in VMEM select
            # traffic, the kernel's former cost driver at large-shear
            # buckets).  Static unaligned slice OFFSETS are Mosaic-
            # legal (only dynamic ones need 128 alignment); selection
            # stays exact (pure where), so output is bit-identical.
            shifted = win
            length = win_cs
            s = 1
            while s < r_var:
                length -= s
                shifted = jnp.where(
                    (krel & s) != 0,
                    shifted[:, :, s : s + length],
                    shifted[:, :, :length],
                )
                s *= 2
            # three tap planes (base, +1, +2) are now static slices
            for t in range(3):
                sh2[t] = shifted[:, :, t : t + win_c]
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
            (4, rpb, width_out), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((3, 4, rpb, win_c), jnp.float32),
            pltpu.VMEM((win_c, COL_CHUNK), jnp.float32),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, height, width_out), jnp.float32),
        interpret=interpret,
    )

    def hpass(src, a, b, c):
        """src (4, H, W_in) -> (4, H, W_out) resampled at a·x + b·y + c."""
        padded = jnp.pad(src, ((0, 0), (0, 0), (PAD, PAD)))
        y = jnp.arange(height, dtype=jnp.float32)
        x = jnp.arange(width_out, dtype=jnp.float32)
        oy = (b * y).reshape(height, 1)
        qx = (a * x + c + PAD).reshape(1, width_out)
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
def make_rotate_program(height: int, width: int, code: int, interpret: bool | None = None):
    """fn(rgba (4,H,W), mat (3,3)) -> rotated/sheared (4,H,W).

    Matches ops.geometry.warp_affine's sampling convention (normalized
    coords, zero border).  ``code`` packs quarter*8 + bucket: the
    source is first quarter-rotated (exact, lossless XLA transpose/
    flip), then the two shear passes run on the residual matrix
    Q^-q·mat — the quarter is static structure, the matrix stays a
    TRACED argument (animated rotation never recompiles).  The vertical
    pass runs on the transposed intermediate, so both passes share one
    kernel."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    q, bucket = code // 8, code % 8
    w_in, h_in = _in_dims(q, width, height)
    hp_in = _ceil_to(w_in, 128)
    hp_out = _ceil_to(width, 128)
    vp_in = _ceil_to(h_in, 128)  # transposed lanes = source height
    vp_out = _ceil_to(height, 128)
    h_pass = _make_pass(h_in, hp_in, hp_out, bucket, interpret)
    v_pass = _make_pass(width, vp_in, vp_out, bucket, interpret)
    qinv = jnp.asarray(_QINV[q], jnp.float32)

    @jax.jit
    def rotate(rgba, mat):
        m = qinv @ mat.astype(jnp.float32)
        a00 = m[0, 0] * (w_in / width)
        a01 = m[0, 1] * (w_in / height)
        cx = (m[0, 2] + 0.5) * w_in - 0.5 - (a00 * width + a01 * height) / 2
        a11 = m[1, 1] * (h_in / height)
        a10 = m[1, 0] * (h_in / width)
        cy = (m[1, 2] + 0.5) * h_in - 0.5 - (a10 * width + a11 * height) / 2
        b = a01 / a11
        a = a00 - a01 * a10 / a11
        c = cx - b * cy
        x = jnp.rot90(rgba, k=q, axes=(1, 2)) if q else rgba
        if hp_in != w_in:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, hp_in - w_in)))
        t = h_pass(x, a, b, c)[:, :, :width]
        t = jnp.swapaxes(t, 1, 2)  # (4, W_out, H_in)
        if vp_in != h_in:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, vp_in - h_in)))
        t = v_pass(t, a11, a10, cy)[:, :, :height]
        return jnp.swapaxes(t, 1, 2)

    return rotate
