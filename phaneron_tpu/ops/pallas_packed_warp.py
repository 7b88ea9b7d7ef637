"""Packed-source DVE warp: v210 decode INSIDE the warp window.

The staged UHD serving path pays a full RGBA round trip per source:
the batched spatial unpack writes 133 MB/source of linear RGBA to HBM
and the pair-warp reads it straight back (~2.1 GB/frame at the UHD
4-layer shape — the gap between 12.6 ms measured and the ~4.4 ms
traffic floor).  This kernel deletes that round trip: the warp's
row-window DMA reads the HOST-SPLIT v210 WORD PLANES (2.7 B/px instead
of 16) and decodes them in VMEM, so a dissolve layer's HBM traffic is
two packed windows in + one RGBA frame out.

Decode is the round-3 spatial machinery (ops/pallas_kernels
_v210_spatial_weights): phase planes ride as 4*hi8 + lo2 bf16 pairs
(both halves exact, distinct multipliers are Mosaic-merge-proof) and
the phase->spatial deinterleave is THREE constant one-hot matrices
(128 ≡ 2 mod 6 makes the pattern period-3 in the chunk index) — pure
MXU, none of the dynamic phase-window column gathers that made the
all-in-one ops/pallas_composite kernel VPU-bound.  Colour matrix +
analytic gamma produce linear RGB; alpha is the constant 1 plane.  The
decoded window then feeds the proven pair-warp row/column one-hot
passes unchanged (ops/pallas_warp), so the error class is the same
~2^-17 bf16 hi/lo split — packed codes match the staged path to <=1
code.

Reference correspondence: this is the single-round-trip goal of the
reference's job-queue design (process/clJobQueue.ts:114-141 — one read
of sources, one write of the result per stage chain), realised as one
kernel per dissolve layer.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import colour_maths as cm
from .formats import v210 as v210fmt
from .pallas_kernels import (
    _gamma_fns,
    _literals,
    _unpack_phases,
    _v210_spatial_weights,
)
from .pallas_warp import (
    BUCKET_BOUNDS,
    COL_CHUNK,
    _ceil_to,
    _hi_lo,
    _rows_per_block,
)

# The decode overlap win_r/rpb is this kernel's cost driver (every
# block decodes its whole window), so ROW-BLOCK SIZE beats weight
# persistence here: the config search prefers the largest rpb that
# fits, accepting per-chunk weight rebuilds (cheap: ~0.6M VPU ops per
# rebuild) over the 5.9 MB persisted table that forced rpb 16 at UHD
# (overlap 2.0 -> 1.28 at rpb 40).  Budget runs closer to the 16 MB
# scoped limit than ops/pallas_warp's because the packed window is
# 6x smaller than an RGBA one.
P_VMEM_BUDGET = 15 * 1024 * 1024

__all__ = [
    "make_packed_warp_program",
    "make_packed_warp_pair_program",
    "make_packed_composite_program",
    "packed_warp_fits",
    "packed_composite_fits",
]


class _PCfg(NamedTuple):
    rpb: int
    win_r: int
    win_c: int
    persist_cw: bool


def _config(height: int, width: int, bucket: int, n_mat: int) -> _PCfg:
    bound, preferred = BUCKET_BOUNDS[bucket]
    g = v210fmt.pitch(width) // 6
    gp = _ceil_to(g, 128)
    g2p = _ceil_to(g + 24, 128)
    win_c = min(_ceil_to(bound * (COL_CHUNK - 1) + 2 + (COL_CHUNK - 1), 128), width)
    n_chunks = width // COL_CHUNK

    def plan(rpb_pref: int, persist: bool):
        rpb = _rows_per_block(height, rpb_pref)
        win_r = min(_ceil_to(bound * (rpb - 1) + 10, 8), _ceil_to(height, 8))
        winbuf = 4 * win_r * gp * 4  # u32 packed window (vs 4 B/px RGBA)
        vals = 2 * 12 * win_r * g2p * 2  # bf16 hi/lo phase planes
        win2 = 2 * 4 * win_r * width * 2  # decoded spatial bf16 hi/lo
        rows2 = 2 * 4 * rpb * width * 2
        out = 2 * 4 * rpb * width * 4
        flat = 2 * 4 * rpb * win_c * 2
        wts = (3 * 144 * 128 + 3 * 72 * 128) * 2
        cw_slots = n_mat * n_chunks if persist else 1
        cw = cw_slots * 2 * win_c * COL_CHUNK * 2
        total = winbuf + vals + win2 + rows2 + out + flat + wts + cw
        return _PCfg(rpb, win_r, win_c, persist), total

    # largest rpb first; persistence is only a tie-break at equal rpb
    for rpb_pref in (preferred, 32, 24, 16, 8, 4, 2, 1):
        for persist in (True, False):
            cfg, bytes_ = plan(rpb_pref, persist)
            if bytes_ <= P_VMEM_BUDGET:
                return cfg
    raise ValueError(
        f"packed warp scratch cannot fit VMEM: {height}x{width} bucket {bucket}"
    )


def packed_warp_fits(height: int, width: int, bucket: int, n_mat: int = 1) -> bool:
    """Gate for the packed-source warp path (pipeline._process_layer).
    The window DMA slices the word planes' minor (group) dimension, and
    Mosaic requires that slice 128-aligned — so the packed family only
    serves widths whose group count is a 128 multiple (width % 768 == 0:
    UHD, 8K; HD keeps the staged unpack + RGBA premix pair)."""
    g = v210fmt.pitch(width) // 6
    if bucket < 0 or width % COL_CHUNK or height % 8 or g % 128:
        return False
    try:
        _config(height, width, bucket, n_mat)
        return True
    except ValueError:
        return False


@lru_cache(maxsize=None)
def _make_program(
    height: int,
    width: int,
    bucket: int,
    n_src: int,
    n_mat: int,
    col_spec: str,
    out_col_spec: str,
    interpret: bool,
):
    assert width % COL_CHUNK == 0
    assert n_src in (1, 2) and n_mat in (1, n_src)
    mixing = n_src == 2
    rpb, win_r, win_c, persist_cw = _config(height, width, bucket, n_mat)
    n_blocks = height // rpb
    n_chunks = width // COL_CHUNK
    g = v210fmt.pitch(width) // 6
    g2 = g + 24  # zero tail: the last chunks' static slices stay in-bounds

    col_fwd = _literals(cm.ycbcr2rgb_matrix(col_spec, 10, 64, 940, 896))
    gamut = _literals(cm.rgb2rgb_matrix(col_spec, out_col_spec))
    g2l, _ = _gamma_fns(col_spec, out_col_spec)

    def kernel(*refs):
        (row_off_ref, py_ref, px_ref, col_off_ref) = refs[:4]
        idx = 4
        mix_ref = None
        if mixing:
            mix_ref = refs[idx]
            idx += 1
        wy_ref, wc_ref = refs[idx : idx + 2]
        idx += 2
        src_refs = refs[idx : idx + n_src]
        out_ref = refs[idx + n_src]
        (winbuf, vals, win2, rows2, flat2, cw, sem) = refs[idx + n_src + 1 :]

        i = pl.program_id(0)

        def window_dma(block, s):
            m = min(s, n_mat - 1)
            r0 = pl.multiple_of(row_off_ref[m, block], 8)
            return pltpu.make_async_copy(
                src_refs[s].at[:, pl.ds(r0, win_r), :], winbuf, sem
            )

        @pl.when(i == 0)
        def _first():
            window_dma(0, 0).start()

        def build_cw(j, m, store):
            c0 = pl.multiple_of(col_off_ref[m, j], COL_CHUNK)
            o0 = pl.multiple_of(j * COL_CHUNK, COL_CHUNK)
            pxc = px_ref[pl.ds(m, 1), pl.ds(o0, COL_CHUNK)]  # (1, 128)
            x0 = jnp.floor(pxc)
            fx = (pxc - x0).astype(jnp.float32)
            x0i = x0.astype(jnp.int32)
            cc = jax.lax.broadcasted_iota(jnp.int32, (win_c, COL_CHUNK), 0) + c0
            v0 = jnp.where((x0i >= 0) & (x0i < width), 1.0 - fx, 0.0)
            v1 = jnp.where((x0i + 1 >= 0) & (x0i + 1 < width), fx, 0.0)
            w = jnp.where(cc == x0i, v0, 0.0) + jnp.where(cc == x0i + 1, v1, 0.0)
            wh, wl = _hi_lo(w)
            cw[store, 0] = wh
            cw[store, 1] = wl

        if persist_cw:

            @pl.when(i == 0)
            def _build_all():
                for m in range(n_mat):
                    jax.lax.fori_loop(
                        0,
                        n_chunks,
                        lambda j, _, m=m: (build_cw(j, m, m * n_chunks + j), 0)[1],
                        0,
                    )

        def row_weights(m):
            r0 = pl.multiple_of(row_off_ref[m, i], 8)
            pyb = py_ref[:, pl.ds(m, 1)]  # (rpb, 1)
            y0 = jnp.floor(pyb)
            fy = (pyb - y0).astype(jnp.float32)
            y0i = y0.astype(jnp.int32)
            w0 = jnp.where((y0i >= 0) & (y0i < height), 1.0 - fy, 0.0)
            w1 = jnp.where((y0i + 1 >= 0) & (y0i + 1 < height), fy, 0.0)
            kk = jax.lax.broadcasted_iota(jnp.int32, (rpb, win_r), 1) + r0
            rw = jnp.where(kk == y0i, w0, 0.0) + jnp.where(kk == y0i + 1, w1, 0.0)
            return _hi_lo(rw)

        def decode_window():
            """Packed window -> decoded linear-RGBA bf16 hi/lo in win2.
            After the phase split, winbuf is dead and the next DMA can
            stream in behind the deinterleave/colour work."""
            ys, cbs, crs = _unpack_phases(
                winbuf[0], winbuf[1], winbuf[2], winbuf[3]
            )
            vals[:, :, :, g:] = jnp.zeros((2, 12, win_r, g2 - g), jnp.bfloat16)
            # 10-bit codes as 4*hi8 + lo2 (bf16-exact, merge-proof)
            for q, plane in enumerate(list(ys) + list(cbs) + list(crs)):
                vals[0, q, :, :g] = (
                    (plane >> 2).astype(jnp.float32).astype(jnp.bfloat16)
                )
                vals[1, q, :, :g] = (
                    (plane & 3).astype(jnp.float32).astype(jnp.bfloat16)
                )

        def deint(qs, base, w):
            fh = jnp.concatenate(
                [vals[0, q, :, base : base + 24] for q in qs], axis=1
            )
            fl = jnp.concatenate(
                [vals[1, q, :, base : base + 24] for q in qs], axis=1
            )
            return 4.0 * jnp.dot(
                fh, w, preferred_element_type=jnp.float32
            ) + jnp.dot(fl, w, preferred_element_type=jnp.float32)

        def decode_chunks(gain=None, accumulate=False):
            """Deinterleave + colour + gamma into win2.  With ``gain``
            the PREMIX path scales linear values by mix (source a) /
            1-mix (source b, accumulated): the bilinear warp is linear
            in the source, so mixing the decoded windows FIRST and
            warping ONCE is the same arithmetic as warp-then-mix, at
            half the row/column passes."""
            for j in range(n_chunks):
                wy = wy_ref[j % 3]
                wc = wc_ref[j % 3]
                b, bc = (128 * j) // 6, (64 * j) // 3
                ysp = deint(range(6), b, wy)
                usp = deint(range(6, 9), bc, wc)
                vsp = deint(range(9, 12), bc, wc)
                gam = [
                    col_fwd[c][0] * ysp
                    + col_fwd[c][1] * usp
                    + col_fwd[c][2] * vsp
                    + col_fwd[c][3]
                    for c in range(3)
                ]
                lin = [g2l(gam[c]) for c in range(3)]
                sl = pl.ds(128 * j, COL_CHUNK)
                for c in range(3):
                    val = (
                        gamut[c][0] * lin[0]
                        + gamut[c][1] * lin[1]
                        + gamut[c][2] * lin[2]
                    )
                    if gain is not None:
                        val = val * gain
                    if accumulate:
                        val = val + (
                            win2[0, c, :, sl].astype(jnp.float32)
                            + win2[1, c, :, sl].astype(jnp.float32)
                        )
                    hi = val.astype(jnp.bfloat16)
                    lo = (val - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    win2[0, c, :, sl] = hi
                    win2[1, c, :, sl] = lo
            if not accumulate:
                # opaque sources: mixed alpha = mix + (1-mix) = 1
                win2[0, 3] = jnp.ones((win_r, width), jnp.bfloat16)
                win2[1, 3] = jnp.zeros((win_r, width), jnp.bfloat16)

        def start_next(s):
            # winbuf is free once decoded: overlap the next DMA with
            # the deinterleave/colour and matmul work
            if s + 1 < n_src:
                window_dma(i, s + 1).start()
            else:

                @pl.when(i + 1 < n_blocks)
                def _():
                    window_dma(i + 1, 0).start()

        def row_col_passes(m, gain=None, accumulate_out=False):
            # ---- row pass (identical to ops/pallas_warp)
            rwh, rwl = row_weights(m)
            for c in range(4):
                rows = (
                    jnp.dot(rwh, win2[0, c], preferred_element_type=jnp.float32)
                    + jnp.dot(rwl, win2[0, c], preferred_element_type=jnp.float32)
                    + jnp.dot(rwh, win2[1, c], preferred_element_type=jnp.float32)
                )
                rh, rl = _hi_lo(rows)
                rows2[0, c] = rh
                rows2[1, c] = rl

            # ---- column pass (identical to ops/pallas_warp)
            def one_chunk(j):
                o0 = pl.multiple_of(j * COL_CHUNK, COL_CHUNK)
                if persist_cw:
                    store = m * n_chunks + j
                else:
                    store = 0
                    build_cw(j, m, 0)
                c0 = pl.multiple_of(col_off_ref[m, j], COL_CHUNK)
                flat2[0, :, :, :] = rows2[0, :, :, pl.ds(c0, win_c)]
                flat2[1, :, :, :] = rows2[1, :, :, pl.ds(c0, win_c)]
                fh = flat2[0].reshape(4 * rpb, win_c)
                fl = flat2[1].reshape(4 * rpb, win_c)
                chunk = (
                    jnp.dot(fh, cw[store, 0], preferred_element_type=jnp.float32)
                    + jnp.dot(fl, cw[store, 0], preferred_element_type=jnp.float32)
                    + jnp.dot(fh, cw[store, 1], preferred_element_type=jnp.float32)
                ).reshape(4, rpb, COL_CHUNK)
                if gain is not None:
                    chunk = chunk * gain
                if accumulate_out:
                    chunk = out_ref[:, :, pl.ds(o0, COL_CHUNK)] + chunk
                out_ref[:, :, pl.ds(o0, COL_CHUNK)] = chunk

            unroll = 2 if n_chunks % 2 == 0 else 1

            def chunk_body(j2, _):
                for u in range(unroll):
                    one_chunk(j2 * unroll + u)
                return 0

            jax.lax.fori_loop(0, n_chunks // unroll, chunk_body, 0)

        def process_source(s):
            m = min(s, n_mat - 1)
            window_dma(i, s).wait()
            decode_window()
            start_next(s)
            decode_chunks()
            if mixing:
                row_col_passes(
                    m,
                    gain=mix_ref[0, 0] if s == 0 else 1.0 - mix_ref[0, 0],
                    accumulate_out=s > 0,
                )
            else:
                row_col_passes(m)

        if mixing and n_mat == 1:
            # PREMIX: same-matrix dissolve mixes the two decoded
            # windows and warps ONCE (linearity of the bilinear warp)
            window_dma(i, 0).wait()
            decode_window()
            start_next(0)
            decode_chunks(gain=mix_ref[0, 0], accumulate=False)
            window_dma(i, 1).wait()
            decode_window()
            start_next(1)
            decode_chunks(gain=1.0 - mix_ref[0, 0], accumulate=True)
            row_col_passes(0)
        else:
            for s in range(n_src):
                process_source(s)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # row_off (n_mat, n_blocks)
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (rpb, n_mat), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),  # py
            pl.BlockSpec(memory_space=pltpu.VMEM),  # px (n_mat, W)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # col_off (n_mat, n_chunks)
        ]
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if mixing else [])  # mix
        + [
            pl.BlockSpec((3, 144, 128), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 72, 128), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_src)],  # packed srcs
        out_specs=pl.BlockSpec(
            (4, rpb, width), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((4, win_r, g), jnp.uint32),
            pltpu.VMEM((2, 12, win_r, g2), jnp.bfloat16),
            pltpu.VMEM((2, 4, win_r, width), jnp.bfloat16),
            pltpu.VMEM((2, 4, rpb, width), jnp.bfloat16),
            pltpu.VMEM((2, 4, rpb, win_c), jnp.bfloat16),
            pltpu.VMEM(
                ((n_mat * n_chunks if persist_cw else 1), 2, win_c, COL_CHUNK),
                jnp.bfloat16,
            ),
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, height, width), jnp.float32),
        interpret=interpret,
    )

    def prologue(mats):
        """Per-matrix texel maps + 8-aligned row / 128-aligned column
        window offsets (identical to ops/pallas_warp.prologue)."""
        ix = (jnp.arange(width, dtype=jnp.float32) / width) - 0.5
        iy = (jnp.arange(height, dtype=jnp.float32) / height) - 0.5
        pxs, pys, row_offs, col_offs = [], [], [], []
        for mat in mats:
            px = (mat[0, 0] * ix + mat[0, 2] + 0.5) * width - 0.5
            py = (mat[1, 1] * iy + mat[1, 2] + 0.5) * height - 0.5
            blocks = jnp.arange(n_blocks) * rpb
            row_lo = jnp.minimum(py[blocks], py[blocks + rpb - 1])
            row_offs.append(
                jnp.clip(
                    jnp.floor(row_lo).astype(jnp.int32) // 8 * 8,
                    0,
                    max(height - win_r, 0),
                )
            )
            chunks = jnp.arange(n_chunks) * COL_CHUNK
            col_lo = jnp.minimum(px[chunks], px[chunks + COL_CHUNK - 1])
            col_offs.append(
                jnp.clip(
                    jnp.floor(col_lo).astype(jnp.int32) // COL_CHUNK * COL_CHUNK,
                    0,
                    max(width - win_c, 0),
                )
            )
            pxs.append(px)
            pys.append(py)
        return (
            jnp.stack(row_offs),
            jnp.stack(pys, axis=-1),
            jnp.stack(pxs),
            jnp.stack(col_offs),
        )

    wy_np, wc_np = _v210_spatial_weights()

    if n_src == 1:

        @jax.jit
        def warp(planes, mat):
            row_off, py, px, col_off = prologue([mat])
            wy_j = jnp.asarray(wy_np, jnp.bfloat16)
            wc_j = jnp.asarray(wc_np, jnp.bfloat16)
            return call(
                row_off, py, px, col_off, wy_j, wc_j, planes.astype(jnp.uint32)
            )

        return warp

    @jax.jit
    def warp_pair(planes_a, planes_b, mat_a, mat_b, mix):
        mats = [mat_a] if n_mat == 1 else [mat_a, mat_b]
        row_off, py, px, col_off = prologue(mats)
        mix_arr = jnp.asarray(mix, jnp.float32).reshape(1, 1)
        wy_j = jnp.asarray(wy_np, jnp.bfloat16)
        wc_j = jnp.asarray(wc_np, jnp.bfloat16)
        return call(
            row_off, py, px, col_off, mix_arr, wy_j, wc_j,
            planes_a.astype(jnp.uint32), planes_b.astype(jnp.uint32),
        )

    return warp_pair


# ---------------------------------------------------------------------------
# The whole channel frame in ONE kernel: packed v210 sources -> in-window
# decode -> premixed dissolve warps -> over-composite -> v210 encode+pack.
# HBM traffic is packed words in (~2.7 B/px/source) + packed words out —
# the single-round-trip goal of the reference's job queue
# (clJobQueue.ts:114-141) realised for the full serving shape.  Unlike the
# retired ops/pallas_composite (VPU-bound dynamic phase-window gather),
# every cross-lane move here is a constant one-hot MXU matmul, and
# same-matrix dissolve pairs premix their decoded windows so each layer
# warps ONCE.  Layers are processed sequentially per row block, sharing
# one window/rows scratch; the composite accumulates in VMEM f32 and
# packs per 768-lane group chunk with the shared pack one-hot
# (768 = 6*128, pallas_kernels._v210_pack_weights).


def _padded_geometry(width: int):
    """(g_real, gp, wpad): the v210 group count, its 128-aligned pad,
    and the padded pixel width the kernel lays its lanes out over.

    UHD/8K widths divide the 768 = 6*128 sextet structure exactly
    (gp == g, wpad == width).  HD does not (1920 px = 320 groups), so
    the kernel runs at the padded geometry (384 groups = 2304 px): the
    pad is pitch-tail semantics — padded source groups decode to
    finite garbage that every warp weight zeroes by the REAL-width
    bounds check, padded output columns warp to zero and encode as
    black, and the wrapper crops both emits back to real geometry."""
    g = v210fmt.pitch(width) // 6
    gp = _ceil_to(g, 128)
    return g, gp, 6 * gp


def _composite_config(
    height: int,
    width: int,
    bucket: int,
    n_layers: int,
    cchunk: int = COL_CHUNK,
    sextet_split: bool = False,
    emit: str = "packed",
    src_kind: str = "packed",
):
    """Row-block plan for the all-layers kernel; None = fall back.

    ``cchunk`` is the COLUMN-PASS output chunk width (a 128 multiple).
    Wider chunks amortise the window slack: the column window must
    cover bound*(cchunk-1) real taps plus a fixed 127-lane alignment
    slack (col_off stays 128-aligned for Mosaic), so the one-hot FLOPs
    per output pixel fall as win_c/cchunk -> 3.0 (128) / 2.0 (256) /
    1.67 (384) at the 1.12 bucket.  Decode granularity is independent
    (fixed 128, tied to the 768 = 6*128 sextet structure).

    ``emit`` sizes the output legs: 'packed' (v210 word planes),
    'rgba' (the composited (4,H,W) f32 frame + its accumulated alpha —
    straggler composition and ROUTE taps), or 'both'.

    ``src_kind``: 'packed' (host-split v210 word planes, decoded in
    the window) or 'rgb3' ((3,H,W) f32 frames — deinterlaced fields,
    non-v210 unpacks; the decode stage is a plain bf16 hi/lo window
    split)."""
    g, gp, wpad = _padded_geometry(width)
    if wpad % cchunk or width % 48 or width % 128 or height % 8:
        return None
    bound, preferred = BUCKET_BOUNDS[bucket]
    g2p = _ceil_to(gp + 152, 128)  # sextet decode window tail
    win_c = min(_ceil_to(bound * (cchunk - 1) + 2 + 127, 128), wpad)
    rgb3 = src_kind == "rgb3"

    # sextet_split deletes the full-window phase-plane buffer (the split
    # happens per 256-lane sextet window on the VPU instead), freeing
    # ~2 MB — enough for the next rpb rung (less decode overlap).  Its
    # ladder therefore starts at 48.
    ladder = (48, preferred, 32, 24, 16, 8) if (sextet_split or rgb3) else (
        preferred, 32, 24, 16, 8
    )
    for rpb_pref in ladder:
        rpb = _rows_per_block(height, rpb_pref)
        win_r = min(_ceil_to(bound * (rpb - 1) + 10, 8), _ceil_to(height, 8))
        # the alpha plane never rides in the window: warp(1) is the
        # separable rowsum(rw) x colsum(cw), so every buffer is 3-channel
        if rgb3:
            # f32 rgb source windows, no phase planes, no sextet stack
            winbuf = 2 * 3 * win_r * wpad * 4
            vals = 0
            sext = 0
        else:
            # DOUBLE-BUFFERED packed windows (+128-lane zero tail for
            # the in-sextet split's window reach)
            winbuf = 2 * 4 * win_r * (gp + (128 if sextet_split else 0)) * 4
            # phase planes hi/lo (none persisted when split per sextet)
            vals = 0 if sextet_split else 2 * 12 * win_r * g2p * 2
            sext = 24 * win_r * 256 * 2 + (  # sextet decode windows (stack)
                # in-sextet split temporaries (12 int32 phase planes live)
                12 * win_r * 256 * 4 if sextet_split else 0
            )
        total = (
            winbuf
            + vals
            + sext
            + 2 * 3 * win_r * wpad * 2  # decoded window hi/lo (rgb)
            + 2 * 3 * rpb * wpad * 2  # rows2 (rgb)
            + 2 * 3 * rpb * win_c * 2  # flat2 (rgb)
            + 3 * rpb * wpad * 4  # composite accumulator (rgb only:
            # 'over' needs the TOP layer's separable alpha and the
            # pack ignores alpha, so none is ever stored — unless the
            # frame EMITS rgba, which adds an alpha accumulator)
            + (2 * 3 * rpb * 768 * 2 if emit != "rgba" else 0)  # codes
            + 768 * 768 * 2  # pack one-hot (an input block either way)
            + (3 * 144 * 128 + 3 * 72 * 128) * 2  # unpack one-hots
            # double-buffered out word planes
            + (2 * 4 * rpb * gp * 4 if emit != "rgba" else 0)
            # double-buffered rgba out + the alpha accumulator
            + (2 * 4 * rpb * wpad * 4 + rpb * wpad * 4 if emit != "packed" else 0)
            + 2 * win_c * cchunk * 2  # cw (rebuilt per chunk)
            + 1 * 1024 * 1024  # Mosaic stack slop (calibrated on HW:
            # UHD rpb 40 measures 15.9M actual vs ~14.9M accounted)
            # wider column chunks keep proportionally more column-pass
            # staging live than the cw/flat2 terms account for: UHD
            # cchunk=384 rpb 40 compiles to a 16.4-17.4M scoped stack
            # vs the 14.7M this model said — scale the slop so the
            # ladder degrades rpb instead of shipping an uncompilable
            # plan (256 stays feasible at rpb 40, as measured)
            + (cchunk // 128 - 1) * 1792 * 1024
        )
        if total <= 16 * 1024 * 1024:
            return _PCfg(rpb, win_r, win_c, False)
    return None


def packed_composite_fits(
    height: int,
    width: int,
    bucket: int,
    n_layers: int,
    emit: str = "packed",
    src_kind: str = "packed",
) -> bool:
    if bucket < 0:
        return False
    return (
        _composite_config(
            height, width, bucket, n_layers, emit=emit, src_kind=src_kind
        )
        is not None
    )


def composite_cchunk(
    height: int,
    width: int,
    bucket: int,
    n_layers: int,
    sextet_split: bool = False,
    src_kind: str = "packed",
) -> int:
    """Column-pass chunk width for the composite: the widest chunk the
    frame divides into whose VMEM plan still fits (FLOPs per output
    pixel fall with chunk width; see _composite_config)."""
    wpad = _padded_geometry(width)[2]
    for cchunk in (384, 256):
        if (
            wpad % cchunk == 0
            and _composite_config(
                height, width, bucket, n_layers, cchunk, sextet_split,
                src_kind=src_kind,
            )
            is not None
        ):
            return cchunk
    return COL_CHUNK


@lru_cache(maxsize=None)
def make_packed_composite_program(
    height: int,
    width: int,
    bucket: int,
    layer_cfg: tuple,  # per layer bottom..top: n_src (1 = cut, 2 = dissolve)
    col_spec: str = "709",
    out_col_spec: str = "709",
    interpret: bool | None = None,
    cchunk: int = COL_CHUNK,
    poly_gamma: bool = False,
    sextet_split: bool = False,
    emit: str = "packed",
    src_kind: str = "packed",
    _ablate: str = "",
):
    """fn(srcs, mats (L,3,3), mixes (L,)) -> packed v210 word planes
    (4, H, G).

    ``emit``: 'packed' (default) returns the word planes; 'rgba'
    returns the composited (4, H, W) f32 frame instead — the rgb
    accumulator plus the run's over-accumulated COVERAGE alpha
    (a_out = a_prev*(1-a) + a = 1 - prod(1-a_m), exact: each layer's
    warp alpha is the rowsum x colsum outer product).  Coverage is the
    alpha STRAGGLER composition needs (the staged path places the run
    as one premultiplied layer over whatever sits below it); the
    reference's emitted-frame contract (alpha = TOP layer's alpha,
    combine.ts:47-59) is restored by the pipeline's separable
    _top_alpha_fixup when the run contains the stack top.  'both'
    returns (word planes, rgba) so an emit_rgba channel never evicts
    the one-kernel path.

    ``poly_gamma`` evaluates the decode-side gamma->linear transfer as
    a degree-9 Horner polynomial (ops.gamma.gamma2linear_poly_fn)
    instead of jnp.power — ~3e-7 vs the analytic formula, two decades
    inside this kernel's ~2^-17 class.  The encode-side l2g stays
    analytic (one evaluation per OUTPUT pixel; the decode runs once
    per source pixel per window row — 8 sources x the window overlap
    at the serving shape).

    ``sextet_split`` performs the 10-bit phase split inside each
    sextet's 256-lane window instead of once over the whole packed
    window: ~2x the split arithmetic (the sextet windows overlap by
    half) but no full-window phase-plane buffer — the freed ~2 MB
    buys the next row-block rung (rpb 48 at UHD, 24 at 8K), cutting
    every stage's decode overlap.  Bit-compatible: the same planes
    reach deint6 either way.

    ``srcs``: flat host-split (4, H, G) uint32 word-plane arrays
    (src_kind 'packed') or (3, H, W) f32 opaque frames (src_kind
    'rgb3' — deinterlaced fields, non-v210 unpacks), layers
    bottom..top, each layer contributing n_src sources (a dissolve
    pair shares its layer matrix — warp_same_mat).  Error class: the
    pair-warp bf16 hi/lo split (~2^-17, <=1 packed code vs the staged
    path).

    HD widths run at PADDED internal geometry (_padded_geometry:
    1920 px -> 384 groups -> 2304 lanes).  Packed sources are
    zero-padded to the padded group count by the wrapper (they decode
    to finite garbage that the real-width bounds check zero-weights);
    rgb3 windows carry a zeroed lane tail; padded output columns warp
    to zero, encode as black, and both emits are cropped back to real
    geometry before returning.

    ``_ablate`` (measurement only, never set by the pipeline) drops
    named stages so tools can attribute the kernel's time:
    'nosplit' (skip phase split AND chunk decode), 'nodecode' (keep
    the split, skip deinterleave/colour/gamma), 'nogamma' (decode with
    identity transfer — isolates the analytic-gamma pow cost),
    'nowarp' (skip the row/column passes; composite straight from the
    decoded window), 'nopack' (zero the outputs instead of
    encode+pack)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert emit in ("packed", "rgba", "both")
    assert src_kind in ("packed", "rgb3")
    assert emit == "packed" or not _ablate, "ablation is packed-only"
    assert src_kind == "packed" or not _ablate, "ablation is packed-only"
    rgb3 = src_kind == "rgb3"
    cfg = _composite_config(
        height, width, bucket, len(layer_cfg), cchunk, sextet_split, emit,
        src_kind,
    )
    assert cfg is not None, "caller gates on packed_composite_fits"
    rpb, win_r, win_c, _ = cfg
    n_blocks = height // rpb
    g_real, g, wpad = _padded_geometry(width)
    n_chunks = wpad // COL_CHUNK
    n_cchunks = wpad // cchunk
    # zero tail sized for the SEXTET decode windows: a (win_r, 256)
    # window at the last 128-aligned group base reaches g + 152
    g2 = g + 152
    n_gchunks = g // 128
    n_sext = n_chunks // 6  # wpad % 768 == 0 by construction
    L = len(layer_cfg)
    src_layer: list[int] = []
    src_role: list[int] = []
    for m, n_src in enumerate(layer_cfg):
        for role in range(n_src):
            src_layer.append(m)
            src_role.append(role)
    S = len(src_layer)

    col_fwd = _literals(cm.ycbcr2rgb_matrix(col_spec, 10, 64, 940, 896))
    gamut = _literals(cm.rgb2rgb_matrix(col_spec, out_col_spec))
    if poly_gamma:
        from .gamma import gamma2linear_poly_fn

        g2l = gamma2linear_poly_fn(col_spec)
    else:
        g2l, _ = _gamma_fns(col_spec, out_col_spec)
    col_bwd = _literals(cm.rgb2ycbcr_matrix(out_col_spec, 10, 64, 940, 896))
    from .pallas_kernels import _encode_rgb
    _, l2g = _gamma_fns(out_col_spec, out_col_spec)

    ab_nosplit = "nosplit" in _ablate
    ab_nodecode = ab_nosplit or "nodecode" in _ablate
    ab_nogamma = "nogamma" in _ablate
    ab_nowarp = "nowarp" in _ablate
    ab_nopack = "nopack" in _ablate

    n_packed_out = 4 if emit != "rgba" else 0
    has_rgba = emit != "packed"
    n_out = n_packed_out + (1 if has_rgba else 0)

    def kernel(*refs):
        (row_off_ref, py_ref, px_ref, col_off_ref, mix_ref) = refs[:5]
        wy_ref, wc_ref, w6_ref = refs[5:8]
        src_refs = refs[8 : 8 + S]
        outs = refs[8 + S : 8 + S + n_out]
        out_refs = outs[:n_packed_out]
        rgba_ref = outs[-1] if has_rgba else None
        (winbuf, vals, win2, rows2, flat2, comp, codes, cw, csum_s, compa, sem) = refs[
            8 + S + n_out :
        ]

        i = pl.program_id(0)

        def window_dma(block, s, slot):
            m = src_layer[s]
            r0 = pl.multiple_of(row_off_ref[m, block], 8)
            if rgb3:
                # f32 rgb window; the [width, wpad) lane tail persists
                # zero (black) from the first-block init
                dst = (
                    winbuf.at[slot, :, :, pl.ds(0, width)]
                    if wpad > width
                    else winbuf.at[slot]
                )
            else:
                dst = (
                    winbuf.at[slot, :, :, pl.ds(0, g)]
                    if sextet_split  # zero tail beyond g persists untouched
                    else winbuf.at[slot]
                )
            return pltpu.make_async_copy(
                src_refs[s].at[:, pl.ds(r0, win_r), :], dst, sem.at[slot]
            )

        # TWO windows in flight at all times: source s+1 streams while
        # source s decodes, so DMA latency never serializes with the
        # per-source math.  Each block's tail prefetches the next
        # block's first two windows.  The slot is the GLOBAL window
        # parity (block*S + s) % 2 — for even S that folds to the
        # static s % 2; for ODD S it alternates per block (traced),
        # which is exactly what keeps the rotation consistent across
        # the block boundary (a static s % 2 would refill a slot the
        # next source still holds — round-4 verdict weak #5: odd flat
        # source counts silently ran single-buffered).
        dbuf = S > 1
        odd = S % 2 == 1

        def slot_of(block, s):
            if not dbuf:
                return 0
            return (block + s) % 2 if odd else s % 2

        @pl.when(i == 0)
        def _first():
            window_dma(0, 0, 0).start()
            if dbuf:
                window_dma(0, 1, 1).start()
            # zero the window tails ONCE: DMAs only ever write the real
            # extent, and scratch persists across grid steps
            if rgb3:
                if wpad > width:
                    winbuf[:, :, :, width:] = jnp.zeros(
                        (2, 3, win_r, wpad - width), jnp.float32
                    )
            elif sextet_split:
                winbuf[:, :, :, g:] = jnp.zeros(
                    (2, 4, win_r, 128), jnp.uint32
                )
            else:
                vals[:, :, :, g:] = jnp.zeros(
                    (2, 12, win_r, g2 - g), jnp.bfloat16
                )

        def build_cw(j, m):
            c0 = pl.multiple_of(col_off_ref[m, j], 128)
            o0 = pl.multiple_of(j * cchunk, 128)
            pxc = px_ref[pl.ds(m, 1), pl.ds(o0, cchunk)]
            x0 = jnp.floor(pxc)
            fx = (pxc - x0).astype(jnp.float32)
            x0i = x0.astype(jnp.int32)
            cc = jax.lax.broadcasted_iota(jnp.int32, (win_c, cchunk), 0) + c0
            v0 = jnp.where((x0i >= 0) & (x0i < width), 1.0 - fx, 0.0)
            v1 = jnp.where((x0i + 1 >= 0) & (x0i + 1 < width), fx, 0.0)
            w = jnp.where(cc == x0i, v0, 0.0) + jnp.where(cc == x0i + 1, v1, 0.0)
            wh, wl = _hi_lo(w)
            cw[0] = wh
            cw[1] = wl
            # column weight sums: the separable half of warp(1) = alpha
            csum_s[:, :] = jnp.sum(w, axis=0, keepdims=True)

        def row_weights(m):
            r0 = pl.multiple_of(row_off_ref[m, i], 8)
            pyb = py_ref[:, pl.ds(m, 1)]
            y0 = jnp.floor(pyb)
            fy = (pyb - y0).astype(jnp.float32)
            y0i = y0.astype(jnp.int32)
            w0 = jnp.where((y0i >= 0) & (y0i < height), 1.0 - fy, 0.0)
            w1 = jnp.where((y0i + 1 >= 0) & (y0i + 1 < height), fy, 0.0)
            kk = jax.lax.broadcasted_iota(jnp.int32, (rpb, win_r), 1) + r0
            rw = jnp.where(kk == y0i, w0, 0.0) + jnp.where(kk == y0i + 1, w1, 0.0)
            rwh, rwl = _hi_lo(rw)
            # row weight sums: the other half of the separable alpha
            return rwh, rwl, jnp.sum(rw, axis=1, keepdims=True)

        def decode_window(slot):
            ys, cbs, crs = _unpack_phases(
                winbuf[slot, 0], winbuf[slot, 1], winbuf[slot, 2], winbuf[slot, 3]
            )
            for q, plane in enumerate(list(ys) + list(cbs) + list(crs)):
                vals[0, q, :, :g] = (
                    (plane >> 2).astype(jnp.float32).astype(jnp.bfloat16)
                )
                vals[1, q, :, :g] = (
                    (plane & 3).astype(jnp.float32).astype(jnp.bfloat16)
                )

        def decode_chunks(slot, gain=None, accumulate=False):
            if rgb3:
                # no decode: the window is already linear rgb f32 —
                # split (and premix) it into the bf16 hi/lo pair the
                # warp matmuls consume, one 128-lane chunk per step
                def chunk3(u, _):
                    sl = pl.ds(pl.multiple_of(u * 128, 128), 128)
                    for c in range(3):
                        val = winbuf[slot, c, :, sl]
                        if gain is not None:
                            val = val * gain
                        if accumulate:
                            val = val + (
                                win2[0, c, :, sl].astype(jnp.float32)
                                + win2[1, c, :, sl].astype(jnp.float32)
                            )
                        hi = val.astype(jnp.bfloat16)
                        lo = (val - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                        win2[0, c, :, sl] = hi
                        win2[1, c, :, sl] = lo
                    return 0

                jax.lax.fori_loop(0, n_chunks, chunk3, 0)
                return

            # fori over SEXTETS of chunks: chunk j = 6u + k has group
            # base 128u + (128k)//6 and chroma base 128u + (64k)//3 —
            # the dynamic part is 128-ALIGNED (Mosaic-legal window
            # offset) and every within-sextet offset is static, so the
            # traced body holds 6 chunk bodies instead of n_chunks.
            # This is what keeps the program small enough to compile
            # (an unrolled 8K decode overflowed the compile service).
            def sextet(u, _):
                base = pl.multiple_of(u * 128, 128)
                if sextet_split:
                    # split THIS 256-lane window from the raw words
                    ys, cbs, crs = _unpack_phases(
                        *[winbuf[slot, p, :, pl.ds(base, 256)] for p in range(4)]
                    )
                    planes = list(ys) + list(cbs) + list(crs)
                    winh = [
                        (p >> 2).astype(jnp.float32).astype(jnp.bfloat16)
                        for p in planes
                    ]
                    winl = [
                        (p & 3).astype(jnp.float32).astype(jnp.bfloat16)
                        for p in planes
                    ]
                else:
                    winh = [vals[0, q, :, pl.ds(base, 256)] for q in range(12)]
                    winl = [vals[1, q, :, pl.ds(base, 256)] for q in range(12)]

                def deint6(qs, off, w):
                    fh = jnp.concatenate(
                        [winh[q][:, off : off + 24] for q in qs], axis=1
                    )
                    fl = jnp.concatenate(
                        [winl[q][:, off : off + 24] for q in qs], axis=1
                    )
                    return 4.0 * jnp.dot(
                        fh, w, preferred_element_type=jnp.float32
                    ) + jnp.dot(fl, w, preferred_element_type=jnp.float32)

                for k in range(6):
                    wy = wy_ref[k % 3]
                    wc = wc_ref[k % 3]
                    b_off, c_off = (128 * k) // 6, (64 * k) // 3
                    ysp = deint6(range(6), b_off, wy)
                    usp = deint6(range(6, 9), c_off, wc)
                    vsp = deint6(range(9, 12), c_off, wc)
                    gam = [
                        col_fwd[c][0] * ysp
                        + col_fwd[c][1] * usp
                        + col_fwd[c][2] * vsp
                        + col_fwd[c][3]
                        for c in range(3)
                    ]
                    lin = gam if ab_nogamma else [g2l(gam[c]) for c in range(3)]
                    sl = pl.ds(pl.multiple_of(u * 768 + 128 * k, 128), 128)
                    for c in range(3):
                        val = (
                            gamut[c][0] * lin[0]
                            + gamut[c][1] * lin[1]
                            + gamut[c][2] * lin[2]
                        )
                        if gain is not None:
                            val = val * gain
                        if accumulate:
                            val = val + (
                                win2[0, c, :, sl].astype(jnp.float32)
                                + win2[1, c, :, sl].astype(jnp.float32)
                            )
                        hi = val.astype(jnp.bfloat16)
                        lo = (val - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                        win2[0, c, :, sl] = hi
                        win2[1, c, :, sl] = lo
                return 0

            jax.lax.fori_loop(0, n_sext, sextet, 0)
            # no alpha plane: warp(1) is separable (rowsum x colsum)

        def one_layer(m):
            """Decode (and premix) this layer's sources, warp once, and
            over-accumulate into the composite."""
            s0 = sum(layer_cfg[:m])
            n_src = layer_cfg[m]
            for role in range(n_src):
                s = s0 + role
                slot = slot_of(i, s)
                window_dma(i, s, slot).wait()
                if not (ab_nosplit or sextet_split or rgb3):
                    decode_window(slot)

                def refill(s=s):
                    # refill the slot two sources ahead (wrapping into
                    # the next block: the global-parity slot formula is
                    # continuous across the boundary), or one ahead
                    # when single-buffered
                    t = s + (2 if dbuf else 1)
                    if t < S:
                        window_dma(i, t, slot_of(i, t)).start()
                    else:

                        @pl.when(i + 1 < n_blocks)
                        def _():
                            window_dma(i + 1, t - S, slot_of(i + 1, t - S)).start()

                if not (sextet_split or rgb3):
                    # the phase split copied the window out: the slot
                    # is free before the chunk decode runs
                    refill()
                if ab_nodecode:
                    pass
                elif n_src == 2:
                    mix = mix_ref[m, 0]
                    decode_chunks(
                        slot,
                        gain=mix if role == 0 else 1.0 - mix,
                        accumulate=role > 0,
                    )
                else:
                    decode_chunks(slot)
                if sextet_split or rgb3:
                    # the chunk decode read winbuf directly: only now
                    # is the slot free to overwrite
                    refill()

            if ab_nowarp:
                # composite straight from the decoded window's top rpb
                # rows: keeps decode live (ref stores), drops both
                # one-hot passes and the cw/flat machinery
                for c in range(3):
                    rows = win2[0, c, 0:rpb, :].astype(jnp.float32)
                    if m == 0:
                        comp[c] = rows
                    else:
                        comp[c] = comp[c] * 0.5 + rows
                return

            rwh, rwl, rsum = row_weights(m)
            for c in range(3):
                rows = (
                    jnp.dot(rwh, win2[0, c], preferred_element_type=jnp.float32)
                    + jnp.dot(rwl, win2[0, c], preferred_element_type=jnp.float32)
                    + jnp.dot(rwh, win2[1, c], preferred_element_type=jnp.float32)
                )
                rh, rl = _hi_lo(rows)
                rows2[0, c] = rh
                rows2[1, c] = rl
            def one_chunk(j):
                o0 = pl.multiple_of(j * cchunk, 128)
                build_cw(j, m)
                c0 = pl.multiple_of(col_off_ref[m, j], 128)
                flat2[0, :, :, :] = rows2[0, :, :, pl.ds(c0, win_c)]
                flat2[1, :, :, :] = rows2[1, :, :, pl.ds(c0, win_c)]
                fh = flat2[0].reshape(3 * rpb, win_c)
                fl = flat2[1].reshape(3 * rpb, win_c)
                chunk = (
                    jnp.dot(fh, cw[0], preferred_element_type=jnp.float32)
                    + jnp.dot(fl, cw[0], preferred_element_type=jnp.float32)
                    + jnp.dot(fh, cw[1], preferred_element_type=jnp.float32)
                ).reshape(3, rpb, cchunk)
                # alpha = warp(1) = rowsum(rw) x colsum(cw), exact;
                # only the TOP layer's alpha enters 'over', so the
                # accumulator carries rgb alone
                alpha = rsum * csum_s[:, :]
                sl = pl.ds(o0, cchunk)
                if m == 0:
                    for c in range(3):
                        comp[c, :, sl] = chunk[c]  # over black: identity
                    if has_rgba:
                        compa[:, sl] = alpha
                else:
                    prev = comp[:, :, sl]
                    k = 1.0 - alpha
                    for c in range(3):
                        comp[c, :, sl] = prev[c] * k + chunk[c]
                    if has_rgba:
                        # over-accumulated alpha (exact: both factors
                        # are the layers' separable warp alphas)
                        compa[:, sl] = compa[:, sl] * k + alpha

            unroll = 2 if n_cchunks % 2 == 0 else 1

            def chunk_body(j2, _):
                for u in range(unroll):
                    one_chunk(j2 * unroll + u)
                return 0

            jax.lax.fori_loop(0, n_cchunks // unroll, chunk_body, 0)

        for m in range(L):
            one_layer(m)

        # ---- encode + spatial->phase pack per 768-lane group chunk
        # (pallas_kernels.make_v210_combine_pack's tail, encoding each
        # chunk on the fly so no full-width codes scratch is resident)
        def pack_chunk(c):
            s0 = pl.multiple_of(c * 768, 128)
            tile = comp[:, :, pl.ds(s0, 768)]
            y, u, v = _encode_rgb(tile[0], tile[1], tile[2], col_bwd, l2g, 0x3FF)
            for q, plane in enumerate((y, u, v)):
                codes[0, q] = (plane >> 2).astype(jnp.float32).astype(jnp.bfloat16)
                codes[1, q] = (plane & 3).astype(jnp.float32).astype(jnp.bfloat16)
            hi8 = codes[0].reshape(3 * rpb, 768)
            lo2 = codes[1].reshape(3 * rpb, 768)
            prod = 4.0 * jnp.dot(
                hi8, w6_ref[:, :], preferred_element_type=jnp.float32
            ) + jnp.dot(lo2, w6_ref[:, :], preferred_element_type=jnp.float32)

            def at(row, off):
                vv = prod[row * rpb : (row + 1) * rpb, off * 128 : (off + 1) * 128]
                return vv.astype(jnp.int32).astype(jnp.uint32)

            yp = [at(0, p) for p in range(6)]
            up = [at(1, 2 * s) for s in range(3)]
            vp = [at(2, 2 * s) for s in range(3)]
            sl = pl.ds(pl.multiple_of(c * 128, 128), 128)
            out_refs[0][:, sl] = (vp[0] << 20) | (yp[0] << 10) | up[0]
            out_refs[1][:, sl] = (yp[2] << 20) | (up[1] << 10) | yp[1]
            out_refs[2][:, sl] = (up[2] << 20) | (yp[3] << 10) | vp[1]
            out_refs[3][:, sl] = (yp[5] << 20) | (vp[2] << 10) | yp[4]

        if has_rgba:
            for c in range(3):
                rgba_ref[c] = comp[c]
            rgba_ref[3] = compa[:, :]

        if emit == "rgba":
            pass  # no packed legs: the frame leaves as RGBA alone
        elif ab_nopack:
            for k in range(4):
                # Mosaic has no direct f32->u32 cast: round-trip via i32
                out_refs[k][:, :] = jnp.zeros((rpb, g), jnp.uint32) + comp[
                    0, :, 0:1
                ].astype(jnp.int32).astype(jnp.uint32)
        else:
            jax.lax.fori_loop(0, n_gchunks, lambda c, _: (pack_chunk(c), 0)[1], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # row_off (L, n_blocks)
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rpb, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # px (L, W)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # col_off (L, n_chunks)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mixes (L, 1)
            pl.BlockSpec((3, 144, 128), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 72, 128), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((768, 768), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(S)],
        out_specs=(
            [
                pl.BlockSpec((rpb, g), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
                for _ in range(n_packed_out)
            ]
            + (
                [
                    pl.BlockSpec(
                        (4, rpb, wpad), lambda i, *_: (0, i, 0),
                        memory_space=pltpu.VMEM,
                    )
                ]
                if has_rgba
                else []
            )
        ),
        scratch_shapes=[
            # source windows: f32 rgb frames (rgb3) or u32 word planes
            pltpu.VMEM((2, 3, win_r, wpad), jnp.float32)
            if rgb3
            else pltpu.VMEM(
                (2, 4, win_r, g + (128 if sextet_split else 0)), jnp.uint32
            ),
            # full-window phase planes, or a placeholder when the split
            # happens per sextet window (or there is no decode at all)
            pltpu.VMEM(
                (1, 1, 8, 128)
                if (sextet_split or rgb3)
                else (2, 12, win_r, g2),
                jnp.bfloat16,
            ),
            pltpu.VMEM((2, 3, win_r, wpad), jnp.bfloat16),
            pltpu.VMEM((2, 3, rpb, wpad), jnp.bfloat16),
            pltpu.VMEM((2, 3, rpb, win_c), jnp.bfloat16),
            pltpu.VMEM((3, rpb, wpad), jnp.float32),
            pltpu.VMEM((2, 3, rpb, 768), jnp.bfloat16),
            pltpu.VMEM((2, win_c, cchunk), jnp.bfloat16),
            pltpu.VMEM((1, cchunk), jnp.float32),
            # over-accumulated alpha (rgba emits only; else a stub)
            pltpu.VMEM((rpb, wpad) if has_rgba else (8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            [jax.ShapeDtypeStruct((height, g), jnp.uint32) for _ in range(n_packed_out)]
            + (
                [jax.ShapeDtypeStruct((4, height, wpad), jnp.float32)]
                if has_rgba
                else []
            )
        ),
        interpret=interpret,
    )

    def prologue(mats):
        # texel maps over the REAL geometry (matrices are normalized to
        # real width/height); padded output columns get an out-of-range
        # map so every warp weight zeroes them -> comp pad stays black
        ix = (jnp.arange(width, dtype=jnp.float32) / width) - 0.5
        iy = (jnp.arange(height, dtype=jnp.float32) / height) - 0.5
        pxs, pys, row_offs, col_offs = [], [], [], []
        for m in range(L):
            mat = mats[m]
            px = (mat[0, 0] * ix + mat[0, 2] + 0.5) * width - 0.5
            py = (mat[1, 1] * iy + mat[1, 2] + 0.5) * height - 0.5
            if wpad > width:
                px = jnp.pad(px, (0, wpad - width), constant_values=-10.0)
            blocks = jnp.arange(n_blocks) * rpb
            row_lo = jnp.minimum(py[blocks], py[blocks + rpb - 1])
            row_offs.append(
                jnp.clip(
                    jnp.floor(row_lo).astype(jnp.int32) // 8 * 8,
                    0,
                    max(height - win_r, 0),
                )
            )
            chunks = jnp.arange(n_cchunks) * cchunk
            col_lo = jnp.minimum(px[chunks], px[chunks + cchunk - 1])
            col_offs.append(
                jnp.clip(
                    # 128-aligned (the Mosaic lane rule), NOT
                    # cchunk-aligned: finer alignment keeps the window
                    # slack at 127 lanes regardless of the chunk width
                    jnp.floor(col_lo).astype(jnp.int32) // 128 * 128,
                    0,
                    max(wpad - win_c, 0),
                )
            )
            pxs.append(px)
            pys.append(py)
        return (
            jnp.stack(row_offs),
            jnp.stack(pys, axis=-1),
            jnp.stack(pxs),
            jnp.stack(col_offs),
        )

    wy_np, wc_np = _v210_spatial_weights()
    from .pallas_kernels import _v210_pack_weights
    w6_np = _v210_pack_weights(g)

    @jax.jit
    def composite(srcs, mats, mixes):
        row_off, py, px, col_off = prologue([mats[m] for m in range(L)])
        mix_arr = jnp.asarray(mixes, jnp.float32).reshape(L, 1)
        wy_j = jnp.asarray(wy_np, jnp.bfloat16)
        wc_j = jnp.asarray(wc_np, jnp.bfloat16)
        w6_j = jnp.asarray(w6_np, jnp.bfloat16)
        if rgb3:
            ins = [s.astype(jnp.float32) for s in srcs]
        else:
            ins = [
                jnp.pad(s.astype(jnp.uint32), ((0, 0), (0, 0), (0, g - g_real)))
                if g > g_real
                else s.astype(jnp.uint32)
                for s in srcs
            ]
        outs = call(row_off, py, px, col_off, mix_arr, wy_j, wc_j, w6_j, *ins)
        if g > g_real:  # crop the pitch-pad tail back to real geometry
            outs = [
                o[:, :g_real] if o.ndim == 2 else o[:, :, :width] for o in outs
            ]
        if emit == "packed":
            return jnp.stack(outs)
        if emit == "rgba":
            return outs[-1]
        return jnp.stack(outs[:4]), outs[4]

    return composite


def make_packed_warp_program(
    height: int,
    width: int,
    bucket: int = 0,
    col_spec: str = "709",
    out_col_spec: str = "709",
    interpret: bool | None = None,
):
    """fn(planes (4,H,G) u32 host-split v210, mat) -> (4,H,W) f32 linear
    RGBA, decode+warp in one kernel (single opaque DVE layer)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _make_program(
        height, width, bucket, 1, 1, col_spec, out_col_spec, interpret
    )


def make_packed_warp_pair_program(
    height: int,
    width: int,
    bucket: int = 0,
    same_mat: bool = True,
    col_spec: str = "709",
    out_col_spec: str = "709",
    interpret: bool | None = None,
):
    """Fused dissolve pair from PACKED sources: fn(planes_a, planes_b,
    mat_a, mat_b, mix) -> warp(a)*mix + warp(b)*(1-mix), decoding both
    v210 sources inside the kernel's row windows."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _make_program(
        height, width, bucket, 2, 1 if same_mat else 2, col_spec, out_col_spec,
        interpret,
    )
