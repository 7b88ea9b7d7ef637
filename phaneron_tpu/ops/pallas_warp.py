"""Pallas axis-aligned DVE warp kernel (single source or fused
dissolve pair).

The XLA gather warp costs ~0.4-0.6 ms per 1080p source and ~4 ms at UHD
(pointwise gathers don't vectorise on the VPU); this kernel does the
whole separable bilinear warp in one pass:

- grid over output row blocks; a scalar-prefetched per-block input row
  offset drives a dynamic DMA of just the needed source-row window
  (HBM -> VMEM); the window buffer is released as soon as it is split
  to bf16, so the next DMA streams in behind the matmul work;
- BOTH resample passes run as one-hot banded-matmul MXU ops: the
  bilinear weight matrix (two non-zeros per output row/column) is built
  in-VMEM from iota comparisons, and values/weights are split into bf16
  hi/lo pairs combined as vh*wh + vl*wh + vh*wl — ~2^-17 relative error
  vs the f32 gather formulation, far inside the 10-bit quantisation
  step (packed codes match the XLA path to <=1 code at rte boundaries;
  the reference's own OpenCL LINEAR sampler only guarantees ~8-bit
  filter weights, transform.ts:26-29);
- column weights depend only on the chunk, not the row block, so they
  are built ONCE (first grid step) into a persistent scratch and reused
  by every block when they fit the VMEM budget;
- with n_src=2 the kernel warps BOTH dissolve sources and accumulates
  out = warp(a)*mix + warp(b)*(1-mix) — the transition needs one fused
  launch instead of two warps plus an elementwise mix over full frames
  (transition.ts:60-65).  Source b's window DMA overlaps source a's
  column pass.  Identical arithmetic to the two-kernel formulation.
- wipe transitions run the SAME fused pair with a per-pixel mask block
  in place of the scalar mix: out = warp(a)*(1-m) + warp(b)*m
  (transition.ts:66-74) — a wipe with transform costs one kernel, the
  same as a dissolve, instead of two warps + an XLA mask blend.

The row/column window sizes are STATIC per compiled program, selected
host-side from the transform matrix via scale BUCKETS (bound 1x / 2x /
4x): a warp never reads more than ~1.1-1.7x of the rows it consumes.
Callers pick the bucket with bucket_of() (a static LayerSpec field, so
animating scale recompiles at most once per bucket) and fall back to
the XLA gather warp when bucket_of returns -1.  Border-zero
(CLK_ADDRESS_CLAMP) semantics identical to ops.geometry
(transform.ts:26-59).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "make_warp_program",
    "make_warp_pair_program",
    "make_wipe_pair_program",
    "bucket_of",
    "warp_fits",
    "warp_alpha_vectors",
    "BUCKET_BOUNDS",
]

COL_CHUNK = 128
# Column-pass output chunk width for the warp family: 128 (proven on
# hardware), 256/384 (wider chunks amortise the fixed 127-lane window
# alignment slack — fewer one-hot FLOPs per output pixel), or None to
# auto-pick the widest that divides the frame and fits VMEM.  Flip
# after the hardware A/B (tools/warp_ablate.py).
WARP_CCHUNK: int | None = 128
# bucket -> (max |m00|/|m11| covered, preferred output rows per block).
# The near-1 buckets matter: broadcast DVE fills hover around 0.85-1.0x
# scale (|m| 1.0-1.18), and window rows — hence the packed kernels'
# DECODE overlap — are sized by the BUCKET bound, not the matrix: the
# 1.12 rung cuts a 0.9x fill's decode window from 64 to 56 rows.
BUCKET_BOUNDS = ((1.0, 40), (1.12, 40), (1.25, 40), (2.0, 40), (4.0, 16))
VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the 16M scoped limit


class _Cfg(NamedTuple):
    rpb: int
    win_r: int
    win_c: int
    persist_cw: bool


def _rows_per_block(height: int, preferred: int) -> int:
    for r in (preferred, 32, 24, 16, 8, 4, 2, 1):
        if r <= preferred and height % r == 0:
            return r
    return 1


def _ceil_to(v: float, m: int) -> int:
    return int(-(-v // m) * m)


def _config(
    height: int,
    width: int,
    bucket: int,
    n_mat: int,
    with_mask: bool = False,
    cchunk: int = COL_CHUNK,
    pair_buf: bool = False,
    n_ch: int = 4,
) -> _Cfg:
    bound, preferred = BUCKET_BOUNDS[bucket]
    # column window: bound*(cchunk-1) real taps + 2 bilinear + 127-lane
    # alignment slack (col_off stays 128-aligned whatever the chunk
    # width) — FLOPs per output pixel fall as win_c/cchunk with wider
    # chunks (3.0 at 128 -> 1.67 at 384 for the 1.12 bucket)
    win_c = min(_ceil_to(bound * (cchunk - 1) + 2 + 127, 128), width)
    n_chunks = width // cchunk

    def plan(rpb_pref: int, persist: bool) -> tuple[_Cfg, int]:
        rpb = _rows_per_block(height, rpb_pref)
        # taps floor(py), floor(py)+1 over a block spanning bound*(rpb-1),
        # plus 8-row DMA alignment slack and one row of floor safety
        win_r = min(_ceil_to(bound * (rpb - 1) + 10, 8), _ceil_to(height, 8))
        # pair_buf: the premix dissolve holds BOTH sources' windows so
        # source B streams behind source A's bf16 split (without it the
        # B DMA start+wait is fully exposed every block)
        win = (2 if pair_buf else 1) * n_ch * win_r * width * 4
        win2 = n_ch * 2 * win_r * width * 2
        rows = 2 * n_ch * rpb * width * 2
        out = 2 * n_ch * rpb * width * 4  # double-buffered output block
        flat = 2 * n_ch * rpb * win_c * 2
        mask = 2 * rpb * width * 4 if with_mask else 0  # wipe mask block
        cw_slots = n_mat * n_chunks if persist else 1
        cw = cw_slots * 2 * win_c * cchunk * 2
        # wider column chunks keep more column-pass staging live than
        # the cw/flat terms account for (same lesson as the packed
        # composite's model): scale the headroom so a wide-chunk plan
        # the compiler's scoped 16M limit would reject is never chosen
        slop = (cchunk // 128 - 1) * 1792 * 1024
        return _Cfg(rpb, win_r, win_c, persist), (
            win + win2 + rows + out + flat + mask + cw + slop
        )

    # biggest block size whose persisted-weight layout fits VMEM wins
    # (fewer grid steps -> less fixed per-block cost); if none fits,
    # rebuild weights per block, shrinking the block until the scratch
    # fits (8K × strong-minification buckets overflow at rpb 16+); a
    # geometry that can never fit raises, and callers fall back to the
    # XLA gather via warp_fits()
    for rpb_pref in (preferred, 24, 16, 8):
        cfg, bytes_ = plan(rpb_pref, True)
        if bytes_ <= VMEM_BUDGET:
            return cfg
    for rpb_pref in (preferred, 24, 16, 8, 4, 2, 1):
        cfg, bytes_ = plan(rpb_pref, False)
        if bytes_ <= VMEM_BUDGET:
            return cfg
    raise ValueError(
        f"warp scratch cannot fit VMEM: {height}x{width} bucket {bucket} n_mat {n_mat}"
    )


def warp_fits(
    height: int,
    width: int,
    bucket: int,
    n_mat: int = 1,
    with_mask: bool = False,
    pair_buf: bool = False,
    n_ch: int = 4,
) -> bool:
    """True when the warp kernel's scratch fits the VMEM budget for this
    geometry/bucket — callers gate Pallas-vs-XLA-gather on it.
    ``pair_buf``: the premix dissolve's second window buffer (dissolve
    pairs with a shared matrix)."""
    if bucket < 0:
        return False
    try:
        _config(height, width, bucket, n_mat, with_mask, pair_buf=pair_buf, n_ch=n_ch)
        return True
    except ValueError:
        return False


def warp_alpha_vectors(height: int, width: int, mat) -> tuple:
    """(wy (H,), wx (W,)) f32 with warp(ones)(y, x) == wy[y] * wx[x].

    An axis-aligned bilinear warp of the constant-1 plane is SEPARABLE:
    each output pixel's alpha is (row-weight sum) x (column-weight sum)
    — 1 in the projected interior, a bilinear feather at the quad edge,
    0 outside (border-zero CLK_ADDRESS_CLAMP, ops.geometry).  Opaque
    sources therefore never carry an alpha plane through yadif or the
    warp ((3, H, W) rings); the combine rebuilds alpha as this outer
    product, fused into its elementwise chain by XLA.  Weight formulas
    match the kernel prologue exactly; the kernel's bf16 hi/lo dot adds
    its usual ~2^-17 class on top of these f32 values."""
    ix = (jnp.arange(width, dtype=jnp.float32) / width) - 0.5
    iy = (jnp.arange(height, dtype=jnp.float32) / height) - 0.5
    px = (mat[0, 0] * ix + mat[0, 2] + 0.5) * width - 0.5
    py = (mat[1, 1] * iy + mat[1, 2] + 0.5) * height - 0.5

    def weight_sum(p, size):
        p0 = jnp.floor(p)
        f = (p - p0).astype(jnp.float32)
        p0i = p0.astype(jnp.int32)
        w0 = jnp.where((p0i >= 0) & (p0i < size), 1.0 - f, 0.0)
        w1 = jnp.where((p0i + 1 >= 0) & (p0i + 1 < size), f, 0.0)
        return w0 + w1

    return weight_sum(py, height), weight_sum(px, width)


def bucket_of(*mats: np.ndarray) -> int:
    """Smallest scale bucket covering all given matrices, or -1 when the
    warp must fall back to the XLA gather (rotation/shear terms, or
    scale span beyond the largest bucket).  Host-side static decision —
    goes into LayerSpec so the program cache keys on it."""
    span = 0.0
    for mat in mats:
        if abs(float(mat[0, 1])) > 1e-12 or abs(float(mat[1, 0])) > 1e-12:
            return -1
        span = max(span, abs(float(mat[0, 0])), abs(float(mat[1, 1])))
    for b, (bound, _) in enumerate(BUCKET_BOUNDS):
        if span <= bound:
            return b
    return -1


def _hi_lo(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (hi, lo) bf16 pair; hi + lo carries ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@lru_cache(maxsize=None)
def _make_program(
    height: int,
    width: int,
    bucket: int,
    n_src: int,
    n_mat: int,
    interpret: bool,
    _variant: str = "full",
    pair_mode: str = "dissolve",
    cchunk: int | None = None,
    n_ch: int = 4,
):
    assert width % COL_CHUNK == 0, "caller gates on width % 128 (pipeline._pick_warp)"
    assert n_src in (1, 2) and n_mat in (1, n_src)
    assert n_ch in (3, 4)  # 3: opaque rings carry no alpha plane
    mixing = n_src == 2
    wipe = mixing and pair_mode == "wipe"
    if cchunk is None:
        cchunk = WARP_CCHUNK
    # candidate ladder: a requested width falls back to 128 when it
    # does not divide the frame or its plan cannot fit VMEM — a knob
    # value must never silently leave tail columns unwritten
    premix = mixing and not wipe and n_mat == 1
    for cand in ((cchunk,) if cchunk else (384, 256)) + (COL_CHUNK,):
        if width % cand:
            continue
        try:
            _config(
                height, width, bucket, n_mat,
                with_mask=wipe, cchunk=cand, pair_buf=premix, n_ch=n_ch,
            )
        except ValueError:
            continue
        cchunk = cand
        break
    else:
        cchunk = COL_CHUNK
    rpb, win_r, win_c, persist_cw = _config(
        height, width, bucket, n_mat,
        with_mask=wipe, cchunk=cchunk, pair_buf=premix, n_ch=n_ch,
    )
    n_blocks = height // rpb
    n_chunks = width // cchunk

    def kernel(*refs):
        (row_off_ref, py_ref, px_ref, col_off_ref) = refs[:4]
        idx = 4
        mix_ref = None
        if mixing:
            mix_ref = refs[idx]  # scalar mix (SMEM) or per-pixel mask block (VMEM)
            idx += 1
        src_refs = refs[idx : idx + n_src]
        out_ref = refs[idx + n_src]
        rest = refs[idx + n_src + 1 :]
        if premix:
            (winbuf, winbuf_b, win2, rows2, flat2, cw, sem, sem_b) = rest
        else:
            (winbuf, win2, rows2, flat2, cw, sem) = rest
            winbuf_b = sem_b = None

        i = pl.program_id(0)

        def window_dma(block, s):
            m = min(s, n_mat - 1)
            r0 = pl.multiple_of(row_off_ref[m, block], 8)
            # premix: source B streams into its OWN buffer/semaphore so
            # its DMA overlaps source A's bf16 split
            buf, sm = (winbuf_b, sem_b) if (premix and s == 1) else (winbuf, sem)
            return pltpu.make_async_copy(
                src_refs[s].at[:, pl.ds(r0, win_r), :], buf, sm
            )

        @pl.when(i == 0)
        def _first():
            window_dma(0, 0).start()
            if premix:
                window_dma(0, 1).start()

        # ---- column weights [wh, wl]: chunk-dependent only — build once
        # on the first block when they fit VMEM, else per block
        def build_cw(j, m, store):
            c0 = pl.multiple_of(col_off_ref[m, j], 128)
            o0 = pl.multiple_of(j * cchunk, 128)
            pxc = px_ref[pl.ds(m, 1), pl.ds(o0, cchunk)]  # (1, cchunk)
            x0 = jnp.floor(pxc)
            fx = (pxc - x0).astype(jnp.float32)
            x0i = x0.astype(jnp.int32)
            cc = jax.lax.broadcasted_iota(jnp.int32, (win_c, cchunk), 0) + c0
            v0 = jnp.where((x0i >= 0) & (x0i < width), 1.0 - fx, 0.0)
            v1 = jnp.where((x0i + 1 >= 0) & (x0i + 1 < width), fx, 0.0)
            w = jnp.where(cc == x0i, v0, 0.0) + jnp.where(cc == x0i + 1, v1, 0.0)
            wh, wl = _hi_lo(w)
            cw[store, 0] = wh
            cw[store, 1] = wl

        if persist_cw and _variant in ("full", "cols"):

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

        def start_next(s):
            if s + 1 < n_src:
                window_dma(i, s + 1).start()
            else:

                @pl.when(i + 1 < n_blocks)
                def _():
                    window_dma(i + 1, 0).start()

        def row_col_passes(m, s, gain=None, accumulate_out=False):
            # ---- row pass: rows = rw @ win per channel on the MXU
            rwh, rwl = row_weights(m)
            if _variant != "cols":
                for c in range(n_ch):
                    rows = (
                        jnp.dot(rwh, win2[0, c], preferred_element_type=jnp.float32)
                        + jnp.dot(rwl, win2[0, c], preferred_element_type=jnp.float32)
                        + jnp.dot(rwh, win2[1, c], preferred_element_type=jnp.float32)
                    )
                    if _variant == "rows":
                        out_ref[c] = rows
                        continue
                    rh, rl = _hi_lo(rows)
                    rows2[0, c] = rh
                    rows2[1, c] = rl
                if _variant == "rows":
                    return

            # ---- column pass: windowed one-hot matmul per 128-lane
            # chunk (values can't be dynamically sliced in Mosaic; refs
            # can).  fori_loop, NOT a Python loop: full unrolling at UHD
            # overflows the Mosaic scoped-vmem stack.
            def one_chunk(j):
                o0 = pl.multiple_of(j * cchunk, 128)
                if persist_cw:
                    store = m * n_chunks + j
                else:
                    store = 0
                    build_cw(j, m, 0)
                c0 = pl.multiple_of(col_off_ref[m, j], 128)
                flat2[0, :, :, :] = rows2[0, :, :, pl.ds(c0, win_c)]
                flat2[1, :, :, :] = rows2[1, :, :, pl.ds(c0, win_c)]
                fh = flat2[0].reshape(n_ch * rpb, win_c)
                fl = flat2[1].reshape(n_ch * rpb, win_c)
                chunk = (
                    jnp.dot(fh, cw[store, 0], preferred_element_type=jnp.float32)
                    + jnp.dot(fl, cw[store, 0], preferred_element_type=jnp.float32)
                    + jnp.dot(fh, cw[store, 1], preferred_element_type=jnp.float32)
                ).reshape(n_ch, rpb, cchunk)
                if wipe:
                    # wipe masks in OUTPUT space (transition.ts:66-74):
                    # out = warp(a)*(1-m) + warp(b)*m per pixel
                    mtile = mix_ref[:, pl.ds(o0, cchunk)]
                    chunk = chunk * ((1.0 - mtile) if s == 0 else mtile)
                elif gain is not None:
                    chunk = chunk * gain
                if accumulate_out:
                    chunk = out_ref[:, :, pl.ds(o0, cchunk)] + chunk
                out_ref[:, :, pl.ds(o0, cchunk)] = chunk

            # unrolled x2 inside the loop: the TPU scalar core's
            # per-iteration overhead is visible at 30 chunks/block
            unroll = 2 if n_chunks % 2 == 0 else 1

            def chunk_body(j2, _):
                for u in range(unroll):
                    one_chunk(j2 * unroll + u)
                return 0

            jax.lax.fori_loop(0, n_chunks // unroll, chunk_body, 0)

        def split_window(gain=None, accumulate=False, buf=None):
            """window f32 -> win2 bf16 hi/lo (the window is then dead and
            the next DMA can stream into it).  ``gain``/``accumulate``
            implement the PREMIX dissolve: win2 = a*mix + b*(1-mix)."""
            if buf is None:
                buf = winbuf
            for c in range(n_ch):
                val = buf[c]
                if gain is not None:
                    val = val * gain
                if accumulate:
                    val = val + (
                        win2[0, c].astype(jnp.float32)
                        + win2[1, c].astype(jnp.float32)
                    )
                vh, vl = _hi_lo(val)
                win2[0, c] = vh
                win2[1, c] = vl

        def process_source(s):
            """Window -> bf16 split -> next DMA -> row pass -> col pass,
            accumulating into out_ref (sequential sources: one window
            buffer; source s+1's DMA overlaps source s's matmuls)."""
            m = min(s, n_mat - 1)
            window_dma(i, s).wait()

            if _variant == "dma":
                out_ref[:] = winbuf[:, :rpb, :]
                start_next(s)
                return

            if _variant == "cols":
                for c in range(n_ch):
                    vh, vl = _hi_lo(winbuf[c, :rpb, :])
                    rows2[0, c] = vh
                    rows2[1, c] = vl
            else:
                split_window()
            start_next(s)
            if mixing and not wipe:
                row_col_passes(
                    m, s,
                    gain=mix_ref[0, 0] if s == 0 else 1.0 - mix_ref[0, 0],
                    accumulate_out=s > 0,
                )
            else:
                row_col_passes(m, s, accumulate_out=wipe and s > 0)

        if premix:
            # PREMIX: a same-matrix dissolve mixes the two windows and
            # warps ONCE — the bilinear warp is linear in its source, so
            # warp(a)*mix + warp(b)*(1-mix) == warp(a*mix + b*(1-mix)),
            # at half the row/column passes (the wipe's mask lives in
            # output space and cannot premix).  Both windows have their
            # own buffer+semaphore and are in flight since the previous
            # block's splits, so neither DMA is exposed; the next
            # block's pair streams behind this block's matmul passes.
            window_dma(i, 0).wait()
            split_window(gain=mix_ref[0, 0])
            window_dma(i, 1).wait()
            split_window(gain=1.0 - mix_ref[0, 0], accumulate=True, buf=winbuf_b)

            @pl.when(i + 1 < n_blocks)
            def _prefetch_pair():
                window_dma(i + 1, 0).start()
                window_dma(i + 1, 1).start()

            row_col_passes(0, 0)
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
        + (
            # wipe: per-pixel mask row block; dissolve: scalar mix
            [pl.BlockSpec((rpb, width), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)]
            if wipe
            else [pl.BlockSpec(memory_space=pltpu.SMEM)]
            if mixing
            else []
        )
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_src)],  # srcs in HBM
        out_specs=pl.BlockSpec(
            (n_ch, rpb, width), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((n_ch, win_r, width), jnp.float32)]
        + ([pltpu.VMEM((n_ch, win_r, width), jnp.float32)] if premix else [])
        + [
            pltpu.VMEM((2, n_ch, win_r, width), jnp.bfloat16),
            pltpu.VMEM((2, n_ch, rpb, width), jnp.bfloat16),
            pltpu.VMEM((2, n_ch, rpb, win_c), jnp.bfloat16),
            pltpu.VMEM(
                ((n_mat * n_chunks if persist_cw else 1), 2, win_c, cchunk),
                jnp.bfloat16,
            ),
            pltpu.SemaphoreType.DMA,
        ]
        + ([pltpu.SemaphoreType.DMA] if premix else []),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ch, height, width), jnp.float32),
        interpret=interpret,
    )

    def prologue(mats):
        """Per-matrix texel maps and window offsets (stacked (n_mat, ...))."""
        ix = (jnp.arange(width, dtype=jnp.float32) / width) - 0.5
        iy = (jnp.arange(height, dtype=jnp.float32) / height) - 0.5
        pxs, pys, row_offs, col_offs = [], [], [], []
        for mat in mats:
            # normalized coords -> texel space (OpenCL LINEAR: u*size - 0.5)
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
            chunks = jnp.arange(n_chunks) * cchunk
            col_lo = jnp.minimum(px[chunks], px[chunks + cchunk - 1])
            col_offs.append(
                jnp.clip(
                    jnp.floor(col_lo).astype(jnp.int32) // 128 * 128,
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

    if n_src == 1:

        @jax.jit
        def warp(src, mat):
            row_off, py, px, col_off = prologue([mat])
            return call(row_off, py, px, col_off, src)

        return warp

    if wipe:

        @jax.jit
        def wipe_pair(src_a, src_b, mat_a, mat_b, mask):
            mats = [mat_a] if n_mat == 1 else [mat_a, mat_b]
            row_off, py, px, col_off = prologue(mats)
            return call(row_off, py, px, col_off, mask, src_a, src_b)

        return wipe_pair

    @jax.jit
    def warp_pair(src_a, src_b, mat_a, mat_b, mix):
        mats = [mat_a] if n_mat == 1 else [mat_a, mat_b]
        row_off, py, px, col_off = prologue(mats)
        mix_arr = jnp.asarray(mix, jnp.float32).reshape(1, 1)
        return call(row_off, py, px, col_off, mix_arr, src_a, src_b)

    return warp_pair


def make_warp_program(
    height: int,
    width: int,
    bucket: int = 0,
    interpret: bool | None = None,
    _variant: str = "full",
    cchunk: int | None = None,
    n_ch: int = 4,
):
    """fn(src (C,H,W) f32, mat (3,3) f32) -> (C,H,W) f32 (C = n_ch).

    ``bucket`` must come from bucket_of(mat) (static); ``width`` must be
    a multiple of 128 (lane-aligned column windows).  ``_variant``
    selects ablated kernels ('dma', 'rows', 'cols') for perf isolation
    (tools/warp_ablate.py) — production always uses 'full'.  ``n_ch=3``
    warps alpha-free opaque rings; the warped alpha is the separable
    warp_alpha_vectors() outer product."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _make_program(
        height, width, bucket, 1, 1, interpret, _variant, cchunk=cchunk, n_ch=n_ch
    )


def make_warp_pair_program(
    height: int,
    width: int,
    bucket: int = 0,
    same_mat: bool = True,
    interpret: bool | None = None,
    cchunk: int | None = None,
    n_ch: int = 4,
):
    """Fused dissolve pair: fn(src_a, src_b, mat_a, mat_b, mix) ->
    warp(src_a)*mix + warp(src_b)*(1-mix), one kernel launch.

    ``same_mat`` (static, from LayerSpec) shares the weight tables when
    both sources carry the same transform — the common case during a
    transition.  ``n_ch=3``: alpha-free opaque rings (see
    make_warp_program)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _make_program(
        height, width, bucket, 2, 1 if same_mat else 2, interpret,
        cchunk=cchunk, n_ch=n_ch,
    )


def make_wipe_pair_program(
    height: int,
    width: int,
    bucket: int = 0,
    same_mat: bool = True,
    interpret: bool | None = None,
):
    """Fused wipe pair: fn(src_a, src_b, mat_a, mat_b, mask (H, W)) ->
    warp(src_a)*(1-mask) + warp(src_b)*mask, one kernel launch — the
    wipe transition (transition.ts:66-74) at dissolve cost."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _make_program(
        height, width, bucket, 2, 1 if same_mat else 2, interpret, pair_mode="wipe"
    )


# ---------------------------------------------------------------------------
# All layers in one launch: warp every (dissolve-pair | single) source and
# over-composite them without materialising per-layer frames in HBM.
# Inputs are POST-unpack spatial RGBA, so unlike ops/pallas_composite
# (packed-source variant, VPU-bound on its phase-window gather) the
# column machinery here is the proven spatial one of this module.
# Replaces L pair-warp launches + the XLA combine: at UHD 4-layer that
# is 3 fewer launches and ~1 GB less intermediate HBM traffic.


def _layers_cfg(height: int, width: int, bucket: int, layer_cfg: tuple):
    """rpb plan with the extra pair buffer accounted; None = fall back."""
    bound, preferred = BUCKET_BOUNDS[bucket]
    n_mat = len(layer_cfg)
    win_c = min(_ceil_to(bound * (COL_CHUNK - 1) + 2 + (COL_CHUNK - 1), 128), width)
    n_chunks = width // COL_CHUNK

    def plan(rpb_pref: int, persist: bool):
        rpb = _rows_per_block(height, rpb_pref)
        win_r = min(_ceil_to(bound * (rpb - 1) + 10, 8), _ceil_to(height, 8))
        win = 4 * win_r * width * 4
        win2 = 4 * 2 * win_r * width * 2
        rows = 2 * 4 * rpb * width * 2
        out = 2 * 4 * rpb * width * 4
        flat = 2 * 4 * rpb * win_c * 2
        pair = 4 * rpb * width * 4
        cw_slots = n_mat * n_chunks if persist else 1
        cw = cw_slots * 2 * win_c * COL_CHUNK * 2
        return _Cfg(rpb, win_r, win_c, persist), win + win2 + rows + out + flat + pair + cw

    for rpb_pref in (preferred, 24, 16, 8):
        cfg, bytes_ = plan(rpb_pref, True)
        if bytes_ <= VMEM_BUDGET:
            return cfg
    for rpb_pref in (preferred, 24, 16, 8, 4, 2, 1):
        cfg, bytes_ = plan(rpb_pref, False)
        if bytes_ <= VMEM_BUDGET and cfg.rpb >= 8:
            return cfg
    return None


def layers_combine_fits(height: int, width: int, bucket: int, layer_cfg: tuple) -> bool:
    if bucket < 0 or width % COL_CHUNK or height % 8:
        return False
    return _layers_cfg(height, width, bucket, layer_cfg) is not None


@lru_cache(maxsize=None)
def make_layers_combine_program(
    height: int,
    width: int,
    bucket: int,
    layer_cfg: tuple,  # per layer bottom..top: n_src (1 = cut, 2 = dissolve pair)
    interpret: bool | None = None,
):
    """fn(srcs, mats (L,3,3), mixes (L,)) -> composited (4, H, W).

    ``srcs``: flat spatial RGBA frames, layers bottom..top, each layer
    contributing n_src sources (a dissolve pair shares its matrix —
    warp_same_mat).  Per layer: warp each source, mix the pair
    (transition.ts:60-65), then premultiplied 'over' onto the running
    composite (combine.ts:47-59; the black base is the implicit zero
    start).  Error class: the pair-warp bf16 split (~2^-17)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert width % COL_CHUNK == 0
    cfg = _layers_cfg(height, width, bucket, layer_cfg)
    assert cfg is not None, "caller gates on layers_combine_fits"
    rpb, win_r, win_c, persist_cw = cfg
    n_blocks = height // rpb
    n_chunks = width // COL_CHUNK
    L = len(layer_cfg)
    src_layer: list[int] = []
    src_role: list[int] = []
    for m, n_src in enumerate(layer_cfg):
        for rrole in range(n_src):
            src_layer.append(m)
            src_role.append(rrole)
    S = len(src_layer)

    def kernel(*refs):
        (row_off_ref, py_ref, px_ref, col_off_ref, mix_ref) = refs[:5]
        src_refs = refs[5 : 5 + S]
        out_ref = refs[5 + S]
        (winbuf, win2, rows2, flat2, pairbuf, cw, sem) = refs[5 + S + 1 :]

        i = pl.program_id(0)

        def window_dma(block, s):
            m = src_layer[s]
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
            pxc = px_ref[pl.ds(m, 1), pl.ds(o0, COL_CHUNK)]
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
                for m in range(L):
                    jax.lax.fori_loop(
                        0,
                        n_chunks,
                        lambda j, _, m=m: (build_cw(j, m, m * n_chunks + j), 0)[1],
                        0,
                    )

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
            return _hi_lo(rw)

        def process_source(s):
            m = src_layer[s]
            role = src_role[s]
            n_src = layer_cfg[m]
            window_dma(i, s).wait()
            for c in range(4):
                vh, vl = _hi_lo(winbuf[c])
                win2[0, c] = vh
                win2[1, c] = vl
            if s + 1 < S:
                window_dma(i, s + 1).start()
            else:

                @pl.when(i + 1 < n_blocks)
                def _():
                    window_dma(i + 1, 0).start()

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

            mix = mix_ref[m, 0]
            gain = (mix if role == 0 else 1.0 - mix) if n_src == 2 else 1.0
            closes_layer = role == n_src - 1

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
                ).reshape(4, rpb, COL_CHUNK) * gain
                sl = pl.ds(o0, COL_CHUNK)
                if role > 0:
                    chunk = pairbuf[:, :, sl] + chunk
                if not closes_layer:
                    pairbuf[:, :, sl] = chunk
                    return
                # fold the completed layer into the running composite
                if m == 0:
                    out_ref[:, :, sl] = chunk  # over black: identity
                else:
                    prev = out_ref[:, :, sl]
                    k = 1.0 - chunk[3]
                    for c in range(3):
                        out_ref[c, :, sl] = prev[c] * k + chunk[c]
                    out_ref[3, :, sl] = chunk[3]

            unroll = 2 if n_chunks % 2 == 0 else 1

            def chunk_body(j2, _):
                for u in range(unroll):
                    one_chunk(j2 * unroll + u)
                return 0

            jax.lax.fori_loop(0, n_chunks // unroll, chunk_body, 0)

        for s in range(S):
            process_source(s)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # row_off (L, n_blocks)
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rpb, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # px (L, W)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # col_off (L, n_chunks)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mix (L, 1)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(S)],
        out_specs=pl.BlockSpec(
            (4, rpb, width), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((4, win_r, width), jnp.float32),
            pltpu.VMEM((2, 4, win_r, width), jnp.bfloat16),
            pltpu.VMEM((2, 4, rpb, width), jnp.bfloat16),
            pltpu.VMEM((2, 4, rpb, win_c), jnp.bfloat16),
            pltpu.VMEM((4, rpb, width), jnp.float32),
            pltpu.VMEM(
                ((L * n_chunks if persist_cw else 1), 2, win_c, COL_CHUNK),
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

    @jax.jit
    def combine_layers(srcs, mats, mixes):
        row_off, py, px, col_off = prologue([mats[m] for m in range(L)])
        mix_arr = jnp.asarray(mixes, jnp.float32).reshape(L, 1)
        return call(row_off, py, px, col_off, mix_arr, *srcs)

    return combine_layers
