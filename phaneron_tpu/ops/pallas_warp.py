"""Pallas axis-aligned DVE warp kernel.

The XLA gather warp costs ~0.4-0.6 ms per 1080p source and ~4 ms at UHD
(pointwise gathers don't vectorise on the VPU); this kernel does the
whole separable bilinear warp in one pass:

- grid over output row blocks; a scalar-prefetched per-block input row
  offset drives a dynamic DMA of just the needed source-row window
  (HBM -> VMEM), DOUBLE-BUFFERED so block i+1's window streams in while
  block i computes — the input never materialises in full in VMEM;
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
  by every block — when the scratch fits the VMEM budget (computed
  host-side; at UHD the window takes priority and weights rebuild per
  block).

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

__all__ = ["make_warp_program", "bucket_of", "BUCKET_BOUNDS"]

COL_CHUNK = 128
# bucket -> (max |m00|/|m11| covered, preferred output rows per block)
BUCKET_BOUNDS = ((1.0, 40), (2.0, 40), (4.0, 16))
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


def _config(height: int, width: int, bucket: int) -> _Cfg:
    bound, preferred = BUCKET_BOUNDS[bucket]
    win_c = min(_ceil_to(bound * (COL_CHUNK - 1) + 2 + (COL_CHUNK - 1), 128), width)
    n_chunks = width // COL_CHUNK

    def plan(rpb_pref: int) -> tuple[_Cfg, int]:
        rpb = _rows_per_block(height, rpb_pref)
        # taps floor(py), floor(py)+1 over a block spanning bound*(rpb-1),
        # plus 8-row DMA alignment slack and one row of floor safety
        win_r = min(_ceil_to(bound * (rpb - 1) + 10, 8), _ceil_to(height, 8))
        win = 4 * win_r * width * 4
        win2 = 4 * 2 * win_r * width * 2
        rows = 2 * 4 * rpb * width * 2
        out = 2 * 4 * rpb * width * 4  # double-buffered output block
        flat = 2 * 4 * rpb * win_c * 2
        cw = n_chunks * 2 * win_c * COL_CHUNK * 2  # persisted weights
        return _Cfg(rpb, win_r, win_c, True), win + win2 + rows + out + flat + cw

    # biggest block size whose persisted-weight layout fits VMEM wins
    # (fewer grid steps -> less fixed per-block cost); if none fits,
    # rebuild weights per block with the preferred block size
    for rpb_pref in (preferred, 24, 16, 8):
        cfg, bytes_ = plan(rpb_pref)
        if bytes_ <= VMEM_BUDGET:
            return cfg
    cfg, _ = plan(preferred)
    return cfg._replace(persist_cw=False)


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
def make_warp_program(
    height: int,
    width: int,
    bucket: int = 0,
    interpret: bool | None = None,
    _variant: str = "full",
):
    """fn(src (4,H,W) f32, mat (3,3) f32) -> (4,H,W) f32.

    ``bucket`` must come from bucket_of(mat) (static); ``width`` must be
    a multiple of 128 (lane-aligned column windows).  ``_variant``
    selects ablated kernels ('dma', 'rows', 'cols') for perf isolation
    (tools/warp_ablate.py) — production always uses 'full'."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert width % COL_CHUNK == 0, "caller gates on width % 128 (pipeline._pick_warp)"
    rpb, win_r, win_c, persist_cw = _config(height, width, bucket)
    n_blocks = height // rpb
    n_chunks = width // COL_CHUNK

    def kernel(
        row_off_ref,  # scalar prefetch (n_blocks,) int32
        py_ref,  # VMEM (rpb, 1) f32 block
        px_ref,  # VMEM (1, W) f32
        col_off_ref,  # SMEM (1, n_chunks) int32
        src_ref,  # ANY (4, H, W) f32 (stays in HBM)
        out_ref,  # VMEM (4, rpb, W) f32 block
        winbuf,  # scratch VMEM (4, win_r, W) f32
        win2,  # scratch VMEM (2, 4, win_r, W) bf16 [vh, vl]
        rows2,  # scratch VMEM (2, 4, rpb, W) bf16 [vh, vl]
        flat2,  # scratch VMEM (2, 4, rpb, win_c) bf16
        cw,  # scratch VMEM (n_chunks|1, 2, win_c, CHUNK) bf16 [wh, wl]
        sem,  # DMA semaphore
    ):
        i = pl.program_id(0)

        def window_dma(block):
            r0 = pl.multiple_of(row_off_ref[block], 8)
            return pltpu.make_async_copy(
                src_ref.at[:, pl.ds(r0, win_r), :], winbuf, sem
            )

        def start_next():
            # the window is consumed (split into win2) early, so block
            # i+1's DMA streams into the SAME buffer while block i's
            # row/column matmuls run — overlap without a second buffer
            @pl.when(i + 1 < n_blocks)
            def _():
                window_dma(i + 1).start()

        @pl.when(i == 0)
        def _first():
            window_dma(0).start()

        window_dma(i).wait()
        win = winbuf

        r0 = pl.multiple_of(row_off_ref[i], 8)

        if _variant == "dma":
            out_ref[:] = win[:, :rpb, :]
            start_next()
            return

        # ---- split the window into bf16 hi/lo; winbuf is then dead and
        # the next block's DMA can stream into it
        if _variant == "cols":  # ablation: skip the row matmul
            for c in range(4):
                vh, vl = _hi_lo(win[c, :rpb, :])
                rows2[0, c] = vh
                rows2[1, c] = vl
        else:
            for c in range(4):
                vh, vl = _hi_lo(win[c])
                win2[0, c] = vh
                win2[1, c] = vl
        start_next()

        # ---- column weights [wh, wl]: chunk-dependent only — build once
        # on the first block when they fit VMEM, else per block
        def build_cw(j, store):
            c0 = pl.multiple_of(col_off_ref[0, j], COL_CHUNK)
            o0 = pl.multiple_of(j * COL_CHUNK, COL_CHUNK)
            pxc = px_ref[:, pl.ds(o0, COL_CHUNK)]  # (1, 128)
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

        if persist_cw and _variant in ("full", "cols"):

            @pl.when(i == 0)
            def _build_all():
                jax.lax.fori_loop(
                    0, n_chunks, lambda j, _: (build_cw(j, j), 0)[1], 0
                )

        # ---- row pass: rows = rw @ win per channel on the MXU
        pyb = py_ref[:]  # (rpb, 1)
        y0 = jnp.floor(pyb)
        fy = (pyb - y0).astype(jnp.float32)
        y0i = y0.astype(jnp.int32)
        w0 = jnp.where((y0i >= 0) & (y0i < height), 1.0 - fy, 0.0)
        w1 = jnp.where((y0i + 1 >= 0) & (y0i + 1 < height), fy, 0.0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (rpb, win_r), 1) + r0
        rw = jnp.where(kk == y0i, w0, 0.0) + jnp.where(kk == y0i + 1, w1, 0.0)
        rwh, rwl = _hi_lo(rw)

        if _variant != "cols":
            for c in range(4):
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

        # ---- column pass: windowed one-hot matmul per 128-lane chunk
        # (values can't be dynamically sliced in Mosaic; refs can).
        # fori_loop, NOT a Python loop: full unrolling at UHD (30 chunks)
        # overflows the Mosaic scoped-vmem stack.
        def chunk_body(j, _):
            c0 = pl.multiple_of(col_off_ref[0, j], COL_CHUNK)
            o0 = pl.multiple_of(j * COL_CHUNK, COL_CHUNK)
            if persist_cw:
                store = j
            else:
                store = 0
                build_cw(j, 0)
            flat2[0, :, :, :] = rows2[0, :, :, pl.ds(c0, win_c)]
            flat2[1, :, :, :] = rows2[1, :, :, pl.ds(c0, win_c)]
            fh = flat2[0].reshape(4 * rpb, win_c)
            fl = flat2[1].reshape(4 * rpb, win_c)
            chunk = (
                jnp.dot(fh, cw[store, 0], preferred_element_type=jnp.float32)
                + jnp.dot(fl, cw[store, 0], preferred_element_type=jnp.float32)
                + jnp.dot(fh, cw[store, 1], preferred_element_type=jnp.float32)
            )
            out_ref[:, :, pl.ds(o0, COL_CHUNK)] = chunk.reshape(4, rpb, COL_CHUNK)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # row_off
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rpb, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),  # py
            pl.BlockSpec(memory_space=pltpu.VMEM),  # px (1, W)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # col_off (1, n_chunks)
            pl.BlockSpec(memory_space=pl.ANY),  # src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (4, rpb, width), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((4, win_r, width), jnp.float32),
            pltpu.VMEM((2, 4, win_r, width), jnp.bfloat16),
            pltpu.VMEM((2, 4, rpb, width), jnp.bfloat16),
            pltpu.VMEM((2, 4, rpb, win_c), jnp.bfloat16),
            pltpu.VMEM(
                ((n_chunks if persist_cw else 1), 2, win_c, COL_CHUNK), jnp.bfloat16
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

    @jax.jit
    def warp(src, mat):
        ix = (jnp.arange(width, dtype=jnp.float32) / width) - 0.5
        iy = (jnp.arange(height, dtype=jnp.float32) / height) - 0.5
        # normalized coords -> texel space (OpenCL LINEAR: u*size - 0.5)
        px = (mat[0, 0] * ix + mat[0, 2] + 0.5) * width - 0.5
        py = (mat[1, 1] * iy + mat[1, 2] + 0.5) * height - 0.5

        blocks = jnp.arange(n_blocks) * rpb
        py_blk0 = py[blocks]
        py_blk1 = py[blocks + rpb - 1]
        row_lo = jnp.minimum(py_blk0, py_blk1)
        row_off = jnp.clip(
            jnp.floor(row_lo).astype(jnp.int32) // 8 * 8,
            0,
            max(height - win_r, 0),
        )

        chunks = jnp.arange(n_chunks) * COL_CHUNK
        px_c0 = px[chunks]
        px_c1 = px[chunks + COL_CHUNK - 1]
        col_lo = jnp.minimum(px_c0, px_c1)
        col_off = jnp.clip(
            jnp.floor(col_lo).astype(jnp.int32) // COL_CHUNK * COL_CHUNK,
            0,
            max(width - win_c, 0),
        )

        return call(row_off, py[:, None], px[None, :], col_off[None, :], src)

    return warp
