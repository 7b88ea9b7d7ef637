"""Pallas axis-aligned DVE warp kernel.

The XLA gather warp costs ~0.6-1.4 ms per 1080p source (5 HBM passes);
this kernel does the whole separable bilinear warp in one pass:

- grid over output row blocks; a scalar-prefetched per-block input row
  offset drives a dynamic DMA of just the needed source-row window
  (HBM -> VMEM) — the input never materialises in full in VMEM;
- the row pass lerps two dynamically-indexed window rows per output row;
- the column pass runs per 128-lane output chunk as a windowed MXU
  matmul against a 2-non-zero interpolation weight matrix built in-VMEM
  from iota comparisons (adding exact zeros, so results match the
  gather formulation bit-for-bit).

Covers |scale| such that the row/column windows fit (see fits());
callers fall back to the XLA gather warp otherwise.  Border-zero
(CLK_ADDRESS_CLAMP) semantics identical to ops.geometry.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_warp_program", "fits"]

ROWS_PER_BLOCK = 8
ROW_WIN = 48  # >= |m11| * ROWS_PER_BLOCK + 2, sublane-aligned -> |m11| <= 5.7
COL_CHUNK = 128
COL_WIN = 640  # >= |m00| * COL_CHUNK + 2 + 128 alignment slack -> |m00| <= 4


def fits(mat: np.ndarray) -> bool:
    """Host-side check that the window sizes cover this matrix."""
    return (
        abs(float(mat[0, 1])) < 1e-12
        and abs(float(mat[1, 0])) < 1e-12
        and abs(float(mat[0, 0])) * COL_CHUNK + 2 <= COL_WIN - COL_CHUNK
        # row window start aligns down to the sublane tiling (8): the
        # span plus up to 7 rows of alignment slack must fit
        and abs(float(mat[1, 1])) * ROWS_PER_BLOCK + 2 + 7 <= ROW_WIN - 1
    )


@lru_cache(maxsize=None)
def make_warp_program(height: int, width: int, interpret: bool | None = None):
    """fn(src (4,H,W) f32, mat (3,3) f32) -> (4,H,W) f32."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert height % ROWS_PER_BLOCK == 0 and width % COL_CHUNK == 0
    n_blocks = height // ROWS_PER_BLOCK
    n_chunks = width // COL_CHUNK
    win_r = min(ROW_WIN, height)
    win_c = min(COL_WIN, width)

    def kernel(row_off_ref, col_off_ref, py_ref, px_ref, src_ref, out_ref):
        # row_off/col_off/py are scalar-prefetch SMEM arrays (dynamic
        # scalar reads); px is a VMEM vector (static chunk slices)
        i = pl.program_id(0)
        r0 = pl.multiple_of(row_off_ref[i], 8)  # HBM DMA sublane tiling

        def body(win, rows_ref, sem):
            dma = pltpu.make_async_copy(
                src_ref.at[:, pl.ds(r0, win_r), :], win, sem
            )
            dma.start()
            dma.wait()

            # ---- row pass: (4, R, W) from two lerped window rows each
            for r in range(ROWS_PER_BLOCK):
                yy = py_ref[i * ROWS_PER_BLOCK + r]
                y0 = jnp.floor(yy)
                fy = (yy - y0).astype(jnp.float32)
                y0i = y0.astype(jnp.int32)
                w0 = jnp.where((y0i >= 0) & (y0i < height), 1.0 - fy, 0.0)
                w1 = jnp.where((y0i + 1 >= 0) & (y0i + 1 < height), fy, 0.0)
                # taps clamp independently: a border tap's weight is
                # already zero, but clamping both together would shift
                # the valid tap onto the wrong row
                top_idx = jnp.clip(y0i - r0, 0, win_r - 1)
                bot_idx = jnp.clip(y0i + 1 - r0, 0, win_r - 1)
                top = win[:, pl.ds(top_idx, 1), :]
                bot = win[:, pl.ds(bot_idx, 1), :]
                rows_ref[:, pl.ds(r, 1), :] = top * w0 + bot * w1

            # ---- column pass: windowed matmul per 128-lane chunk
            # (values can't be dynamically sliced in Mosaic; refs can)
            for j in range(n_chunks):
                c0 = pl.multiple_of(col_off_ref[j], COL_CHUNK)
                window = rows_ref[:, :, pl.ds(c0, win_c)]
                pxc = px_ref[0, pl.ds(j * COL_CHUNK, COL_CHUNK)]  # (128,)
                x0 = jnp.floor(pxc)
                fx = (pxc - x0).astype(jnp.float32)
                x0i = x0.astype(jnp.int32)
                cc = jax.lax.broadcasted_iota(jnp.int32, (win_c, COL_CHUNK), 0) + c0
                v0 = jnp.where((x0i >= 0) & (x0i < width), 1.0 - fx, 0.0)
                v1 = jnp.where((x0i + 1 >= 0) & (x0i + 1 < width), fx, 0.0)
                weights = jnp.where(cc == x0i[None, :], v0[None, :], 0.0) + jnp.where(
                    cc == x0i[None, :] + 1, v1[None, :], 0.0
                )  # (WINC, 128)
                flat = window.reshape(4 * ROWS_PER_BLOCK, win_c)
                # DEFAULT (single-pass bf16 MXU) keeps the kernel at
                # ~0.03 ms/1080p; the resulting ~4e-3 interpolation error
                # matches the ~8-bit filter-weight precision of the
                # reference's OpenCL LINEAR sampler.  HIGHEST would be
                # f32-exact but costs 23x (Mosaic supports no HIGH tier).
                chunk = jnp.dot(flat, weights, preferred_element_type=jnp.float32)
                out_ref[:, :, pl.ds(j * COL_CHUNK, COL_CHUNK)] = chunk.reshape(
                    4, ROWS_PER_BLOCK, COL_CHUNK
                )

        pl.run_scoped(
            body,
            win=pltpu.VMEM((4, win_r, width), jnp.float32),
            rows_ref=pltpu.VMEM((4, ROWS_PER_BLOCK, width), jnp.float32),
            sem=pltpu.SemaphoreType.DMA,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # row_off, col_off, py
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # px (1, W)
            pl.BlockSpec(memory_space=pltpu.ANY),  # src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (4, ROWS_PER_BLOCK, width), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
        ),
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

        blocks = jnp.arange(n_blocks) * ROWS_PER_BLOCK
        py_blk0 = py[blocks]
        py_blk1 = py[blocks + ROWS_PER_BLOCK - 1]
        row_lo = jnp.minimum(py_blk0, py_blk1)
        row_off = jnp.clip(
            (jnp.floor(row_lo).astype(jnp.int32) - 1) // 8 * 8,
            0,
            max(height - win_r, 0),
        )

        chunks = jnp.arange(n_chunks) * COL_CHUNK
        px_c0 = px[chunks]
        px_c1 = px[chunks + COL_CHUNK - 1]
        col_lo = jnp.minimum(px_c0, px_c1)
        col_off = jnp.clip(
            (jnp.floor(col_lo).astype(jnp.int32) - 1) // COL_CHUNK * COL_CHUNK,
            0,
            max(width - win_c, 0),
        )

        return call(row_off, col_off, py, px[None, :], src)

    return warp
