"""Fused multi-layer composite kernel: v210 decode + DVE warp +
dissolve + N-layer over-composite in ONE pallas_call.

The staged UHD 4-layer pipeline materialises EIGHT (4, 2160, 3840) f32
RGBA frames in HBM between unpack and the warp pairs (~3.9 GB of
traffic per frame, ~25% of peak bandwidth at 19 ms/frame).  This kernel
reads the PACKED v210 word planes directly (2.7 bytes/px instead of
16), decodes the DMA'd row window in VMEM (phase-planar, pure VPU —
same math as ops.pallas_kernels), resamples with the scale-bucketed
one-hot MXU machinery of ops.pallas_warp, mixes dissolve pairs, and
over-accumulates all layers into the output block.  HBM traffic drops
to ~8 packed windows in + 1 RGBA out (~0.9 GB incl. the pack stage).

Key moves beyond the pair warp kernel (ops/pallas_warp.py):

- the bf16 phase-lane deposit: each decoded phase tile (rows, G) lands
  at lane offset p*G of a (rows, 6G) scratch, so the ROW matmul runs on
  the full-width plane with zero cross-lane shuffles; the COLUMN
  one-hot weights then map phase-lane coordinates (lane l -> spatial
  x = (l%G)*6 + l//G) back to spatial output columns — the MXU performs
  the phase->spatial deinterleave for free as part of the resample;
- alpha needs no matmul: v210 sources are opaque, so the warped alpha
  plane is warp(1) = rowsum(rw) (x) colsum(cw) — an outer product of
  the f32 weight sums (border-zero included), exact vs the staged path;
- the over operator folds into the source loop: the 'a' pass of layer l
  applies out = out*(1-alpha_l) + warp(a)*mix_l, the 'b' pass adds
  + warp(b)*(1-mix_l) (same_mat pairs share alpha), and the top layer's
  'a' pass writes the alpha channel — combine.ts:47-59 semantics with
  no combine kernel at all.

Coverage (composite_supported): every layer a v210 source (or dissolve
pair sharing one transform) with an axis-aligned bucketed DVE, channel
width % 48 == 0 (no pitch tail) and % 128 == 0.  Everything else stays
on the staged path.  Error class: the resample is the same bf16 hi/lo
split as the pair warp (~2^-17, <=1 packed code); decode is bit-identical
to the stage kernels.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .formats import v210 as v210fmt
from .pallas_kernels import _decode_yuv, _gamma_fns, _literals, _unpack_phases
from .pallas_warp import BUCKET_BOUNDS, COL_CHUNK, _ceil_to, _hi_lo, _rows_per_block
from . import colour_maths as cm

__all__ = ["make_composite_program", "composite_supported", "composite_fits"]

# the decode stage's per-phase f32 temporaries live on the Mosaic
# scoped-vmem stack OUTSIDE this explicit scratch budget, so the
# planner leaves ~5 MB of headroom under the 16 MB scoped limit
VMEM_BUDGET = 10 * 1024 * 1024 + 512 * 1024


def _composite_config(height: int, width: int, bucket: int):
    """Pick (rpb, win_r, wcg) for the composite kernel's scratch.
    Windows are sized by the largest bucket across layers.

    ``wcg`` is the column window in GROUP units (6 px each): JUST the
    tap span of one 128-px output chunk (~bound*128/6 groups).  The
    dynamic phase-segment slice still needs 128-lane alignment, but the
    kernel slices wcg+128 lanes at the aligned base and absorbs the
    residual with a dynamic pltpu.roll — so the one-hot matmul K stays
    at the true tap span (6*wcg ~ 192 for the common buckets) instead
    of paying 127 groups (762 px!) of alignment in K.  A whole-width
    window (wcg == g) needs no dynamic slicing at all."""
    bound, preferred = BUCKET_BOUNDS[bucket]
    g = width // 6
    cover = -(-int(bound * (COL_CHUNK - 1) + 2) // 6) + 2  # groups + floor safety
    wcg = min(_ceil_to(cover, 32), g)
    if _ceil_to(wcg + 128, 128) >= g:
        wcg = g  # whole phase width: static slices, c0g == 0
    win_c = 6 * wcg

    def plan(rpb_pref: int):
        rpb = _rows_per_block(height, rpb_pref)
        win_r = min(_ceil_to(bound * (rpb - 1) + 10, 8), _ceil_to(height, 8))
        winbuf = 4 * win_r * g * 4  # packed u32 window (6x smaller than RGBA)
        win2 = 2 * 3 * win_r * width * 2  # bf16 hi/lo phase-lane planes
        rows2 = 2 * 3 * rpb * width * 2
        out = 2 * 4 * rpb * width * 4  # double-buffered output block
        flat = 2 * 3 * rpb * win_c * 2
        cw = 2 * win_c * COL_CHUNK * 2
        return (rpb, win_r, wcg), winbuf + win2 + rows2 + out + flat + cw

    for rpb_pref in (preferred, 24, 16, 8, 4, 2, 1):
        cfg, bytes_ = plan(rpb_pref)
        if bytes_ <= VMEM_BUDGET:
            return cfg
    raise ValueError(
        f"composite scratch cannot fit VMEM: {height}x{width} bucket {bucket}"
    )


def composite_fits(height: int, width: int, bucket: int) -> bool:
    if bucket < 0:
        return False
    try:
        _composite_config(height, width, bucket)
        return True
    except ValueError:
        return False


def composite_supported(spec) -> bool:
    """Which channel structures the fused composite covers (the rest run
    the staged path).  Checked AFTER pallas_kernels.supported_spec (the
    opaque-top-layer monolith) in make_channel_program."""
    if not spec.layers or spec.width % 48 or spec.width % 128 or spec.height % 8:
        return False
    g = spec.width // 6
    if g % 128:
        # dynamic phase-segment slices need lane offsets p*g + c0g to be
        # provably 128-aligned; a whole-width window (static slices) is
        # exempt.  3840 (g=640) and 7680 (g=1280) qualify either way.
        try:
            _, _, wcg = _composite_config(
                spec.height, spec.width, max(ls.warp_bucket for ls in spec.layers)
            )
        except ValueError:
            return False
        if wcg != g:
            return False
    max_bucket = -1
    for ls in spec.layers:
        if ls.src_format != "v210" or ls.deinterlace or ls.src_size is not None:
            return False
        if not (ls.has_transform and ls.axis_aligned and ls.warp_bucket >= 0):
            return False
        if ls.transition not in ("none", "dissolve"):
            return False
        if ls.transition == "dissolve":
            if (ls.src_b_format or "v210") != "v210" or not ls.warp_same_mat:
                return False
        max_bucket = max(max_bucket, ls.warp_bucket)
    return composite_fits(spec.height, spec.width, max_bucket)


@lru_cache(maxsize=None)
def make_composite_program(
    height: int,
    width: int,
    layer_cfg: tuple,  # per layer: (n_src 1|2, bucket)
    col_spec: str = "709",
    out_col_spec: str = "709",
    interpret: bool | None = None,
):
    """fn(srcs, mats, mixes) -> composited (4, H, W) f32.

    ``srcs``: flat list of (4, H, G) uint32 word-plane arrays, layers
    bottom..top, each layer contributing 1 (cut) or 2 (dissolve pair)
    sources.  ``mats``: (L, 3, 3) f32 (one shared transform per layer).
    ``mixes``: (L,) f32 (1.0 for cut layers)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert width % 48 == 0 and width % COL_CHUNK == 0
    L = len(layer_cfg)
    bucket = max(b for _, b in layer_cfg)
    rpb, win_r, wcg = _composite_config(height, width, bucket)
    win_c = 6 * wcg
    g = width // 6
    full_width = wcg == g  # static slices, no dynamic column window
    assert full_width or g % 128 == 0, "gated by composite_supported"
    n_blocks = height // rpb
    n_chunks = width // COL_CHUNK
    # flat source order: (layer, role) bottom..top, a then b
    src_layer = []
    src_role = []
    for l, (n_src, _b) in enumerate(layer_cfg):
        for r in range(n_src):
            src_layer.append(l)
            src_role.append(r)
    S = len(src_layer)

    col_fwd = _literals(cm.ycbcr2rgb_matrix(col_spec, 10, 64, 940, 896))
    gamut = _literals(cm.rgb2rgb_matrix(col_spec, out_col_spec))
    g2l, _ = _gamma_fns(col_spec, out_col_spec)

    # phase-lane -> spatial map: lane l holds spatial x = (l%G)*6 + l//G
    # (the deposit below puts phase p's group-g sample at lane p*G + g)

    def kernel(*refs):
        (row_off_ref, py_ref, px_ref, col_off_ref, mix_ref) = refs[:5]
        src_refs = refs[5 : 5 + S]
        out_ref = refs[5 + S]
        (winbuf, win2, rows2, flat2, cw, sem) = refs[5 + S + 1 :]

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
            rsum = w0 + w1  # (rpb, 1) f32: the warp of an all-ones plane
            return _hi_lo(rw), rsum

        def chunk_c0g(m, j):
            """EXACT group offset of chunk j's column window (no
            alignment rounding — the slice path handles alignment)."""
            if full_width:
                return 0
            return col_off_ref[m, j]

        def build_cw(j, m):
            """One-hot column weights for output chunk j, mapping the
            PHASE-LANE window (6 segments of wcg groups) to the 128
            spatial output columns — the resample and the
            phase->spatial deinterleave in one weight matrix.  Also
            returns the in-bounds weight sum (the alpha column factor)."""
            c0g = chunk_c0g(m, j)
            o0 = pl.multiple_of(j * COL_CHUNK, COL_CHUNK)
            pxc = px_ref[pl.ds(m, 1), pl.ds(o0, COL_CHUNK)]  # (1, 128)
            x0 = jnp.floor(pxc)
            fx = (pxc - x0).astype(jnp.float32)
            x0i = x0.astype(jnp.int32)
            v0 = jnp.where((x0i >= 0) & (x0i < width), 1.0 - fx, 0.0)
            v1 = jnp.where((x0i + 1 >= 0) & (x0i + 1 < width), fx, 0.0)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (win_c, COL_CHUNK), 0)
            # window row r holds phase p = r // wcg, group c0g + r % wcg:
            # spatial x = (c0g + r % wcg) * 6 + p
            p_of = lanes // wcg
            g_of = lanes - p_of * wcg + c0g
            xs = g_of * 6 + p_of
            w = jnp.where(xs == x0i, v0, 0.0) + jnp.where(xs == x0i + 1, v1, 0.0)
            wh, wl = _hi_lo(w)
            cw[0] = wh
            cw[1] = wl
            return v0 + v1  # (1, 128) f32 alpha column factor

        def process_source(s):
            m = src_layer[s]
            role = src_role[s]
            n_src = layer_cfg[m][0]
            window_dma(i, s).wait()

            # ---- decode the packed window in VMEM (identical math to
            # pallas_kernels.make_v210_unpack_rgba) and deposit each
            # phase tile at its lane offset p*G — no cross-lane shuffles
            ys, cbs, crs = _unpack_phases(
                winbuf[0], winbuf[1], winbuf[2], winbuf[3]
            )
            for p in range(6):
                rgb = _decode_yuv(
                    ys[p].astype(jnp.float32),
                    cbs[p // 2].astype(jnp.float32),
                    crs[p // 2].astype(jnp.float32),
                    col_fwd,
                    gamut,
                    g2l,
                )
                for c in range(3):
                    hi, lo = _hi_lo(rgb[c])
                    win2[0, c, :, p * g : (p + 1) * g] = hi
                    win2[1, c, :, p * g : (p + 1) * g] = lo

            # winbuf is dead: stream the next window in behind the MXU
            if s + 1 < S:
                window_dma(i, s + 1).start()
            else:

                @pl.when(i + 1 < n_blocks)
                def _():
                    window_dma(i + 1, 0).start()

            # ---- row pass (phase-lane layout; lanes arbitrary order)
            (rwh, rwl), rsum = row_weights(m)
            for c in range(3):
                rows = (
                    jnp.dot(rwh, win2[0, c], preferred_element_type=jnp.float32)
                    + jnp.dot(rwl, win2[0, c], preferred_element_type=jnp.float32)
                    + jnp.dot(rwh, win2[1, c], preferred_element_type=jnp.float32)
                )
                rh, rl = _hi_lo(rows)
                rows2[0, c] = rh
                rows2[1, c] = rl

            mix = mix_ref[m, 0]
            if n_src == 2:
                gain = mix if role == 0 else 1.0 - mix
            else:
                gain = 1.0
            top_a = (m == L - 1) and role == 0

            def one_chunk(j):
                o0 = pl.multiple_of(j * COL_CHUNK, COL_CHUNK)
                csum = build_cw(j, m)
                if full_width:
                    # whole-width window: rows2 IS the matmul operand
                    fh = rows2[0].reshape(3 * rpb, win_c)
                    fl = rows2[1].reshape(3 * rpb, win_c)
                else:
                    c0g = chunk_c0g(m, j)
                    # gather the 6 phase segments of the group window:
                    # slice wcg+128 lanes at the 128-ALIGNED base below
                    # c0g (static offsets p*g are 128-multiples —
                    # g % 128 == 0 gated), then a dynamic roll shifts
                    # the residual d out so the matmul K stays at the
                    # true tap span.  Mosaic's dynamic rotate only
                    # exists for 32-bit lanes on 128-aligned shapes, so
                    # the bf16 hi/lo planes ride one uint32 vector
                    # (hi<<16 | lo — lane layout preserved) through the
                    # roll, and the slice is rounded up to a lane
                    # multiple of 128.
                    sl = _ceil_to(wcg + 128, 128)
                    a0 = jnp.clip(c0g // 128 * 128, 0, max(g - sl, 0))
                    d = c0g - a0
                    for p in range(6):
                        off = pl.multiple_of(p * g + a0, 128)
                        hb = jax.lax.bitcast_convert_type(
                            rows2[0, :, :, pl.ds(off, sl)], jnp.uint16
                        ).astype(jnp.uint32)
                        lb = jax.lax.bitcast_convert_type(
                            rows2[1, :, :, pl.ds(off, sl)], jnp.uint16
                        ).astype(jnp.uint32)
                        seg = pltpu.roll((hb << 16) | lb, -d, axis=2)[:, :, :wcg]
                        flat2[0, :, :, p * wcg : (p + 1) * wcg] = (
                            jax.lax.bitcast_convert_type(
                                (seg >> 16).astype(jnp.uint16), jnp.bfloat16
                            )
                        )
                        flat2[1, :, :, p * wcg : (p + 1) * wcg] = (
                            jax.lax.bitcast_convert_type(
                                (seg & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
                            )
                        )
                    fh = flat2[0].reshape(3 * rpb, win_c)
                    fl = flat2[1].reshape(3 * rpb, win_c)
                chunk = (
                    jnp.dot(fh, cw[0], preferred_element_type=jnp.float32)
                    + jnp.dot(fl, cw[0], preferred_element_type=jnp.float32)
                    + jnp.dot(fh, cw[1], preferred_element_type=jnp.float32)
                ).reshape(3, rpb, COL_CHUNK)
                alpha = rsum * csum  # (rpb, 128) warp of the opaque alpha
                if role == 0:
                    if s == 0:
                        out_ref[:3, :, pl.ds(o0, COL_CHUNK)] = chunk * gain
                    else:
                        prev = out_ref[:3, :, pl.ds(o0, COL_CHUNK)]
                        out_ref[:3, :, pl.ds(o0, COL_CHUNK)] = (
                            prev * (1.0 - alpha) + chunk * gain
                        )
                    if top_a:
                        # combine.ts:47-59: output alpha = top layer's
                        out_ref[3, :, pl.ds(o0, COL_CHUNK)] = alpha
                else:
                    prev = out_ref[:3, :, pl.ds(o0, COL_CHUNK)]
                    out_ref[:3, :, pl.ds(o0, COL_CHUNK)] = prev + chunk * gain

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
            pl.BlockSpec((rpb, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),  # py
            pl.BlockSpec(memory_space=pltpu.VMEM),  # px (L, W)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # col_off (L, n_chunks) groups
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mix (L, 1)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(S)],  # srcs in HBM
        out_specs=pl.BlockSpec(
            (4, rpb, width), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((4, win_r, g), jnp.uint32),
            pltpu.VMEM((2, 3, win_r, width), jnp.bfloat16),
            pltpu.VMEM((2, 3, rpb, width), jnp.bfloat16),
            # flat2 only exists for windowed column slicing
            pltpu.VMEM((2, 3, rpb, win_c) if not full_width else (1, 1, 8, 128), jnp.bfloat16),
            pltpu.VMEM((2, win_c, COL_CHUNK), jnp.bfloat16),
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
        """Per-layer texel maps; column window offsets are in GROUP
        units (128-aligned lanes of the phase segments)."""
        ix = (jnp.arange(width, dtype=jnp.float32) / width) - 0.5
        iy = (jnp.arange(height, dtype=jnp.float32) / height) - 0.5
        pxs, pys, row_offs, col_offs = [], [], [], []
        for l in range(L):
            mat = mats[l]
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
            # spatial tap x lives in group x//6: the window starts at
            # the exact group of the lowest tap (minus one for floor
            # safety) — alignment is the kernel's roll's job
            grp_lo = jnp.floor(col_lo).astype(jnp.int32) // 6 - 1
            col_offs.append(jnp.clip(grp_lo, 0, max(g - wcg, 0)))
            pxs.append(px)
            pys.append(py)
        return (
            jnp.stack(row_offs),
            jnp.stack(pys, axis=-1),
            jnp.stack(pxs),
            jnp.stack(col_offs),
        )

    @jax.jit
    def composite(srcs, mats, mixes):
        row_off, py, px, col_off = prologue(mats)
        mix_arr = jnp.asarray(mixes, jnp.float32).reshape(L, 1)
        return call(row_off, py, px, col_off, mix_arr, *srcs)

    return composite
