"""Pallas TPU kernels: the fully-fused v210 channel pipeline.

The XLA path materialises the unpacked RGBA frame (132 MB at UHD) in
HBM between stages and spends most of its time in layout shuffles.
This kernel runs the whole path

    v210 unpack -> colour -> [dissolve] -> combine-over-black -> colour
    -> v210 pack

inside one pallas_call with everything VMEM-resident: HBM traffic is
just packed words in + packed words out (~22 MB each at UHD).

Layout trick ("phase-planar"): v210 words are pre-split into four word
planes w0..w3 of shape (H, G) (G = pitch/6 groups per line; a cheap
XLA transpose, or native/hostio.cpp on the host).  Every 10-bit field
of a group then lives at the SAME (row, group) coordinate in one of the
twelve (Y0..Y5, Cb0..2, Cr0..2) phase planes, so unpack, colour math,
compositing and repack are all pure lane-aligned VPU ops — no
cross-lane shuffles at all.  Pixel p of a group pairs with chroma
sample p//2 of the same group, exactly like the scalar kernels
(v210.ts:58-63).

Width masking reproduces the pitch-padding rule of ops.formats.v210
(pad fields pack as zero), so results are bit-identical to the XLA
path for any width — asserted in tests.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import colour_maths as cm
from .formats import v210 as v210fmt
from .gamma import gamma2linear_at_index, linear2gamma_at_index
from .quant import u16_sat_rte

__all__ = [
    "supported_spec",
    "make_fused_v210_program",
    "words_to_planes",
    "planes_to_words",
]

_MASK = 0x3FF


def words_to_planes(words: jnp.ndarray) -> jnp.ndarray:
    """(H, G*4) uint32 -> (4, H, G) word planes (device-side)."""
    h = words.shape[0]
    return words.reshape(h, -1, 4).transpose(2, 0, 1)


def planes_to_words(planes: jnp.ndarray) -> jnp.ndarray:
    """(4, H, G) -> (H, G*4)."""
    _, h, g = planes.shape
    return planes.transpose(1, 2, 0).reshape(h, g * 4)


def _unpack_phases(p0, p1, p2, p3):
    """Word planes -> 6 luma + 3 cb + 3 cr phase planes (int32 codes)."""
    y = [p0 >> 10, p1, p1 >> 20, p2 >> 10, p3, p3 >> 20]
    cb = [p0, p1 >> 10, p2 >> 20]
    cr = [p0 >> 20, p2, p3 >> 10]
    f = lambda x: (x & _MASK).astype(jnp.int32)
    return [f(v) for v in y], [f(v) for v in cb], [f(v) for v in cr]


def _phase_masks(width: int, g: int, shape):
    """Validity masks per phase for the partial last group (pads -> 0)."""
    if width % 6 == 0 and width == g * 6:
        return None, None
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)
    y_masks = [(lanes * 6 + p) < width for p in range(6)]
    n_chroma = (width + 1) // 2
    c_masks = [(lanes * 3 + s) < n_chroma for s in range(3)]
    return y_masks, c_masks



def _literals(matrix) -> list[list[float]]:
    """Bake an f32 matrix into scalar literals (Pallas kernels cannot
    capture array constants); float() of an f32 value is exact."""
    return [[float(v) for v in row] for row in matrix]


def _gamma_fns(col_spec: str, out_col_spec: str):
    def g2l(x):
        return gamma2linear_at_index(col_spec, u16_sat_rte(x * 65535.0))

    def l2g(x):
        return linear2gamma_at_index(out_col_spec, u16_sat_rte(x * 65535.0))

    return g2l, l2g


def _decode_yuv(yf, uf, vf, col_fwd, gamut, g2l):
    """One phase: float code planes -> linear (r, g, b) tiles
    (colour matrix -> gamma -> gamut, the read-kernel core)."""
    chans = []
    for c in range(3):
        gam = col_fwd[c][0] * yf + col_fwd[c][1] * uf + col_fwd[c][2] * vf + col_fwd[c][3]
        chans.append(g2l(gam))
    return tuple(
        gamut[c][0] * chans[0] + gamut[c][1] * chans[1] + gamut[c][2] * chans[2]
        for c in range(3)
    )


def _encode_rgb(rp, gp, bp, col_bwd, l2g, code_mask):
    """One phase: linear (r, g, b) tiles -> integer (y, u, v) codes
    (gamma -> colour matrix -> rte, the write-kernel core)."""
    rp, gp, bp = l2g(rp), l2g(gp), l2g(bp)
    out = []
    for c in range(3):
        out.append(
            u16_sat_rte(
                col_bwd[c][0] * rp + col_bwd[c][1] * gp + col_bwd[c][2] * bp + col_bwd[c][3]
            )
            & code_mask
        )
    return tuple(out)


def _make_kernel(spec_key):
    (width, height, col_spec, out_col_spec, n_layers, transition) = spec_key
    g = v210fmt.pitch(width) // 6

    col_fwd = _literals(cm.ycbcr2rgb_matrix(col_spec, 10, 64, 940, 896))
    gamut = _literals(cm.rgb2rgb_matrix(col_spec, out_col_spec))
    col_bwd = _literals(cm.rgb2ycbcr_matrix(out_col_spec, 10, 64, 940, 896))
    g2l, l2g = _gamma_fns(col_spec, out_col_spec)

    def decode_layer(planes_refs):
        """Four (R, G) word tiles -> per-phase linear RGB (+alpha=1)."""
        ys, cbs, crs = _unpack_phases(*[r[:] for r in planes_refs])
        return [
            _decode_yuv(
                ys[p].astype(jnp.float32),
                cbs[p // 2].astype(jnp.float32),
                crs[p // 2].astype(jnp.float32),
                col_fwd,
                gamut,
                g2l,
            )
            for p in range(6)
        ]

    def encode(rgb_phases, y_masks, c_masks, out_refs):
        """Per-phase linear RGB -> packed word planes."""
        codes = [_encode_rgb(*rgb_phases[p], col_bwd, l2g, 0x3FF) for p in range(6)]

        def maskp(x, p):
            return jnp.where(y_masks[p], x, 0) if y_masks is not None else x

        def maskc(x, s):
            return jnp.where(c_masks[s], x, 0) if c_masks is not None else x

        y = [maskp(codes[p][0], p).astype(jnp.uint32) for p in range(6)]
        # chroma samples come from even pixels 0/2/4 (v210.ts:158-162)
        u = [maskc(codes[2 * s][1], s).astype(jnp.uint32) for s in range(3)]
        v = [maskc(codes[2 * s][2], s).astype(jnp.uint32) for s in range(3)]

        out_refs[0][:] = (v[0] << 20) | (y[0] << 10) | u[0]
        out_refs[1][:] = (y[2] << 20) | (u[1] << 10) | y[1]
        out_refs[2][:] = (u[2] << 20) | (y[3] << 10) | v[1]
        out_refs[3][:] = (y[5] << 20) | (v[2] << 10) | y[4]

    def kernel(*refs):
        # refs: [mix_ref?] + n_layers*4 input refs + 4 output refs
        idx = 0
        mix = None
        if transition == "dissolve":
            mix = refs[0][0, 0]
            idx = 1
        layer_refs = [refs[idx + 4 * l : idx + 4 * (l + 1)] for l in range(n_layers)]
        out_refs = refs[idx + 4 * n_layers : idx + 4 * n_layers + 4]

        shape = layer_refs[0][0].shape
        y_masks, c_masks = _phase_masks(width, g, shape)

        layers_rgb = [decode_layer(lr) for lr in layer_refs]
        if transition == "dissolve":
            # layer pairs: (cur, next) per output layer slot
            mixed = []
            for i in range(0, n_layers, 2):
                cur, nxt = layers_rgb[i], layers_rgb[i + 1]
                mixed.append(
                    [
                        tuple(c * mix + n * (1.0 - mix) for c, n in zip(cp, np_))
                        for cp, np_ in zip(cur, nxt)
                    ]
                )
            layers_rgb = mixed

        # combine over black: opaque sources (alpha==1 after v210 unpack)
        # make 'over' a pure replacement, so the top layer wins per pixel;
        # with multiple opaque layers the last one is the visible one
        # (combine.ts over-accumulation with alpha 1)
        final = layers_rgb[-1]
        encode(final, y_masks, c_masks, out_refs)

    return kernel


# ---------------------- stage kernels (usable inside XLA programs) ----


def _v210_spatial_weights():
    """Constant one-hot matrices for the in-kernel phase->spatial
    deinterleave.  Output pixel x = 128j + k lives at luma phase x%6,
    group x//6; because 128 ≡ 2 (mod 6) the (phase, group-offset)
    pattern of a 128-column chunk repeats with period THREE in j — the
    whole deinterleave is 3 small constant matrices.  Chroma (4:2:2,
    nearest upsample u[x] = u_half[x//2], upsample_422 semantics) has
    its own period-3 family; cb and cr share it.  Every output column
    selects exactly ONE input row, so the bf16 hi/lo code split
    reconstructs the 10-bit integer codes EXACTLY (hi rounds to ±4,
    lo = code - hi is a small integer, both bf16-exact)."""
    import numpy as np

    wy = np.zeros((3, 6 * 24, 128), np.float32)
    wc = np.zeros((3, 3 * 24, 128), np.float32)
    for m in range(3):
        r0 = (2 * m) % 6  # (128j) mod 6 for j ≡ m (mod 3)
        r0c = m % 3  # (64j) mod 3
        for k in range(128):
            x = r0 + k  # 6*i + p relative to group base (128j)//6
            wy[m, (x % 6) * 24 + x // 6, k] = 1.0
            cidx = r0c + k // 2  # 3*i + s relative to base (64j)//3
            wc[m, (cidx % 3) * 24 + cidx // 3, k] = 1.0
    return wy, wc


@lru_cache(maxsize=None)
def _spatial_unpack_rpb(height: int, width: int, n_srcs: int):
    """Largest row block (multiple of 8) whose n_srcs in+out blocks fit
    VMEM double-buffered; None = geometry unsupported."""
    g = v210fmt.pitch(width) // 6
    for r in (40, 32, 24, 16, 8):
        if height % r:
            continue
        ins = 2 * n_srcs * 4 * r * g * 4
        outs = 2 * n_srcs * 4 * r * width * 4
        vals = 2 * 12 * r * (g + 24) * 2
        if ins + outs + vals + 512 * 1024 <= 13 * 1024 * 1024:
            return r
    return None


def _make_v210_spatial_unpack(
    width: int,
    height: int,
    col_spec: str,
    out_col_spec: str,
    interpret: bool,
    n_srcs: int = 1,
    channels: int = 4,
):
    """v210 word planes -> linear RGBA (4, H, W) in ONE kernel, with
    the phase->spatial deinterleave done on the MXU via constant
    one-hot matmuls (exact; see _v210_spatial_weights).  Replaces the
    old phase-output + XLA-transpose formulation, whose (4,6,H,G) ->
    (4,H,W) relayout cost ~0.9 ms per UHD source — ~8 ms of the 4-layer
    dissolve serving shape's frame budget.  Requires width % 128 == 0
    (every broadcast raster: 1280/1920/3840/7680).

    ``n_srcs`` > 1 unpacks SEVERAL sources in the one launch (separate
    in/out refs, source loop in-kernel): the serving shape's 8 unpacks
    collapse to one.  Measured NEUTRAL on single-channel UHD device
    time (the inter-kernel gap the stage profile showed is not unpack
    launch overhead); kept because fewer launches lowers scheduler
    pressure when several channels share the chip."""
    assert width % 128 == 0
    g = v210fmt.pitch(width) // 6
    g2 = g + 24  # zero tail so the last chunks' static slices stay in-bounds
    n_chunks = width // 128
    col_fwd = _literals(cm.ycbcr2rgb_matrix(col_spec, 10, 64, 940, 896))
    gamut = _literals(cm.rgb2rgb_matrix(col_spec, out_col_spec))
    g2l, _ = _gamma_fns(col_spec, out_col_spec)
    r = _spatial_unpack_rpb(height, width, n_srcs)
    assert r is not None, "caller gates on _spatial_unpack_rpb"

    def kernel(*refs):
        plane_refs = refs[: 4 * n_srcs]
        wy_ref, wc_ref = refs[4 * n_srcs : 4 * n_srcs + 2]
        out_refs = refs[4 * n_srcs + 2 : 4 * n_srcs + 2 + n_srcs]
        (vals,) = refs[4 * n_srcs + 2 + n_srcs :]

        def one_source(s):
            out_ref = out_refs[s]
            p0, p1, p2, p3 = plane_refs[4 * s : 4 * s + 4]
            ys, cbs, crs = _unpack_phases(p0[:], p1[:], p2[:], p3[:])
            vals[:, :, :, g:] = jnp.zeros((2, 12, r, g2 - g), jnp.bfloat16)
            # 10-bit codes ride as 4*hi8 + lo2: both halves are
            # bf16-exact, and the DISTINCT multipliers below make the
            # two selection dots impossible for Mosaic to merge into
            # one lossy bf16 sum (the hazard documented in
            # ops/pallas_rotate.py — a plain hi/lo split with a shared
            # weight matrix is merge-bait)
            for q, plane in enumerate(list(ys) + list(cbs) + list(crs)):
                vals[0, q, :, :g] = (
                    (plane >> 2).astype(jnp.float32).astype(jnp.bfloat16)
                )
                vals[1, q, :, :g] = (
                    (plane & 3).astype(jnp.float32).astype(jnp.bfloat16)
                )
            if channels == 4:
                out_ref[3] = jnp.ones((r, width), jnp.float32)
            # channels == 3: opaque rings carry no alpha plane at all

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

            for j in range(n_chunks):
                wy = wy_ref[j % 3]
                wc = wc_ref[j % 3]
                b, bc = (128 * j) // 6, (64 * j) // 3
                ysp = deint(range(6), b, wy)
                usp = deint(range(6, 9), bc, wc)
                vsp = deint(range(9, 12), bc, wc)
                rgb = _decode_yuv(ysp, usp, vsp, col_fwd, gamut, g2l)
                for c in range(3):
                    out_ref[c, :, 128 * j : 128 * (j + 1)] = rgb[c]

        for s in range(n_srcs):
            one_source(s)

    call = pl.pallas_call(
        kernel,
        grid=(height // r,),
        in_specs=[
            pl.BlockSpec((r, g), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4 * n_srcs)
        ]
        + [
            pl.BlockSpec((3, 144, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 72, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (channels, r, width), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
            for _ in range(n_srcs)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((channels, height, width), jnp.float32)
            for _ in range(n_srcs)
        ],
        scratch_shapes=[pltpu.VMEM((2, 12, r, g2), jnp.bfloat16)],
        interpret=interpret,
    )
    # keep the weights as NUMPY in the closure: this builder is reached
    # lazily inside jit traces (lru_cache), and a jnp.asarray created
    # under a trace is a tracer — caching it leaks it into later traces
    wy_np, wc_np = _v210_spatial_weights()

    if n_srcs == 1:

        def unpack_planes(planes):
            wy_j = jnp.asarray(wy_np, jnp.bfloat16)
            wc_j = jnp.asarray(wc_np, jnp.bfloat16)
            out = call(planes[0], planes[1], planes[2], planes[3], wy_j, wc_j)
            return out[0]

        return unpack_planes

    def unpack_many(planes_lists):
        wy_j = jnp.asarray(wy_np, jnp.bfloat16)
        wc_j = jnp.asarray(wc_np, jnp.bfloat16)
        flat = [p[k] for p in planes_lists for k in range(4)]
        return list(call(*flat, wy_j, wc_j))

    return unpack_many


def batch_unpack_fits(width: int, height: int, n_srcs: int) -> bool:
    return width % 128 == 0 and _spatial_unpack_rpb(height, width, n_srcs) is not None


@lru_cache(maxsize=None)
def make_v210_unpack_rgba_batch(
    width: int,
    height: int,
    n_srcs: int,
    col_spec: str = "709",
    out_col_spec: str = "709",
    interpret: bool | None = None,
    channels: int = 4,
):
    """fn([planes...] x n_srcs) -> [rgba (C,H,W)] x n_srcs, ONE launch.
    Each entry is a (4, H, G) word-plane array list (host-split form).
    ``channels=3`` emits alpha-free opaque frames for the 3-channel
    deinterlace/warp ring path."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _make_v210_spatial_unpack(
        width, height, col_spec, out_col_spec, interpret, n_srcs, channels
    )


@lru_cache(maxsize=None)
def make_v210_unpack_rgba(
    width: int,
    height: int,
    col_spec: str = "709",
    out_col_spec: str = "709",
    rows_per_block: int = 16,
    interpret: bool | None = None,
):
    """v210 words -> linear RGBA (4, H, W) as one Pallas kernel plus a
    phase->spatial relayout.  Drop-in replacement for the XLA unpack
    inside larger jitted programs (tracing through pallas_call is fine);
    ~5x faster than the XLA formulation at 1080p.  Widths % 128 == 0
    route to the fully-fused spatial kernel (_make_v210_spatial_unpack,
    no XLA relayout at all)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = v210fmt.pitch(width) // 6
    col_fwd = [
        [float(v) for v in row] for row in cm.ycbcr2rgb_matrix(col_spec, 10, 64, 940, 896)
    ]
    gamut = [[float(v) for v in row] for row in cm.rgb2rgb_matrix(col_spec, out_col_spec)]

    def g2l(x):
        return gamma2linear_at_index(col_spec, u16_sat_rte(x * 65535.0))

    def kernel(p0, p1, p2, p3, out_ref):
        ys, cbs, crs = _unpack_phases(p0[:], p1[:], p2[:], p3[:])
        for p in range(6):
            yf = ys[p].astype(jnp.float32)
            uf = cbs[p // 2].astype(jnp.float32)
            vf = crs[p // 2].astype(jnp.float32)
            chans = []
            for c in range(3):
                gam = (
                    col_fwd[c][0] * yf
                    + col_fwd[c][1] * uf
                    + col_fwd[c][2] * vf
                    + col_fwd[c][3]
                )
                chans.append(g2l(gam))
            for c in range(3):
                out_ref[c, p] = (
                    gamut[c][0] * chans[0] + gamut[c][1] * chans[1] + gamut[c][2] * chans[2]
                )
            out_ref[3, p] = jnp.ones_like(chans[0])

    r = rows_per_block
    while height % r:
        r //= 2

    call = pl.pallas_call(
        kernel,
        grid=(height // r,),
        in_specs=[
            pl.BlockSpec((r, g), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec(
            (4, 6, r, g), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, 6, height, g), jnp.float32),
        interpret=interpret,
    )

    spatial = (
        _make_v210_spatial_unpack(width, height, col_spec, out_col_spec, interpret)
        if batch_unpack_fits(width, height, 1)
        else None
    )

    def unpack(words: jnp.ndarray) -> jnp.ndarray:
        # (H, G*4) interleaved words, or (4, H, G) word planes already
        # split on the host (formats.v210.host_split_planes — the
        # device-side transpose is a ~2.3 ms relayout at UHD)
        if words.ndim == 3:
            planes = words.astype(jnp.uint32)
        else:
            planes = words_to_planes(words.astype(jnp.uint32))
        if spatial is not None:
            return spatial(planes)
        phases = call(planes[0], planes[1], planes[2], planes[3])
        # (4, 6, H, G) -> (4, H, G, 6) -> (4, H, pitch) -> crop to width
        flat = phases.transpose(0, 2, 3, 1).reshape(4, height, g * 6)
        return flat[:, :, :width]

    return unpack


@lru_cache(maxsize=None)
def make_v210_pack_rgba(
    width: int,
    height: int,
    out_col_spec: str = "709",
    rows_per_block: int = 16,
    interpret: bool | None = None,
    channels: int = 4,
):
    """Linear RGBA (C, H, W) -> v210 words as one Pallas kernel.
    ``channels=3`` packs an alpha-free composite (combine_rgb) — the
    encode never reads alpha, so this just drops 1/4 of the input DMA."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = v210fmt.pitch(width) // 6
    col_bwd = _literals(cm.rgb2ycbcr_matrix(out_col_spec, 10, 64, 940, 896))
    _, l2g = _gamma_fns(out_col_spec, out_col_spec)

    def kernel(in_ref, o0, o1, o2, o3):
        y_masks, c_masks = _phase_masks(width, g, o0.shape)
        codes = [
            _encode_rgb(in_ref[0, p], in_ref[1, p], in_ref[2, p], col_bwd, l2g, 0x3FF)
            for p in range(6)
        ]

        def maskp(x, p):
            return jnp.where(y_masks[p], x, 0) if y_masks is not None else x

        def maskc(x, s):
            return jnp.where(c_masks[s], x, 0) if c_masks is not None else x

        y = [maskp(codes[p][0], p).astype(jnp.uint32) for p in range(6)]
        u = [maskc(codes[2 * s][1], s).astype(jnp.uint32) for s in range(3)]
        v = [maskc(codes[2 * s][2], s).astype(jnp.uint32) for s in range(3)]
        o0[:] = (v[0] << 20) | (y[0] << 10) | u[0]
        o1[:] = (y[2] << 20) | (u[1] << 10) | y[1]
        o2[:] = (u[2] << 20) | (y[3] << 10) | v[1]
        o3[:] = (y[5] << 20) | (v[2] << 10) | y[4]

    r = rows_per_block
    while height % r:
        r //= 2

    call = pl.pallas_call(
        kernel,
        grid=(height // r,),
        in_specs=[
            pl.BlockSpec(
                (channels, 6, r, g), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec((r, g), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[jax.ShapeDtypeStruct((height, g), jnp.uint32) for _ in range(4)],
        interpret=interpret,
    )

    def pack(rgba: jnp.ndarray) -> jnp.ndarray:
        # spatial (C, H, W) -> pad to pitch -> (C, 6, H, G) phase layout
        pitch_px = g * 6
        pad = pitch_px - width
        if pad:
            rgba = jnp.pad(rgba, ((0, 0), (0, 0), (0, pad)))
        phases = rgba.reshape(channels, height, g, 6).transpose(0, 3, 1, 2)
        outs = call(phases)
        return planes_to_words(jnp.stack(outs))

    return pack


def _v210_pack_weights(g: int):
    """Constant one-hot for the spatial -> phase gather of the pack
    side.  A 128-group output chunk starting at group 128c covers
    spatial lanes [768c, 768c+768); since 768 = 6*128 the relative
    pattern is chunk-independent: output phase-lane (o, l) selects
    spatial x_rel = 6l + o.  One (768, 6*128) matrix holds all six
    offsets side by side; chroma (phases at even offsets 2s — cb and cr
    share the even-pixel site, upsample_422's inverse) reuses the same
    columns."""
    import numpy as np

    w6 = np.zeros((768, 6 * 128), np.float32)
    for o in range(6):
        for l in range(128):
            w6[6 * l + o, o * 128 + l] = 1.0
    return w6


_CPK_VMEM_BUDGET = 13 * 1024 * 1024


def _combine_pack_config(width: int, height: int, n_layers: int):
    """Row block for the fused combine+pack kernel, bounded by VMEM
    (every layer's block is resident; many-layer channels must fall
    back to the staged tail rather than fail to compile mid-serve)."""
    g = v210fmt.pitch(width) // 6
    if width % 48 or g % 128 or n_layers < 1:
        return None
    for r in (16, 8):
        if height % r:
            continue
        blocks = 2 * n_layers * 4 * r * width * 4  # double-buffered inputs
        outs = 2 * 4 * r * g * 4
        codes = 2 * 3 * r * width * 2
        w6 = 768 * 768 * 2
        if blocks + outs + codes + w6 <= _CPK_VMEM_BUDGET:
            return r
    return None


def combine_pack_fits(width: int, height: int, n_layers: int) -> bool:
    """Gate for pipeline routing: geometry AND VMEM must both admit the
    fused tail (mirrors warp_fits / rotate_fits ownership: the kernel
    module owns its own feasibility rule)."""
    return _combine_pack_config(width, height, n_layers) is not None


@lru_cache(maxsize=None)
def make_v210_combine_pack(
    width: int,
    height: int,
    n_layers: int,
    out_col_spec: str = "709",
    interpret: bool | None = None,
    layer_chs: tuple | None = None,
):
    """N-layer premultiplied 'over' + v210 pack in ONE kernel.

    The staged tail of the channel program (XLA combine -> pack kernel)
    costs two launches and a full RGBA round trip (~2.3 ms at UHD);
    this kernel over-accumulates the warped layers in VMEM
    (combine.ts:47-59 semantics over the implicit black base), encodes
    on spatial tiles, and does the spatial -> phase gather with the
    constant one-hot of _v210_pack_weights on the MXU (codes as
    4*hi8 + lo2: exact and merge-proof, see the in-kernel comment).
    Gated by combine_pack_fits: width % 48 == 0, groups % 128 == 0
    (UHD / 8K) and a VMEM bound over the layer count."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if layer_chs is None:
        layer_chs = (4,) * n_layers
    assert len(layer_chs) == n_layers and all(c in (3, 4) for c in layer_chs)
    g = v210fmt.pitch(width) // 6
    r = _combine_pack_config(width, height, n_layers)
    assert r is not None, "caller gates on combine_pack_fits"
    col_bwd = _literals(cm.rgb2ycbcr_matrix(out_col_spec, 10, 64, 940, 896))
    _, l2g = _gamma_fns(out_col_spec, out_col_spec)
    n_gchunks = g // 128
    # ref layout: per layer, the frame ref (+ wy (H, 1) and wx (1, W)
    # separable-alpha refs for 3-channel opaque layers)
    n_in = sum(1 if c == 4 else 3 for c in layer_chs)

    def kernel(*refs):
        ins = refs[:n_in]
        w6_ref = refs[n_in]
        o0, o1, o2, o3 = refs[n_in + 1 : n_in + 5]
        (codes,) = refs[n_in + 5 :]

        # ---- over-accumulate (acc starts at the black base = zeros)
        rgb = None
        pos = 0
        for l in range(n_layers):
            layer = ins[pos][:, :, :]
            if layer_chs[l] == 3:
                # separable alpha: a = wy (rows) x wx (cols), never a
                # stored plane (pallas_warp.warp_alpha_vectors)
                a = ins[pos + 1][:, :] * ins[pos + 2][:, :]
                pos += 3
            else:
                a = layer[3]
                pos += 1
            if rgb is None:
                rgb = [layer[c] for c in range(3)]
                continue
            k = 1.0 - a
            rgb = [rgb[c] * k + layer[c] for c in range(3)]

        # ---- encode on spatial tiles; 10-bit codes split as
        # 4*hi8 + lo2 (hi8 <= 255 and lo2 <= 3 are both bf16-exact, and
        # the DIFFERENT scalar multipliers make the two selection dots
        # impossible to merge into one lossy bf16 sum — see
        # ops/pallas_rotate.py for the merge hazard)
        y, u, v = _encode_rgb(rgb[0], rgb[1], rgb[2], col_bwd, l2g, 0x3FF)
        for q, plane in enumerate((y, u, v)):
            codes[0, q] = (plane >> 2).astype(jnp.float32).astype(jnp.bfloat16)
            codes[1, q] = (plane & 3).astype(jnp.float32).astype(jnp.bfloat16)

        # ---- spatial -> phase gather + word assembly per group chunk
        # (fori_loop, not a Python loop: 5 unrolled chunks of dots +
        # word assembly at UHD made the Mosaic lowering take minutes)
        def one_chunk(c):
            s0 = pl.multiple_of(c * 768, 128)
            hi8 = codes[0, :, :, pl.ds(s0, 768)].reshape(3 * r, 768)
            lo2 = codes[1, :, :, pl.ds(s0, 768)].reshape(3 * r, 768)
            prod = 4.0 * jnp.dot(
                hi8, w6_ref[:, :], preferred_element_type=jnp.float32
            ) + jnp.dot(
                lo2, w6_ref[:, :], preferred_element_type=jnp.float32
            )  # (3r, 768): rows [y|u|v], cols = 6 offsets x 128 groups
            def at(row, off):
                # Mosaic has no f32->u32 cast; the codes are exact
                # small integers, so s32 is a safe stop-over
                v = prod[row * r : (row + 1) * r, off * 128 : (off + 1) * 128]
                return v.astype(jnp.int32).astype(jnp.uint32)

            yp = [at(0, p) for p in range(6)]
            up = [at(1, 2 * s) for s in range(3)]
            vp = [at(2, 2 * s) for s in range(3)]
            sl = pl.ds(pl.multiple_of(c * 128, 128), 128)
            o0[:, sl] = (vp[0] << 20) | (yp[0] << 10) | up[0]
            o1[:, sl] = (yp[2] << 20) | (up[1] << 10) | yp[1]
            o2[:, sl] = (up[2] << 20) | (yp[3] << 10) | vp[1]
            o3[:, sl] = (yp[5] << 20) | (vp[2] << 10) | yp[4]

        jax.lax.fori_loop(0, n_gchunks, lambda c, _: (one_chunk(c), 0)[1], 0)

    in_specs = []
    for c in layer_chs:
        in_specs.append(
            pl.BlockSpec((c, r, width), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        )
        if c == 3:
            in_specs.append(
                pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
            )
            in_specs.append(
                pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
    call = pl.pallas_call(
        kernel,
        grid=(height // r,),
        in_specs=in_specs
        + [pl.BlockSpec((768, 768), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((r, g), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[jax.ShapeDtypeStruct((height, g), jnp.uint32) for _ in range(4)],
        scratch_shapes=[pltpu.VMEM((2, 3, r, width), jnp.bfloat16)],
        interpret=interpret,
    )
    w6_np = _v210_pack_weights(g)

    def combine_pack(frames: list) -> jnp.ndarray:
        """frames: warped layers bottom..top (black base implicit) —
        (4, H, W) RGBA, or (rgb (3, H, W), wy (H,), wx (W,)) tuples for
        layer_chs == 3 entries.  -> interleaved v210 words (H, G*4)."""
        w6 = jnp.asarray(w6_np, jnp.bfloat16)
        flat = []
        for c, f in zip(layer_chs, frames):
            if c == 3:
                rgb, wy, wx = f
                flat += [rgb, wy.reshape(height, 1), wx.reshape(1, width)]
            else:
                flat.append(f)
        outs = call(*flat, w6)
        return planes_to_words(jnp.stack(outs))

    return combine_pack


@lru_cache(maxsize=None)
def make_planar422_unpack_rgba(
    fmt_name: str,
    width: int,
    height: int,
    col_spec: str = "709",
    out_col_spec: str = "709",
    rows_per_block: int = 16,
    interpret: bool | None = None,
):
    """Planar 4:2:2 (yuv422p10le / yuv422p8) -> linear RGBA (4, H, W).

    Pixel-pair phase planes: luma splits into even/odd sample planes of
    (H, pitch/2) so both pixels of a pair pair with the same chroma
    sample — all lane-aligned elementwise ops, like the v210 kernel."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from .formats import get_format

    fmt = get_format(fmt_name)
    info = fmt.INFO
    p = fmt.pitch(width)
    half = p // 2

    col_fwd = _literals(
        cm.ycbcr2rgb_matrix(
            col_spec, info.num_bits, info.luma_black, info.luma_white, info.chroma_range
        )
    )
    gamut = _literals(cm.rgb2rgb_matrix(col_spec, out_col_spec))
    g2l, _ = _gamma_fns(col_spec, out_col_spec)

    def kernel(ye, yo, u, v, out_ref):
        uf = u[:].astype(jnp.float32)
        vf = v[:].astype(jnp.float32)
        for phase, yref in enumerate((ye, yo)):
            rgb = _decode_yuv(yref[:].astype(jnp.float32), uf, vf, col_fwd, gamut, g2l)
            for c in range(3):
                out_ref[c, phase] = rgb[c]
            out_ref[3, phase] = jnp.ones_like(rgb[0])

    r = rows_per_block
    while height % r:
        r //= 2

    call = pl.pallas_call(
        kernel,
        grid=(height // r,),
        in_specs=[
            pl.BlockSpec((r, half), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec(
            (4, 2, r, half), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, 2, height, half), jnp.float32),
        interpret=interpret,
    )

    spatial_call = (
        _make_planar422_spatial_unpack(
            fmt_name, width, height, col_spec, out_col_spec, interpret
        )
        if width % 128 == 0 and width == p
        else None
    )

    def unpack(planes) -> jnp.ndarray:
        y, u, v = (pl_.astype(jnp.int32) for pl_ in planes)
        if spatial_call is not None:
            return spatial_call(y, u, v)
        phases = call(y[:, 0::2], y[:, 1::2], u, v)
        spatial = phases.transpose(0, 2, 3, 1).reshape(4, height, p)
        return spatial[:, :, :width]

    return unpack


@lru_cache(maxsize=None)
def _make_planar422_spatial_unpack(
    fmt_name: str,
    width: int,
    height: int,
    col_spec: str,
    out_col_spec: str,
    interpret: bool,
):
    """Planar 4:2:2 -> spatial RGBA in ONE kernel: luma reads straight
    spatial slices; the 2x chroma upsample (u[x] = u_half[x//2],
    upsample_422 semantics) is a constant one-hot matmul — no XLA
    even/odd luma split, no phase transpose (the same relayout
    elimination as the v210 spatial unpack).  Codes ride as 4*hi8 + lo2
    (exact, merge-proof — see ops/pallas_rotate.py)."""
    from .formats import get_format

    fmt = get_format(fmt_name)
    info = fmt.INFO
    half = width // 2
    n_chunks = width // 128
    col_fwd = _literals(
        cm.ycbcr2rgb_matrix(
            col_spec, info.num_bits, info.luma_black, info.luma_white, info.chroma_range
        )
    )
    gamut = _literals(cm.rgb2rgb_matrix(col_spec, out_col_spec))
    g2l, _ = _gamma_fns(col_spec, out_col_spec)
    r = next(c for c in (40, 32, 24, 16, 8) if height % c == 0)

    def kernel(y, u, v, wup_ref, out_ref, cuv):
        for ci, cref in enumerate((u, v)):
            cc = cref[:]
            cuv[0, ci] = (cc >> 2).astype(jnp.float32).astype(jnp.bfloat16)
            cuv[1, ci] = (cc & 3).astype(jnp.float32).astype(jnp.bfloat16)
        out_ref[3] = jnp.ones((r, width), jnp.float32)
        for j in range(n_chunks):
            sl = slice(128 * j, 128 * (j + 1))
            ysp = y[:, sl].astype(jnp.float32)
            hi8 = cuv[0, :, :, 64 * j : 64 * j + 64].reshape(2 * r, 64)
            lo2 = cuv[1, :, :, 64 * j : 64 * j + 64].reshape(2 * r, 64)
            pr = 4.0 * jnp.dot(
                hi8, wup_ref[:, :], preferred_element_type=jnp.float32
            ) + jnp.dot(lo2, wup_ref[:, :], preferred_element_type=jnp.float32)
            rgb = _decode_yuv(ysp, pr[:r], pr[r:], col_fwd, gamut, g2l)
            for c in range(3):
                out_ref[c, :, sl] = rgb[c]

    call = pl.pallas_call(
        kernel,
        grid=(height // r,),
        in_specs=[
            pl.BlockSpec((r, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, r, width), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, height, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 2, r, half), jnp.bfloat16)],
        interpret=interpret,
    )
    import numpy as np

    wup_np = np.zeros((64, 128), np.float32)
    for k in range(128):
        wup_np[k // 2, k] = 1.0

    def unpack(y, u, v):
        return call(y, u, v, jnp.asarray(wup_np, jnp.bfloat16))

    return unpack


@lru_cache(maxsize=None)
def make_planar422_pack_rgba(
    fmt_name: str,
    width: int,
    height: int,
    out_col_spec: str = "709",
    rows_per_block: int = 16,
    interpret: bool | None = None,
):
    """Linear RGBA (4, H, W) -> planar 4:2:2 planes."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from .formats import get_format

    fmt = get_format(fmt_name)
    info = fmt.INFO
    p = fmt.pitch(width)
    half = p // 2
    cnull = 128 << (info.num_bits - 8)
    code_mask = (1 << info.num_bits) - 1
    out_np_dtype = jnp.uint16 if info.num_bits > 8 else jnp.uint8

    col_bwd = _literals(
        cm.rgb2ycbcr_matrix(
            out_col_spec, info.num_bits, info.luma_black, info.luma_white, info.chroma_range
        )
    )
    _, l2g = _gamma_fns(out_col_spec, out_col_spec)

    def kernel(in_ref, ye_ref, yo_ref, u_ref, v_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, ye_ref.shape, dimension=1)
        # pitch padding packs as black / chroma null (write-kernel tail
        # defaults, yuv422p10.ts:180-182)
        codes = [
            _encode_rgb(in_ref[0, p], in_ref[1, p], in_ref[2, p], col_bwd, l2g, code_mask)
            for p in range(2)
        ]
        ye_valid = (lanes * 2) < width
        yo_valid = (lanes * 2 + 1) < width
        c_valid = lanes < ((width + 1) // 2)
        ye_ref[:] = jnp.where(ye_valid, codes[0][0], info.luma_black)
        yo_ref[:] = jnp.where(yo_valid, codes[1][0], info.luma_black)
        # chroma from even pixels (yuv422p10.ts:169-170)
        u_ref[:] = jnp.where(c_valid, codes[0][1], cnull)
        v_ref[:] = jnp.where(c_valid, codes[0][2], cnull)

    r = rows_per_block
    while height % r:
        r //= 2

    call = pl.pallas_call(
        kernel,
        grid=(height // r,),
        in_specs=[
            pl.BlockSpec((4, 2, r, half), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((r, half), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[jax.ShapeDtypeStruct((height, half), jnp.int32) for _ in range(4)],
        interpret=interpret,
    )

    def pack(rgba: jnp.ndarray):
        pad = p - width
        if pad:
            rgba = jnp.pad(rgba, ((0, 0), (0, 0), (0, pad)))
        phases = rgba.reshape(4, height, half, 2).transpose(0, 3, 1, 2)
        ye, yo, u, v = call(phases)
        y = jnp.stack([ye, yo], axis=-1).reshape(height, p).astype(out_np_dtype)
        return [y, u.astype(out_np_dtype), v.astype(out_np_dtype)]

    return pack


@lru_cache(maxsize=None)
def make_planar420_unpack_rgba(
    fmt_name: str,
    width: int,
    height: int,
    col_spec: str = "709",
    out_col_spec: str = "709",
    rows_per_block: int = 16,
    interpret: bool | None = None,
):
    """4:2:0 (yuv420p / nv12) -> linear RGBA (4, H, W).

    Line-pair x pixel-pair phase planes: luma splits into four
    (row-parity, col-parity) planes of (H/2, pitch/2) so every phase
    shares the SAME chroma sample — all lane-aligned elementwise ops
    (the XLA formulation's chroma upsample costs ~5 ms of lane/sublane
    relayouts at 1080p; this kernel has none).  nv12's interleaved
    CbCr plane splits device-side in the wrapper (nv12.ts:24-60)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from .formats import get_format

    fmt = get_format(fmt_name)
    info = fmt.INFO
    p = fmt.pitch(width)
    half = p // 2
    assert height % 2 == 0, "4:2:0 kernels take even heights"
    h2 = height // 2
    # Mosaic wants row blocks divisible by 8: pad the chroma-row dim
    # (540 at 1080p has no 8-multiple divisor) and crop after
    h2p = -(-h2 // 8) * 8

    hp = 2 * h2p

    col_fwd = _literals(
        cm.ycbcr2rgb_matrix(
            col_spec, info.num_bits, info.luma_black, info.luma_white, info.chroma_range
        )
    )
    gamut = _literals(cm.rgb2rgb_matrix(col_spec, out_col_spec))
    g2l, _ = _gamma_fns(col_spec, out_col_spec)

    def kernel(ye, yo, u, v, out_ref):
        # chroma rows double across the line pair IN VMEM (sublane
        # broadcast+reshape) — the pixel-pair phase split stays in XLA
        # exactly like the proven 4:2:2 layout
        r2 = ye.shape[0]
        rr = r2 // 2

        def row_double(c):
            cf = c[:].astype(jnp.float32)
            return jnp.broadcast_to(cf[:, None, :], (rr, 2, half)).reshape(r2, half)

        uf = row_double(u)
        vf = row_double(v)
        for phase, yref in enumerate((ye, yo)):
            rgb = _decode_yuv(yref[:].astype(jnp.float32), uf, vf, col_fwd, gamut, g2l)
            for c in range(3):
                out_ref[c, phase] = rgb[c]
            out_ref[3, phase] = jnp.ones_like(rgb[0])

    r = rows_per_block if h2p % rows_per_block == 0 else 8

    call = pl.pallas_call(
        kernel,
        grid=(h2p // r,),
        in_specs=[
            pl.BlockSpec((2 * r, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * r, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, 2, 2 * r, half), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, 2, hp, half), jnp.float32),
        interpret=interpret,
    )

    spatial_call = _make_planar420_spatial_unpack(
        fmt_name, width, height, col_spec, out_col_spec, interpret
    )

    def unpack(planes) -> jnp.ndarray:
        if spatial_call is not None:
            return spatial_call([pl_.astype(jnp.int32) for pl_ in planes])
        if fmt_name == "nv12":
            y, c = (pl_.astype(jnp.int32) for pl_ in planes)
            u, v = c[:, 0::2], c[:, 1::2]
        else:
            y, u, v = (pl_.astype(jnp.int32) for pl_ in planes)
        if h2p != h2:
            y = jnp.pad(y, ((0, hp - height), (0, 0)))
            u = jnp.pad(u, ((0, h2p - h2), (0, 0)))
            v = jnp.pad(v, ((0, h2p - h2), (0, 0)))
        phases = call(y[:, 0::2], y[:, 1::2], u, v)[:, :, :height, :]
        spatial = phases.transpose(0, 2, 3, 1).reshape(4, height, p)
        return spatial[:, :, :width]

    return unpack


def _planar420_spatial_rpb(height: int):
    """Luma row block: r divides the (padded) height and r//2 is a
    Mosaic-legal 8-multiple sublane block for the half-rate chroma
    rows; None = keep the phase path."""
    for r in (32, 16):
        if height % r == 0:
            return r
    return None


@lru_cache(maxsize=None)
def _make_planar420_spatial_unpack(
    fmt_name: str,
    width: int,
    height: int,
    col_spec: str,
    out_col_spec: str,
    interpret: bool,
):
    """4:2:0 -> spatial RGBA in ONE kernel: luma reads straight spatial
    slices; the 2x2 chroma upsample is a constant one-hot matmul on
    half-rate chroma rows followed by a sublane row-double.  For nv12
    the one-hot ALSO absorbs the CbCr de-interleave (columns 2*(x//2)
    and 2*(x//2)+1 of the interleaved plane) — the wrapper's strided
    column splits and the phase transpose both disappear.  Codes ride
    as 4*hi8 + lo2 (exact, merge-proof; ops/pallas_rotate.py)."""
    from .formats import get_format

    fmt = get_format(fmt_name)
    info = fmt.INFO
    p = fmt.pitch(width)
    if width % 128 or width != p or height % 2:
        return None
    # luma rows pad to a 16-multiple so the HALF-RATE chroma block keeps
    # 8-sublane alignment (1080 has no 16-multiple divisor); the wrapper
    # pads and the output crops
    hp = -(-height // 16) * 16
    r = _planar420_spatial_rpb(hp)
    if r is None:
        return None
    nv12 = fmt_name == "nv12"
    half = width // 2
    r2 = r // 2
    n_chunks = width // 128
    col_fwd = _literals(
        cm.ycbcr2rgb_matrix(
            col_spec, info.num_bits, info.luma_black, info.luma_white, info.chroma_range
        )
    )
    gamut = _literals(cm.rgb2rgb_matrix(col_spec, out_col_spec))
    g2l, _ = _gamma_fns(col_spec, out_col_spec)
    cwidth = width if nv12 else half  # chroma plane lane count
    cwin = 128 if nv12 else 64  # chroma window per 128-px chunk

    def row_double(x):
        return jnp.broadcast_to(x[:, None, :], (r2, 2, 128)).reshape(r, 128)

    def kernel(*refs):
        if nv12:
            y, c, w_ref, out_ref, cuv = refs
            crefs = (c,)
        else:
            y, u, v, w_ref, out_ref, cuv = refs
            crefs = (u, v)
        for ci, cref in enumerate(crefs):
            cc = cref[:]
            cuv[0, ci] = (cc >> 2).astype(jnp.float32).astype(jnp.bfloat16)
            cuv[1, ci] = (cc & 3).astype(jnp.float32).astype(jnp.bfloat16)
        out_ref[3] = jnp.ones((r, width), jnp.float32)
        n_cref = len(crefs)
        for j in range(n_chunks):
            sl = slice(128 * j, 128 * (j + 1))
            ysp = y[:, sl].astype(jnp.float32)
            cb = cwin * j
            hi8 = cuv[0, :n_cref, :, cb : cb + cwin].reshape(n_cref * r2, cwin)
            lo2 = cuv[1, :n_cref, :, cb : cb + cwin].reshape(n_cref * r2, cwin)
            pr = 4.0 * jnp.dot(
                hi8, w_ref[:, :], preferred_element_type=jnp.float32
            ) + jnp.dot(lo2, w_ref[:, :], preferred_element_type=jnp.float32)
            if nv12:
                # one lhs row-block; w maps to [u | v] column halves
                usp = row_double(pr[:r2, :128])
                vsp = row_double(pr[:r2, 128:])
            else:
                usp = row_double(pr[:r2])
                vsp = row_double(pr[r2:])
            rgb = _decode_yuv(ysp, usp, vsp, col_fwd, gamut, g2l)
            for c in range(3):
                out_ref[c, :, sl] = rgb[c]

    import numpy as np

    if nv12:
        w_np = np.zeros((128, 256), np.float32)
        for k in range(128):
            w_np[2 * (k // 2), k] = 1.0  # Cb
            w_np[2 * (k // 2) + 1, 128 + k] = 1.0  # Cr
        w_shape = (128, 256)
    else:
        w_np = np.zeros((64, 128), np.float32)
        for k in range(128):
            w_np[k // 2, k] = 1.0
        w_shape = (64, 128)

    chroma_specs = [
        pl.BlockSpec((r2, cwidth), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(1 if nv12 else 2)
    ]
    call = pl.pallas_call(
        kernel,
        grid=(hp // r,),
        in_specs=[pl.BlockSpec((r, width), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + chroma_specs
        + [pl.BlockSpec(w_shape, lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (4, r, width), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, hp, width), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 1 if nv12 else 2, r2, cwidth), jnp.bfloat16)
        ],
        interpret=interpret,
    )

    def unpack(planes):
        if hp != height:
            pady = hp - height
            planes = [jnp.pad(planes[0], ((0, pady), (0, 0)))] + [
                jnp.pad(q, ((0, pady // 2), (0, 0))) for q in planes[1:]
            ]
        out = call(*planes, jnp.asarray(w_np, jnp.bfloat16))
        return out[:, :height, :] if hp != height else out

    return unpack


@lru_cache(maxsize=None)
def make_planar420_pack_rgba(
    fmt_name: str,
    width: int,
    height: int,
    out_col_spec: str = "709",
    rows_per_block: int = 16,
    interpret: bool | None = None,
):
    """Linear RGBA (4, H, W) -> 4:2:0 planes (yuv420p: y/u/v; nv12:
    y + interleaved CbCr).  Chroma comes from even lines' even pixels
    (yuv420p.ts:191-201); pitch padding packs black/chroma-null."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from .formats import get_format

    fmt = get_format(fmt_name)
    info = fmt.INFO
    p = fmt.pitch(width)
    half = p // 2
    assert height % 2 == 0, "4:2:0 kernels take even heights"
    h2 = height // 2
    h2p = -(-h2 // 8) * 8  # 8-aligned row blocks (see unpack)
    cnull = 128 << (info.num_bits - 8)
    code_mask = (1 << info.num_bits) - 1

    col_bwd = _literals(
        cm.rgb2ycbcr_matrix(
            out_col_spec, info.num_bits, info.luma_black, info.luma_white, info.chroma_range
        )
    )
    _, l2g = _gamma_fns(out_col_spec, out_col_spec)

    hp = 2 * h2p

    def kernel(in_ref, ye_ref, yo_ref, u_ref, v_ref):
        # same pixel-pair layout as the 4:2:2 pack; chroma additionally
        # takes only EVEN rows (in-VMEM sublane stride) — the reference
        # writes chroma for l==0 of each line pair (yuv420p.ts:191-201)
        lanes = jax.lax.broadcasted_iota(jnp.int32, ye_ref.shape, dimension=1)
        codes = [
            _encode_rgb(in_ref[0, ph], in_ref[1, ph], in_ref[2, ph], col_bwd, l2g, code_mask)
            for ph in range(2)
        ]
        ye_valid = (lanes * 2) < width
        yo_valid = (lanes * 2 + 1) < width
        ye_ref[:] = jnp.where(ye_valid, codes[0][0], info.luma_black)
        yo_ref[:] = jnp.where(yo_valid, codes[1][0], info.luma_black)

        r2 = ye_ref.shape[0]
        rr = r2 // 2
        clanes = jax.lax.broadcasted_iota(jnp.int32, (rr, half), 1)
        c_valid = clanes < ((width + 1) // 2)

        def even_rows(x):
            return x.reshape(rr, 2, half)[:, 0, :]

        u_ref[:] = jnp.where(c_valid, even_rows(codes[0][1]), cnull)
        v_ref[:] = jnp.where(c_valid, even_rows(codes[0][2]), cnull)

    r = rows_per_block if h2p % rows_per_block == 0 else 8

    call = pl.pallas_call(
        kernel,
        grid=(h2p // r,),
        in_specs=[
            pl.BlockSpec(
                (4, 2, 2 * r, half), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec((2 * r, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * r, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, half), jnp.int32),
            jax.ShapeDtypeStruct((hp, half), jnp.int32),
            jax.ShapeDtypeStruct((h2p, half), jnp.int32),
            jax.ShapeDtypeStruct((h2p, half), jnp.int32),
        ],
        interpret=interpret,
    )

    out_np_dtype = jnp.uint16 if info.num_bits > 8 else jnp.uint8

    def pack(rgba: jnp.ndarray):
        pad = p - width
        if pad:
            rgba = jnp.pad(rgba, ((0, 0), (0, 0), (0, pad)))
        phases = rgba.reshape(4, height, half, 2).transpose(0, 3, 1, 2)
        if h2p != h2:
            phases = jnp.pad(phases, ((0, 0), (0, 0), (0, hp - height), (0, 0)))
        ye, yo, u, v = call(phases)
        ye, yo, u, v = ye[:height], yo[:height], u[:h2], v[:h2]
        y = jnp.stack([ye, yo], axis=-1).reshape(height, p).astype(out_np_dtype)
        if fmt_name == "nv12":
            c = jnp.stack([u, v], axis=-1).reshape(h2, p).astype(out_np_dtype)
            return [y, c]
        return [y, u.astype(out_np_dtype), v.astype(out_np_dtype)]

    return pack


def supported_spec(spec) -> bool:
    """Which channel structures this fused kernel covers (the rest run
    on the XLA path).  v210 sources unpack fully opaque, so only the TOP
    layer is ever visible in the composite (combine.ts over-accumulation
    with alpha 1): the kernel needs the top layer to be a progressive
    v210 source without DVE warp, with cut or dissolve transition, and
    a v210 output."""
    if spec.out_format != "v210" or spec.emit_rgba or not spec.layers:
        return False
    ls = spec.layers[-1]
    if ls.src_format != "v210" or ls.has_transform or ls.deinterlace:
        return False
    if getattr(ls, "src_size", None) is not None:  # needs the resize path
        return False
    if ls.transition not in ("none", "dissolve"):
        return False
    if ls.transition == "dissolve" and (ls.src_b_format or "v210") != "v210":
        return False
    # lower layers are fully covered by the opaque top layer (their
    # alpha never reaches the output: out = prev*(1-1) + top)
    return True


@lru_cache(maxsize=None)
def make_fused_v210_program(
    width: int,
    height: int,
    col_spec: str = "709",
    out_col_spec: str = "709",
    n_layers: int = 1,
    transition: str = "none",
    rows_per_block: int = 16,
    interpret: bool | None = None,
):
    """Build the fused pallas_call.  Returns fn(word_arrays, mix=None) ->
    packed words (H, G*4); word_arrays is a list of n_layers (H, G*4)
    uint32 arrays (for dissolve: 2 arrays per layer slot, cur then next).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = v210fmt.pitch(width) // 6
    n_inputs = n_layers * (2 if transition == "dissolve" else 1)
    spec_key = (width, height, col_spec, out_col_spec, n_inputs, transition)
    kernel = _make_kernel(spec_key)

    r = rows_per_block
    while height % r:
        r //= 2
    grid = (height // r,)

    def block_spec():
        return pl.BlockSpec((r, g), lambda i: (i, 0), memory_space=pltpu.VMEM)

    in_specs = []
    if transition == "dissolve":
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    in_specs += [block_spec() for _ in range(4 * n_inputs)]
    out_specs = [block_spec() for _ in range(4)]
    out_shape = [jax.ShapeDtypeStruct((height, g), jnp.uint32) for _ in range(4)]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    @jax.jit
    def program(word_arrays, mix=None):
        args = []
        if transition == "dissolve":
            args.append(jnp.asarray(mix, jnp.float32).reshape(1, 1))
        for wa in word_arrays:
            planes = (
                wa.astype(jnp.uint32)
                if wa.ndim == 3
                else words_to_planes(wa.astype(jnp.uint32))
            )
            args.extend(planes[i] for i in range(4))
        outs = call(*args)
        return planes_to_words(jnp.stack(outs))

    return program
