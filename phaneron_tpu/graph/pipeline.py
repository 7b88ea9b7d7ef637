"""The fused per-channel frame program — the heart of the TPU build.

Where the reference runs >=6 separate kernel launches per frame with a
serialised host-side job queue between stages (clJobQueue.ts:114-141,
SURVEY.md §3.3), this module compiles each channel's whole frame path

    unpack -> colour -> [deinterlace] -> per-layer DVE transform
           -> transition -> N-layer combine -> colour -> pack

into ONE jitted XLA program: a frame makes a single TPU round trip
(BASELINE.json north star).  All animated parameters — transform
matrices, transition progress, layer enables, yadif parity — enter as
traced arguments, so AMCP command changes never recompile.  The only
recompile triggers are structural: layer count, per-layer source
format, transition type, transform on/off.  Compiled programs are
cached per structural spec (the reference likewise regenerates its
combine_N kernel on layer-count change, combiner.ts:213-217).

Specs are hashable NamedTuples -> usable as cache keys and jit static
arguments.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import io as fio
from ..ops.coeffs import make_loader, make_saver
from ..ops.composite import combine
from ..ops.formats import get_format
from ..ops.geometry import warp_affine, warp_axis_aligned
from ..ops.pallas_yadif import make_yadif_ring_program, yadif_ring_fits
from ..ops.yadif import yadif_frame
from ..runtime.frame import RGBA_F32

__all__ = [
    "LayerSpec",
    "ChannelSpec",
    "make_channel_program",
    "make_unpack_program",
    "make_pack_program",
    "make_yadif_program",
    "make_yadif_pair_field_program",
]


class LayerSpec(NamedTuple):
    """Static structure of one layer slot."""

    src_format: str
    transition: str = "none"  # 'none' | 'dissolve' | 'wipe'
    has_transform: bool = False  # run the DVE warp (MIXER ANCHOR/FILL/ROTATION)
    axis_aligned: bool = True  # no-rotation fast path
    mask_format: Optional[str] = None  # wipe mask source format
    src_b_format: Optional[str] = None  # transition target source format
    deinterlace: bool = False  # source is interlaced: inputs carry a ring
    warp_bucket: int = -1  # Pallas warp scale bucket covering the DVE
    # matrix (ops.pallas_warp.bucket_of) — host-side static decision;
    # -1 falls back to the XLA gather warp
    warp_same_mat: bool = True  # dissolve sources share one transform
    # (the common case): the fused pair kernel shares weight tables
    rot_bucket: int = -1  # quarter+shear rotation CODE covering a
    # NON-axis-aligned matrix (ops.pallas_rotate.rot_bucket_of); -1
    # falls back to the XLA 2-D gather (~40 ms/frame at 1080p)
    rot_bucket_b: int = -1  # src_b's own rotation code (a dissolve's two
    # matrices may need different quarter turns); -1 = same as rot_bucket
    src_size: Optional[tuple[int, int]] = None  # (w, h) when the source
    # geometry differs from the channel: unpack at source size, then
    # stretch-fit (the reference's normalized-coordinate sampling does
    # this implicitly in its transform kernel, transform.ts:26-29)
    src_opaque: bool = False  # the deinterlace ring's alpha is the
    # constant 1 (the WIRE format was non-RGB, so its unpack filled
    # alpha with ones) — the yadif ring kernel then skips cur's alpha
    # windows and writes the constant (bit-identical on such rings)


class ChannelSpec(NamedTuple):
    """Static structure of one channel's frame program."""

    width: int
    height: int
    out_format: str
    layers: tuple[LayerSpec, ...]
    col_spec: str = "709"
    out_col_spec: str = "709"
    gamma_mode: str = "analytic"
    tff: bool = True
    emit_rgba: bool = False  # also return the composited RGBA (route taps,
    # secondary consumers with different pack formats)
    pallas_stages: bool = False  # use the Pallas v210 unpack/pack stage
    # kernels inside this program (TPU; interpret mode on CPU)


_PLANAR422 = ("yuv422p10le", "yuv422p10", "yuv422p", "yuv422p8")
_PLANAR420 = ("yuv420p", "nv12")


def _unpack(fmt_name: str, planes, spec: ChannelSpec, size=None):
    fmt = get_format(fmt_name)
    w, h = size if size is not None else (spec.width, spec.height)
    if fmt_name == "v210" and not spec.pallas_stages and planes[0].ndim == 3:
        # host-split word planes reaching an XLA-path program (format
        # fallback): restore the interleaved form the format op expects
        from ..ops.pallas_kernels import planes_to_words

        planes = [planes_to_words(planes[0])]
    if fmt_name == "v210" and spec.pallas_stages:
        from ..ops.pallas_kernels import make_v210_unpack_rgba

        rgba = make_v210_unpack_rgba(w, h, spec.col_spec, spec.out_col_spec)(planes[0])
    elif fmt_name in _PLANAR422 and spec.pallas_stages:
        from ..ops.pallas_kernels import make_planar422_unpack_rgba

        rgba = make_planar422_unpack_rgba(fmt_name, w, h, spec.col_spec, spec.out_col_spec)(planes)
    elif fmt_name in _PLANAR420 and spec.pallas_stages and h % 2 == 0:
        from ..ops.pallas_kernels import make_planar420_unpack_rgba

        rgba = make_planar420_unpack_rgba(fmt_name, w, h, spec.col_spec, spec.out_col_spec)(planes)
    else:
        loader = _loader(fmt_name, spec)
        rgba = fio.to_rgba(fmt, planes, loader, w, h)
    return _fit_channel(rgba, spec)


@lru_cache(maxsize=None)
def _loader_cached(fmt_name: str, col: str, out_col: str, mode: str, w: int, h: int):
    return make_loader(get_format(fmt_name).INFO, col, out_col, mode)


def _loader(fmt_name: str, spec: ChannelSpec):
    return _loader_cached(
        fmt_name, spec.col_spec, spec.out_col_spec, spec.gamma_mode, spec.width, spec.height
    )


@lru_cache(maxsize=None)
def _saver_cached(fmt_name: str, col: str, mode: str):
    return make_saver(get_format(fmt_name).INFO, col, mode)


def _layer_source(
    lspec: LayerSpec, fmt_name: str, src: dict, key: str, spec: ChannelSpec,
    pre: dict | None = None, li: int | None = None,
):
    """Unpack one source slot; when deinterlacing, the runtime supplies an
    unpacked 3-frame ring ('<key>_ring': (3, 4, H, W)) plus 'parity'.
    ``pre`` holds slots already unpacked by the batched single-launch
    kernel (_batch_unpack_slots), keyed (layer index, slot key)."""
    if pre is not None and (li, key) in pre:
        return pre[(li, key)]
    if lspec.deinterlace and f"{key}_ring" in src:
        ring = src[f"{key}_ring"]
        ch = ring[0].shape[-3]  # 3: opaque alpha-free rings (shape-dispatch)
        h, w = ring[0].shape[-2:]
        if ENABLE_PALLAS_YADIF and spec.pallas_stages and yadif_ring_fits(h, w, ch):
            rgba = make_yadif_ring_program(
                h, w, spec.tff,
                opaque=lspec.src_opaque and ch == 4, channels=ch,
            )(ring[0], ring[1], ring[2], src["parity"])
        else:
            rgba = yadif_frame(
                ring[0], ring[1], ring[2], src["parity"], spec.tff,
                skip_spatial=False,
            )
        return _fit_channel(rgba, spec)
    if fmt_name == "rgba_f32":
        # already-unpacked RGBA (route producer fork of a combiner output)
        return _fit_channel(src[key], spec)
    return _unpack(fmt_name, src[key], spec, lspec.src_size)


def _fit_channel(rgba: jnp.ndarray, spec: ChannelSpec) -> jnp.ndarray:
    """Stretch-fit an already-unpacked RGBA frame whose geometry differs
    from the channel (interlaced/route sources at native size)."""
    if rgba.shape[-2:] != (spec.height, spec.width):
        from ..ops.geometry import resize_frame

        rgba = resize_frame(rgba, spec.height, spec.width)
    return rgba


# The Pallas DVE warp: scale-bucketed DMA windows keep its HBM reads at
# ~1.1-1.5x the consumed rows, well ahead of the XLA gather warp.
ENABLE_PALLAS_WARP = True

# The Pallas yadif kernel (ops.pallas_yadif): field-planar lane-slice
# windows compute only the predicted field — the interlaced default
# load's hot op.  Falls back to ops.yadif off-geometry.
ENABLE_PALLAS_YADIF = True

# The all-layers-in-one composite kernel (ops.pallas_composite).  OFF by
# default: with host-split word-plane sources the staged path (stage
# unpack + fused pair warps + combine) measures FASTER on hardware than
# the current kernel, whose per-chunk column gather is VPU-bound.  The
# kernel stays correct (tests force this flag) and is the target for
# further fusion work; flip when it beats the staged path end-to-end.
ENABLE_FUSED_COMPOSITE = False


# Packed-source warp (ops.pallas_packed_warp): v210 decode inside the
# warp window deletes each source's RGBA round trip (~2.1 GB/frame at
# the UHD 4-layer shape).  ON: measured faster than the staged
# unpack + RGBA pair-warp on hardware with distinct buffers.
ENABLE_PACKED_WARP = True

# Packed composite tuning (see ops.pallas_packed_warp
# make_packed_composite_program): PACKED_CCHUNK None = auto-pick the
# widest column chunk the frame divides into (composite_cchunk), or a
# fixed 128/256/384.  PACKED_POLY_GAMMA routes the decode-side
# transfer through the degree-9 Horner polynomial (~3e-7 vs analytic,
# inside the family's ~2^-17 class).  PACKED_SEXTET_SPLIT performs the
# phase split per sextet window, freeing the full-window phase buffer
# for a larger row block.  All default to the measured winners on
# hardware (tools/packed_ablate.py A/B, UHD 4-layer dissolve shape):
#   cchunk=128 poly=0 split=0  9.61 ms   (round-3 shipped config)
#   cchunk=256                10.32      (wider one-hot chunk loses)
#   cchunk=384                 VMEM-infeasible (scoped 16M exceeded)
#   poly=1                     8.19      (analytic pow is 2.85 ms/frame)
#   split=1                    8.82      (rpb 40 -> 48)
#   poly=1 split=1             7.14 ms   <- shipped default
PACKED_CCHUNK: int | None = 128
PACKED_POLY_GAMMA = True
PACKED_SEXTET_SPLIT = True


def _packed_layer_ok(lspec: LayerSpec, spec: ChannelSpec, lparams: dict) -> bool:
    """True when this layer can run the packed-source warp: an
    axis-aligned bucketed DVE over host-split v210 planes at channel
    geometry, as a plain transform or a dissolve pair.  Used by BOTH
    _batch_unpack_slots (to skip the pre-unpack) and _process_layer
    (to dispatch the kernel) so a slot is never unpacked twice."""
    if not (
        ENABLE_PACKED_WARP
        and ENABLE_PALLAS_WARP
        and spec.pallas_stages
        and lspec.has_transform
        and lspec.axis_aligned
        and lspec.warp_bucket >= 0
        and not lspec.deinterlace
        and lspec.src_size is None
        and spec.width % 128 == 0
        and spec.height % 8 == 0
    ):
        return False

    def planes_ok(key, fmt):
        wa = lparams.get(key)
        return fmt == "v210" and wa is not None and wa[0].ndim == 3

    from ..ops.pallas_packed_warp import packed_warp_fits

    if lspec.transition == "dissolve":
        n_mat = 1 if lspec.warp_same_mat else 2
        return (
            planes_ok("src", lspec.src_format)
            and planes_ok("src_b", lspec.src_b_format or lspec.src_format)
            and packed_warp_fits(spec.height, spec.width, lspec.warp_bucket, n_mat)
        )
    if lspec.transition == "none":
        return planes_ok("src", lspec.src_format) and packed_warp_fits(
            spec.height, spec.width, lspec.warp_bucket, 1
        )
    return False


def _pick_warp(lspec: LayerSpec, spec: ChannelSpec):
    if not lspec.axis_aligned:
        if ENABLE_PALLAS_WARP and spec.pallas_stages and lspec.rot_bucket >= 0:
            from ..ops.pallas_rotate import make_rotate_program, rotate_fits

            if rotate_fits(spec.height, spec.width, lspec.rot_bucket):
                return make_rotate_program(
                    spec.height, spec.width, lspec.rot_bucket
                )
        return warp_affine
    if _use_pallas_warp(lspec, spec):
        from ..ops.pallas_warp import make_warp_program

        return make_warp_program(spec.height, spec.width, lspec.warp_bucket)
    return warp_axis_aligned


def _use_pallas_warp(lspec: LayerSpec, spec: ChannelSpec) -> bool:
    from ..ops.pallas_warp import warp_fits

    n_mat = 1 if lspec.warp_same_mat else 2
    return (
        ENABLE_PALLAS_WARP
        and spec.pallas_stages
        and lspec.axis_aligned
        and lspec.warp_bucket >= 0
        and spec.height % 8 == 0
        and spec.width % 128 == 0
        and warp_fits(
            spec.height,
            spec.width,
            lspec.warp_bucket,
            n_mat,
            with_mask=lspec.transition == "wipe",
            # the premix dissolve holds both sources' windows at once
            pair_buf=lspec.transition == "dissolve" and n_mat == 1,
        )
    )


def _with_alpha_one(rgb3: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) -> (4, H, W) with alpha == 1: the fallback for layer
    structures whose warped alpha is not separable (rotation, wipe,
    distinct-matrix dissolves).  A pad, off the 3-channel fast path."""
    return jnp.pad(rgb3, ((0, 1), (0, 0), (0, 0)), constant_values=1.0)


def _process_layer_rgb3(
    lspec: LayerSpec, lparams: dict, spec: ChannelSpec, rgb: jnp.ndarray,
    pre: dict | None, li: int | None,
):
    """3-channel layer fast path for opaque alpha-free rings: warp RGB
    only and carry the separable warp alpha as (wy, wx) vectors
    (pallas_warp.warp_alpha_vectors — exact for axis-aligned warps).
    Returns (rgb (3,H,W), wy (H,), wx (W,)) or None when this layer's
    structure needs a real alpha plane (caller pads alpha=1 and takes
    the 4-channel path)."""
    from ..ops.pallas_warp import warp_alpha_vectors, warp_fits

    h, w = spec.height, spec.width
    if not lspec.has_transform:
        if lspec.transition != "none":
            return None
        return (rgb, jnp.ones((h,), jnp.float32), jnp.ones((w,), jnp.float32))
    if lspec.transition == "dissolve" and not lspec.warp_same_mat:
        # mix of two DIFFERENT warps: alpha is a sum of two outer
        # products, not separable
        return None
    if lspec.transition not in ("none", "dissolve"):
        return None
    if not (
        ENABLE_PALLAS_WARP
        and spec.pallas_stages
        and lspec.axis_aligned
        and lspec.warp_bucket >= 0
        and h % 8 == 0
        and w % 128 == 0
        and warp_fits(
            h, w, lspec.warp_bucket, 1,
            pair_buf=lspec.transition == "dissolve", n_ch=3,
        )
    ):
        return None
    mat = lparams["matrix"]
    wy, wx = warp_alpha_vectors(h, w, mat)
    if lspec.transition == "dissolve":
        from ..ops.pallas_warp import make_warp_pair_program

        fmt_b = lspec.src_b_format or lspec.src_format
        rgb_b = _layer_source(lspec, fmt_b, lparams, "src_b", spec, pre, li)
        if rgb_b.shape[-3] == 4:
            rgb_b = rgb_b[:3]  # opaque contract: alpha == 1
        pair = make_warp_pair_program(h, w, lspec.warp_bucket, True, n_ch=3)
        return (pair(rgb, rgb_b, mat, mat, lparams["mix"]), wy, wx)
    from ..ops.pallas_warp import make_warp_program

    wp = make_warp_program(h, w, lspec.warp_bucket, n_ch=3)
    return (wp(rgb, mat), wy, wx)


def _process_layer(
    lspec: LayerSpec, lparams: dict, spec: ChannelSpec,
    pre: dict | None = None, li: int | None = None,
) -> jnp.ndarray:
    if (pre is None or (li, "src") not in pre) and _packed_layer_ok(
        lspec, spec, lparams
    ):
        # decode + warp (+ dissolve mix) straight from the packed word
        # planes — no RGBA round trip through HBM for this layer
        from ..ops.pallas_packed_warp import (
            make_packed_warp_pair_program,
            make_packed_warp_program,
        )

        mat = lparams["matrix"]
        if lspec.transition == "dissolve":
            pairp = make_packed_warp_pair_program(
                spec.height, spec.width, lspec.warp_bucket,
                lspec.warp_same_mat, spec.col_spec, spec.out_col_spec,
            )
            return pairp(
                lparams["src"][0], lparams["src_b"][0], mat,
                lparams.get("matrix_b", mat), lparams["mix"],
            )
        wp = make_packed_warp_program(
            spec.height, spec.width, lspec.warp_bucket,
            spec.col_spec, spec.out_col_spec,
        )
        return wp(lparams["src"][0], mat)

    rgba = _layer_source(lspec, lspec.src_format, lparams, "src", spec, pre, li)
    if rgba.shape[-3] == 3:
        # opaque alpha-free ring (shape-dispatch on what the runtime
        # ring carries): separable-alpha fast path, else pad alpha=1
        out3 = _process_layer_rgb3(lspec, lparams, spec, rgba, pre, li)
        if out3 is not None:
            return out3
        rgba = _with_alpha_one(rgba)

    if lspec.transition == "dissolve" and lspec.has_transform and _use_pallas_warp(
        lspec, spec
    ):
        # fused pair: warp both dissolve sources + mix in ONE kernel
        from ..ops.pallas_warp import make_warp_pair_program

        fmt_b = lspec.src_b_format or lspec.src_format
        rgba_b = _layer_source(lspec, fmt_b, lparams, "src_b", spec, pre, li)
        if rgba_b.shape[-3] == 3:
            rgba_b = _with_alpha_one(rgba_b)
        pair = make_warp_pair_program(
            spec.height, spec.width, lspec.warp_bucket, lspec.warp_same_mat
        )
        mat = lparams["matrix"]
        return pair(rgba, rgba_b, mat, lparams.get("matrix_b", mat), lparams["mix"])

    if lspec.transition == "wipe" and lspec.has_transform and _use_pallas_warp(
        lspec, spec
    ):
        # fused pair with per-pixel mask: wipe+DVE at dissolve cost
        from ..ops.pallas_warp import make_wipe_pair_program

        fmt_b = lspec.src_b_format or lspec.src_format
        rgba_b = _layer_source(lspec, fmt_b, lparams, "src_b", spec, pre, li)
        if rgba_b.shape[-3] == 3:
            rgba_b = _with_alpha_one(rgba_b)
        if pre is not None and (li, "mask") in pre:
            mask = pre[(li, "mask")]
        else:
            mask = _unpack(lspec.mask_format or lspec.src_format, lparams["mask"], spec)
        pair = make_wipe_pair_program(
            spec.height, spec.width, lspec.warp_bucket, lspec.warp_same_mat
        )
        mat = lparams["matrix"]
        return pair(rgba, rgba_b, mat, lparams.get("matrix_b", mat), mask[0])

    if lspec.has_transform:
        warp = _pick_warp(lspec, spec)
        rgba = warp(rgba, lparams["matrix"])

    if lspec.transition == "none":
        return rgba

    fmt_b = lspec.src_b_format or lspec.src_format
    rgba_b = _layer_source(lspec, fmt_b, lparams, "src_b", spec, pre, li)
    if rgba_b.shape[-3] == 3:
        rgba_b = _with_alpha_one(rgba_b)
    if lspec.has_transform:
        # src_b may carry its own rotation code (different quarter turn)
        lspec_b = (
            lspec._replace(rot_bucket=lspec.rot_bucket_b)
            if lspec.rot_bucket_b >= 0
            else lspec
        )
        warp = _pick_warp(lspec_b, spec)
        rgba_b = warp(rgba_b, lparams.get("matrix_b", lparams["matrix"]))

    if lspec.transition == "dissolve":
        mix = lparams["mix"]
        return rgba * mix + rgba_b * (1.0 - mix)

    # wipe: blend by the mask source's R channel (transition.ts:66-74)
    if pre is not None and (li, "mask") in pre:
        mask = pre[(li, "mask")]
    else:
        mask = _unpack(lspec.mask_format or lspec.src_format, lparams["mask"], spec)
    m = mask[0]
    return rgba_b * m + rgba * (1.0 - m)


def _fused_composite(spec: ChannelSpec, params: dict) -> jnp.ndarray:
    """All layers in ONE Pallas kernel: v210 decode + warp + dissolve +
    over-composite with zero intermediate RGBA materialisation
    (ops.pallas_composite; gated by composite_supported)."""
    from ..ops.pallas_composite import make_composite_program
    from ..ops.pallas_kernels import words_to_planes

    layer_cfg = tuple(
        (2 if ls.transition == "dissolve" else 1, ls.warp_bucket)
        for ls in spec.layers
    )
    prog = make_composite_program(
        spec.height, spec.width, layer_cfg, spec.col_spec, spec.out_col_spec
    )
    def as_planes(wa):
        # host-split (4, H, G) word planes or interleaved (H, G*4) words
        return (
            wa.astype(jnp.uint32)
            if wa.ndim == 3
            else words_to_planes(wa.astype(jnp.uint32))
        )

    srcs, mats, mixes = [], [], []
    for ls, lp in zip(spec.layers, params["layers"]):
        srcs.append(as_planes(lp["src"][0]))
        if ls.transition == "dissolve":
            srcs.append(as_planes(lp["src_b"][0]))
            mixes.append(jnp.asarray(lp["mix"], jnp.float32))
        else:
            mixes.append(jnp.float32(1.0))
        mats.append(lp["matrix"])
    return prog(srcs, jnp.stack(mats), jnp.stack(mixes))


# The all-layers warp+combine launch (pallas_warp.
# make_layers_combine_program).  OFF: measured 13.1 ms vs 12.05 ms for
# the per-layer pair launches at UHD 4-layer — with L matrices the
# persistent column-weight cache (4.4 MB per matrix) no longer fits
# VMEM, so the fused kernel rebuilds one-hot weights per (source,
# chunk, block), ~2x the traffic+launch savings.  Same lesson as
# ENABLE_FUSED_COMPOSITE: launch fusion loses when it forces per-block
# weight rebuilds.  Kernel stays correct + tested for future use.
ENABLE_LAYERS_COMBINE = False


def _layers_combine_ok(spec: ChannelSpec) -> bool:
    """Gate for the all-layers warp+combine launch: every layer must be
    a bucketed axis-aligned DVE that is a cut or a same-matrix dissolve
    at channel geometry (everything else keeps the per-layer path)."""
    if not (
        ENABLE_LAYERS_COMBINE
        and ENABLE_PALLAS_WARP
        and spec.pallas_stages
        and spec.layers
        and spec.width % 128 == 0
        and spec.height % 8 == 0
    ):
        return False
    for ls in spec.layers:
        if ls.transition not in ("none", "dissolve"):
            return False
        if not (ls.has_transform and ls.axis_aligned and ls.warp_bucket >= 0):
            return False
        if ls.deinterlace or ls.src_size is not None:
            return False
        if ls.transition == "dissolve" and not ls.warp_same_mat:
            return False
    from ..ops.pallas_warp import layers_combine_fits

    layer_cfg = tuple(2 if ls.transition == "dissolve" else 1 for ls in spec.layers)
    return layers_combine_fits(
        spec.height, spec.width, max(ls.warp_bucket for ls in spec.layers), layer_cfg
    )



def _batch_unpack_slots(
    spec: ChannelSpec, params: dict, skip: frozenset = frozenset()
) -> dict:
    """Unpack every eligible v210 source slot in ONE kernel launch
    (pallas_kernels.make_v210_unpack_rgba_batch).  The serving shape's
    8 per-source unpack launches carry ~0.2 ms of scheduling overhead
    each; batching collapses them.  Slots stay on the per-layer path
    when deinterlaced, off-geometry, or the batch doesn't fit VMEM;
    ``skip`` holds layer indices the packed composite run consumes raw."""
    if not spec.pallas_stages:
        return {}
    from ..ops.pallas_kernels import (
        batch_unpack_fits,
        make_v210_unpack_rgba_batch,
        words_to_planes,
    )

    slots = []
    for li, (ls, lp) in enumerate(zip(spec.layers, params["layers"])):
        if li in skip:
            continue  # the packed composite run consumes these raw
        if ls.deinterlace or ls.src_size is not None:
            continue
        if _packed_layer_ok(ls, spec, lp):
            continue  # the packed-source warp consumes these slots raw
        cands = [("src", ls.src_format)]
        if ls.transition in ("dissolve", "wipe"):
            cands.append(("src_b", ls.src_b_format or ls.src_format))
        if ls.transition == "wipe":
            cands.append(("mask", ls.mask_format or ls.src_format))
        for key, fmt in cands:
            if fmt == "v210" and key in lp:
                slots.append((li, key))
    if len(slots) < 2 or not batch_unpack_fits(spec.width, spec.height, len(slots)):
        return {}
    fn = make_v210_unpack_rgba_batch(
        spec.width, spec.height, len(slots), spec.col_spec, spec.out_col_spec
    )
    planes_lists = []
    for li, key in slots:
        wa = params["layers"][li][key][0]
        planes_lists.append(
            wa.astype(jnp.uint32)
            if wa.ndim == 3
            else words_to_planes(wa.astype(jnp.uint32))
        )
    rgbas = fn(planes_lists)
    return {slot: rgba for slot, rgba in zip(slots, rgbas)}


# The all-layers packed composite kernel family (pallas_packed_warp.
# make_packed_composite_program).  OFF only for the bench's documented
# staged-fallback measurement; the pipeline ships with it ON.
ENABLE_PACKED_COMPOSITE = True


def _top_alpha_fixup(rgba, spec: "ChannelSpec", params: dict, top_li: int):
    """Restore the reference's channel-alpha contract on an emitted frame.

    The emitted frame's alpha is the TOP layer's alpha (the reference
    zeroes the accumulated alpha every 'over' step: combine.ts:47-59,
    k4 = (k,k,k,0)); the packed composite kernel instead emits its
    run's over-accumulated COVERAGE (1 - prod(1-a_m)) — exactly what
    straggler composition needs to place the run over a layer below it.
    When the run contains the stack top, rebuild the emitted alpha as
    the top layer's separable warp alpha wy x wx (exact: an
    axis-aligned bilinear warp of the constant-1 plane factorises).
    Channel-index where-assembly, not concatenate (fusion-safe)."""
    from ..ops.pallas_warp import warp_alpha_vectors

    mat = jnp.asarray(params["layers"][top_li]["matrix"], jnp.float32)
    wy, wx = warp_alpha_vectors(spec.height, spec.width, mat)
    a = wy[:, None] * wx[None, :]
    ch = jnp.arange(4, dtype=jnp.int32)[:, None, None]
    return jnp.where(ch == 3, a[None], rgba)


def _packed_composite_layer_kind(
    ls: LayerSpec, lp: dict, spec: ChannelSpec
) -> str | None:
    """Per-layer eligibility + source kind for the all-layers packed
    kernel: a bucketed axis-aligned DVE at channel geometry, as a cut
    or same-matrix dissolve, from either host-split v210 word planes
    ('packed': decoded inside the window) or opaque (3, H, W) f32
    frames ('rgb3': deinterlaced fields, non-v210 unpacks — the HD
    interlaced default load's composite shape).  None = staged path."""
    if ls.transition not in ("none", "dissolve"):
        return None
    if not (ls.has_transform and ls.axis_aligned and ls.warp_bucket >= 0):
        return None
    if ls.deinterlace or ls.src_size is not None:
        return None
    if ls.transition == "dissolve" and not ls.warp_same_mat:
        return None

    def kind_of(fmt, wa):
        if fmt == "v210":
            if (
                isinstance(wa, (list, tuple))
                and wa
                and getattr(wa[0], "ndim", 0) == 3
            ):
                return "packed"
            return None
        if fmt == RGBA_F32 and getattr(wa, "shape", None) == (
            3, spec.height, spec.width,
        ):
            return "rgb3"
        return None

    kind = kind_of(ls.src_format, lp.get("src"))
    if kind is None:
        return None
    if ls.transition == "dissolve":
        if kind_of(ls.src_b_format or ls.src_format, lp.get("src_b")) != kind:
            return None
    return kind


def _packed_composite_run(spec: ChannelSpec, params: dict):
    """The packed composite's dispatch plan: (start, end, emit, kind)
    or None.

    Instead of the round-4 all-or-nothing gate (one rotation, wipe,
    distinct-matrix dissolve or non-v210 source silently dropped the
    WHOLE channel to the staged path), the longest CONTIGUOUS run of
    eligible layers (>= 2) of ONE source kind ('packed' v210 word
    planes or 'rgb3' opaque f32 fields) runs in the one-kernel
    composite.  When the run is the whole stack into a v210-only
    output, emit is 'packed' (or 'both' for emit_rgba channels — a
    ROUTE tap no longer evicts the fast path); otherwise the run emits
    its composited RGBA (with over-accumulated alpha) and the staged
    path composites the straggler layers around it — premultiplied
    'over' is associative, so folding a contiguous run into one
    (rgb, alpha) pair is the same composite (~2^-17 rounding-order
    class)."""
    if not (
        ENABLE_PACKED_COMPOSITE
        and ENABLE_PACKED_WARP
        and ENABLE_PALLAS_WARP
        and spec.pallas_stages
        and spec.layers
    ):
        return None
    kinds = [
        _packed_composite_layer_kind(ls, lp, spec)
        for ls, lp in zip(spec.layers, params["layers"])
    ]
    best = None
    i, n = 0, len(kinds)
    while i < n:
        if kinds[i] is None:
            i += 1
            continue
        j = i
        while j < n and kinds[j] == kinds[i]:
            j += 1
        if best is None or (j - i) > (best[1] - best[0]):
            best = (i, j)
        i = j
    if best is None or best[1] - best[0] < 2:
        return None
    start, end = best
    kind = kinds[start]
    if (start, end) == (0, n) and spec.out_format == "v210":
        emit = "both" if spec.emit_rgba else "packed"
    else:
        emit = "rgba"
    from ..ops.pallas_packed_warp import packed_composite_fits

    bucket = max(ls.warp_bucket for ls in spec.layers[start:end])
    if not packed_composite_fits(
        spec.height, spec.width, bucket, end - start, emit=emit, src_kind=kind
    ):
        if emit == "both" and packed_composite_fits(
            spec.height, spec.width, bucket, end - start, emit="rgba",
            src_kind=kind,
        ):
            # the dual-output plan doesn't fit VMEM: emit rgba from the
            # kernel and pack it on the staged tail instead
            return (start, end, "rgba", kind)
        return None
    return (start, end, emit, kind)


def _dispatch_packed_composite(
    spec: ChannelSpec, params: dict, start: int, end: int, emit: str,
    kind: str = "packed",
):
    """Build and invoke the one-kernel composite over layers
    [start, end) with the given emit mode and source kind."""
    from ..ops.pallas_packed_warp import (
        _composite_config,
        _padded_geometry,
        composite_cchunk,
        make_packed_composite_program,
    )

    h, w = spec.height, spec.width
    layers = spec.layers[start:end]
    lparams = params["layers"][start:end]
    layer_cfg = tuple(2 if ls.transition == "dissolve" else 1 for ls in layers)
    bucket = max(ls.warp_bucket for ls in layers)
    cc = PACKED_CCHUNK or composite_cchunk(
        h, w, bucket, len(layers), PACKED_SEXTET_SPLIT, kind
    )
    if (
        _padded_geometry(w)[2] % cc
        or _composite_config(
            h, w, bucket, len(layers), cc, PACKED_SEXTET_SPLIT, emit, kind
        )
        is None
    ):
        # a fixed PACKED_CCHUNK that doesn't divide this frame or fit
        # its VMEM plan falls back to the gate's 128 plan
        # (packed_composite_fits proved that one feasible)
        cc = 128
    progc = make_packed_composite_program(
        h, w, bucket, layer_cfg, spec.col_spec, spec.out_col_spec,
        cchunk=cc,
        poly_gamma=PACKED_POLY_GAMMA,
        sextet_split=PACKED_SEXTET_SPLIT,
        emit=emit,
        src_kind=kind,
    )
    srcs, mats, mixes = [], [], []
    for ls, lp in zip(layers, lparams):
        srcs.append(lp["src"] if kind == "rgb3" else lp["src"][0])
        if ls.transition == "dissolve":
            srcs.append(lp["src_b"] if kind == "rgb3" else lp["src_b"][0])
            mixes.append(jnp.asarray(lp["mix"], jnp.float32))
        else:
            mixes.append(jnp.float32(1.0))
        mats.append(jnp.asarray(lp["matrix"], jnp.float32))
    return progc(srcs, jnp.stack(mats), jnp.stack(mixes))


def _channel_frame(spec: ChannelSpec, params: dict):
    """params = {'layers': [per-layer dicts bottom..top]} -> packed planes
    (and the composited RGBA when spec.emit_rgba)."""
    h, w = spec.height, spec.width
    run = _packed_composite_run(spec, params)
    if run is not None and run[2] in ("packed", "both"):
        # the whole frame in ONE kernel: packed sources -> in-window
        # decode -> premixed warps -> over-composite -> v210 pack.
        # HBM traffic is packed words in + packed words out (+ the
        # composited RGBA when a ROUTE tap needs it).
        from ..ops.pallas_kernels import planes_to_words

        out = _dispatch_packed_composite(
            spec, params, run[0], run[1], run[2], run[3]
        )
        if run[2] == "packed":
            return [planes_to_words(out)]
        planes, rgba = out
        rgba = _top_alpha_fixup(rgba, spec, params, run[1] - 1)
        return {"packed": [planes_to_words(planes)], "rgba": rgba}
    use_fused = False
    if spec.pallas_stages and ENABLE_FUSED_COMPOSITE:
        from ..ops.pallas_composite import composite_supported

        use_fused = composite_supported(spec)
    if use_fused:
        composited = _fused_composite(spec, params)
    elif _layers_combine_ok(spec):
        # ALL layers in one spatial warp+combine launch (pallas_warp.
        # make_layers_combine_program): per-layer pair-warp launches
        # and their intermediate RGBA frames never touch HBM
        from ..ops.pallas_warp import make_layers_combine_program

        layer_cfg = tuple(
            2 if ls.transition == "dissolve" else 1 for ls in spec.layers
        )
        srcs, mats, mixes = [], [], []
        for ls, lp in zip(spec.layers, params["layers"]):
            srcs.append(_unpack(ls.src_format, lp["src"], spec))
            if ls.transition == "dissolve":
                srcs.append(
                    _unpack(ls.src_b_format or ls.src_format, lp["src_b"], spec)
                )
                mixes.append(jnp.asarray(lp["mix"], jnp.float32))
            else:
                mixes.append(jnp.float32(1.0))
            mats.append(jnp.asarray(lp["matrix"], jnp.float32))
        prog_lc = make_layers_combine_program(
            h, w, max(ls.warp_bucket for ls in spec.layers), layer_cfg
        )
        composited = prog_lc(srcs, jnp.stack(mats), jnp.stack(mixes))
        if spec.out_format == "v210" and not spec.emit_rgba:
            from ..ops.pallas_kernels import combine_pack_fits, make_v210_combine_pack

            if combine_pack_fits(w, h, 1):
                # spatial encode+gather pack (no relayout); over(black,
                # composited) with one layer is the identity
                return [
                    make_v210_combine_pack(w, h, 1, spec.out_col_spec)([composited])
                ]
    else:
        run_span = frozenset(range(run[0], run[1])) if run is not None else frozenset()
        pre = _batch_unpack_slots(spec, params, skip=run_span)
        layer_frames = []
        for li, (ls, lp) in enumerate(zip(spec.layers, params["layers"])):
            if li in run_span:
                if li == run[0]:
                    # the eligible run composites in ONE packed kernel
                    # emitting (rgb, over-accumulated alpha); straggler
                    # layers (rotation / wipe / distinct-matrix /
                    # non-v210) composite around it on this staged path
                    layer_frames.append(
                        _dispatch_packed_composite(
                            spec, params, run[0], run[1], "rgba", run[3]
                        )
                    )
                continue
            layer_frames.append(_process_layer(ls, lp, spec, pre, li))
        # 3-channel layers ride as (rgb, wy, wx) separable-alpha tuples
        layer_chs = tuple(3 if isinstance(f, tuple) else 4 for f in layer_frames)
        # fused combine+pack tail: the XLA combine -> pack pair costs
        # two launches and a full RGBA round trip; one kernel does
        # over-accumulate + encode + spatial->phase gather (UHD/8K
        # geometries; emit_rgba channels need the composited frame and
        # keep the staged tail)
        if spec.out_format == "v210" and spec.pallas_stages and not spec.emit_rgba:
            from ..ops.pallas_kernels import combine_pack_fits, make_v210_combine_pack

            if layer_frames and combine_pack_fits(w, h, len(layer_frames)):
                pack_fn = make_v210_combine_pack(
                    w, h, len(layer_frames), spec.out_col_spec,
                    layer_chs=layer_chs,
                )
                return [pack_fn(layer_frames)]
        if 3 in layer_chs and spec.emit_rgba:
            # routes/secondary consumers need a real RGBA frame:
            # reconstruct alpha as the outer product (off the
            # default SDI/file path, which never emits RGBA)
            layer_frames = [
                jnp.concatenate(
                    [f[0], (f[1][:, None] * f[2][None, :])[None]], axis=0
                )
                if isinstance(f, tuple)
                else f
                for f in layer_frames
            ]
            layer_chs = (4,) * len(layer_frames)
        if 3 in layer_chs:
            from ..ops.composite import combine_rgb

            # alpha-free combine: the pack never reads alpha, and the
            # separable alphas fuse into the over chain as broadcasts
            composited = combine_rgb(layer_frames)
        else:
            black = jnp.zeros((4, h, w), dtype=jnp.float32)  # Black generator
            composited = combine([black] + layer_frames)
        if (
            run is not None
            and run[1] == len(spec.layers)
            and composited.shape[0] == 4
            and (spec.emit_rgba or spec.out_format in ("rgba8", "bgra8"))
        ):
            # the run is the stack top: its coverage alpha drove the
            # 'over' correctly, but the EMITTED alpha must be the top
            # layer's (reference combine.ts semantics)
            composited = _top_alpha_fixup(composited, spec, params, run[1] - 1)
    if composited.shape[0] == 3 and not (
        spec.out_format == "v210" and spec.pallas_stages
    ):
        # non-v210 outputs keep their 4-channel pack kernels
        composited = _with_alpha_one(composited)
    if spec.out_format == "v210" and spec.pallas_stages:
        from ..ops.pallas_kernels import make_v210_pack_rgba

        packed = [
            make_v210_pack_rgba(
                w, h, spec.out_col_spec, channels=composited.shape[0]
            )(composited)
        ]
    elif spec.out_format in _PLANAR422 and spec.pallas_stages:
        from ..ops.pallas_kernels import make_planar422_pack_rgba

        packed = make_planar422_pack_rgba(spec.out_format, w, h, spec.out_col_spec)(composited)
    elif spec.out_format in _PLANAR420 and spec.pallas_stages and h % 2 == 0:
        from ..ops.pallas_kernels import make_planar420_pack_rgba

        packed = make_planar420_pack_rgba(spec.out_format, w, h, spec.out_col_spec)(composited)
    else:
        out_fmt = get_format(spec.out_format)
        saver = _saver_cached(spec.out_format, spec.out_col_spec, spec.gamma_mode)
        packed = fio.from_rgba(out_fmt, composited, saver, w, h)
    if spec.emit_rgba:
        return {"packed": packed, "rgba": composited}
    return packed


def _prewarm_coeffs(spec: ChannelSpec) -> None:
    """Materialise every Loader/Saver the spec needs OUTSIDE any trace.

    Coefficient bundles hold jnp constants; creating them lazily inside
    a jit trace would cache tracers (classic leak).  Called by every
    program builder before tracing."""
    for ls in spec.layers:
        for fmt in (ls.src_format, ls.src_b_format, ls.mask_format):
            if fmt is not None and fmt != "rgba_f32":
                _loader(fmt, spec)
    _saver_cached(spec.out_format, spec.out_col_spec, spec.gamma_mode)


def _monolithic_program(spec: ChannelSpec):
    """Adapter putting the fully-fused Pallas v210 kernel behind the same
    params-pytree calling convention as the XLA program, so the runtime
    dispatch is a single make_channel_program call (no per-transition
    branches outside this module)."""
    from ..ops.pallas_kernels import make_fused_v210_program

    ls = spec.layers[-1]
    if ls.transition == "dissolve":
        prog = make_fused_v210_program(
            spec.width, spec.height, spec.col_spec, spec.out_col_spec,
            n_layers=1, transition="dissolve",
        )

        def to_args(params):
            top = params["layers"][-1]
            return ([top["src"][0], top["src_b"][0]],), {"mix": top["mix"]}

    else:
        prog = make_fused_v210_program(
            spec.width, spec.height, spec.col_spec, spec.out_col_spec
        )

        def to_args(params):
            return ([params["layers"][-1]["src"][0]],), {}

    def program(params):
        args, kwargs = to_args(params)
        return [prog(*args, **kwargs)]

    def lower(params):
        args, kwargs = to_args(params)
        return prog.lower(*args, **kwargs)

    # AOT hook so graph.warmup can prewarm this path like any jitted one
    program.lower = lower
    return program


@lru_cache(maxsize=None)
def make_channel_program(spec: ChannelSpec):
    """Compile (lazily, cached) the fused frame program for a channel
    structure.  Returned callable: params pytree -> packed output planes.

    The program cache owns fused-kernel selection: structures the
    monolithic Pallas kernel covers (ops.pallas_kernels.supported_spec)
    get the all-VMEM single-kernel path; everything else gets the jitted
    XLA program (which itself uses Pallas stage kernels when
    spec.pallas_stages)."""
    if spec.pallas_stages:
        from ..ops.pallas_kernels import supported_spec

        if supported_spec(spec):
            return _monolithic_program(spec)

    _prewarm_coeffs(spec)

    @jax.jit
    def program(params):
        return _channel_frame(spec, params)

    return program


# ------------------------- modular stage programs (runtime pipelines) --


@lru_cache(maxsize=None)
def make_unpack_program(
    fmt_name: str, width: int, height: int, col_spec: str, out_col_spec: str,
    gamma_mode: str = "analytic", channels: int = 4,
):
    """Producer-side ToRGBA as its own jitted stage (io.ts:26-114).

    ``channels=3`` emits alpha-free (3, H, W) frames for opaque wire
    formats (alpha would be the constant 1): the deinterlace ring, the
    warp windows and the unpack write itself all drop a quarter of
    their traffic (the 3-channel ring path of the channel program)."""
    fmt = get_format(fmt_name)
    loader = make_loader(fmt.INFO, col_spec, out_col_spec, gamma_mode)

    @jax.jit
    def program(planes):
        if fmt_name == "v210" and planes[0].ndim == 3:
            from ..ops.pallas_kernels import (
                batch_unpack_fits,
                make_v210_unpack_rgba,
                make_v210_unpack_rgba_batch,
                planes_to_words,
            )

            if (
                jax.default_backend() == "tpu"
                and width % 128 == 0
                and height % 8 == 0
            ):
                # host-split word planes straight into the Pallas
                # spatial kernel (0.13 ms vs 0.44 at HD): the XLA path
                # below would pay the planes_to_words relayout AND the
                # gather-heavy XLA decode ('lut' == 'analytic' gamma is
                # bit-equal, tests/test_gamma.py, so analytic is safe)
                if channels == 3 and batch_unpack_fits(width, height, 1):
                    # n_srcs==1 takes the (4, H, G) word-plane array
                    # directly and returns the single (3, H, W) frame
                    return make_v210_unpack_rgba_batch(
                        width, height, 1, col_spec, out_col_spec, channels=3
                    )(planes[0])
                return make_v210_unpack_rgba(
                    width, height, col_spec, out_col_spec
                )(planes[0])
            # host-split word planes reaching the XLA path: restore the
            # interleaved form the format op expects
            planes = [planes_to_words(planes[0])]
        rgba = fio.to_rgba(fmt, planes, loader, width, height)
        # off the Pallas route the 3-channel contract is kept by a
        # slice (alpha is the constant 1 these unpacks emit)
        return rgba[:3] if channels == 3 else rgba

    return program


@lru_cache(maxsize=None)
def make_pack_program(
    fmt_name: str, width: int, height: int, col_spec: str, gamma_mode: str = "analytic"
):
    """Consumer-side FromRGBA as its own jitted stage (io.ts:116-179)."""
    fmt = get_format(fmt_name)
    saver = make_saver(fmt.INFO, col_spec, gamma_mode)

    @jax.jit
    def program(rgba):
        return fio.from_rgba(fmt, rgba, saver, width, height)

    return program


@lru_cache(maxsize=None)
def make_interlaced_pack_program(
    fmt_name: str, width: int, height: int, col_spec: str, gamma_mode: str = "analytic"
):
    """Pack two field-rate RGBA frames into one interlaced packed frame:
    even lines from the top-field frame, odd from the bottom — the
    functional form of the reference consumer's two write passes
    (macadamConsumer.ts:224-244, v210.ts:126-129)."""
    fmt = get_format(fmt_name)
    saver = make_saver(fmt.INFO, col_spec, gamma_mode)

    @jax.jit
    def program(top_rgba, bottom_rgba):
        merged = fio.interleave_rgba_fields(top_rgba, bottom_rgba)
        return fio.from_rgba(fmt, merged, saver, width, height)

    return program


@lru_cache(maxsize=None)
def make_interlaced_word_pack_program(fmt_name: str):
    """Field-pair interlaced output in the PACKED domain, or None.

    When the format has no vertical chroma subsampling (sub_y == 1:
    v210, planar 4:2:2, RGB), every packed row depends only on its own
    image row, so the interlaced wire frame is a row-parity SELECT over
    the two field ticks' already-packed planes — bit-identical to
    interleave_rgba_fields + from_rgba (each field tick's pack IS the
    pack of that tick's RGBA, row by row) with no second encode and no
    RGBA round trip.  Consumers that take this path also stop forcing
    emit_rgba, deleting the channel's RGBA emit for SDI/file outputs.
    The reference writes the two fields' lines into one buffer the same
    way (macadamConsumer.ts:224-244); it just has no packed-domain
    shortcut to express it with.  sub_y > 1 formats (4:2:0: merged-
    frame chroma mixes rows of both fields) return None and keep the
    RGBA path."""
    fmt = get_format(fmt_name)
    if fmt.INFO.sub_y != 1:
        return None

    @jax.jit
    def program(top_planes, bottom_planes):
        outs = []
        for t, b in zip(top_planes, bottom_planes):
            # row-parity where-assembly, not stack/concat (the
            # fusion-breaking hazard documented in ops/composite).
            # Every sub_y==1 format packs planes with image rows as
            # the LEADING dim: v210/planar (H, words|W), rgb (H, W, 4)
            rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            outs.append(jnp.where(rows % 2 == 0, t, b))
        return outs

    return program


@lru_cache(maxsize=None)
def make_yadif_pair_field_program(
    height: int, width: int, tff: bool, channels: int = 4,
    skip_spatial: bool = False,
):
    """Producer-side pair deinterlace: BOTH field ticks of a frame
    period from ONE launch and one ring read (ops.pallas_yadif pair
    kernel — 18 half-plane reads where two single-field launches read
    30, the dominant cost of the reference's default 4x1080i50 load).

    Returns a jitted fn(prev, cur, next_) -> (first, second) in field
    EMISSION order (tff: parity 0 then 1; bff: 1 then 0 — the
    runtime/layer.py parity law).  Each output is bit-identical to the
    in-program yadif ring path at that parity.  Callers gate on
    ops.pallas_yadif.yadif_pair_fits; the channel program then consumes
    the fields as plain progressive RGBA sources
    (ffmpegProducer.ts:557-566 places yadif producer-side the same way)."""
    from ..ops.pallas_yadif import make_yadif_pair_program

    prog = make_yadif_pair_program(
        height, width, tff, skip_spatial, channels=channels
    )

    @jax.jit
    def program(prev, cur, next_):
        o0, o1 = prog(prev, cur, next_)
        return (o0, o1) if tff else (o1, o0)

    return program


@lru_cache(maxsize=None)
def make_yadif_program(tff: bool, skip_spatial: bool):
    """Standalone deinterlace step over a 3-frame ring; dispatches to
    the Pallas kernel on TPU where the geometry fits."""

    @jax.jit
    def program(prev, cur, next_, parity):
        ch = prev.shape[-3]
        h, w = prev.shape[-2:]
        if (
            ENABLE_PALLAS_YADIF
            and jax.default_backend() == "tpu"
            and yadif_ring_fits(h, w, ch)
        ):
            return make_yadif_ring_program(h, w, tff, skip_spatial, channels=ch)(
                prev, cur, next_, parity
            )
        return yadif_frame(prev, cur, next_, parity, tff, skip_spatial)

    return program
