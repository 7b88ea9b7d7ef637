"""Pallas yadif deinterlace kernel — the interlaced default load's hot op.

The XLA formulation (ops.yadif) costs ~0.8 ms per 1080p field on
hardware: its 26 clamp-to-edge taps become pad+slice HLOs whose fusions
re-read the three ring frames several times.  This kernel reads each
ring plane once per row block and computes ONLY the predicted field.

The enabling layout trick: `(4, H, W) -> (4, H/2, 2W)` is a FREE
row-major reshape under which each field of a half-height plane row is
a 128-aligned LANE slice (row 2j at columns [0, W), row 2j+1 at
[W, 2W)).  Because parity is STATIC per compiled kernel (the public
wrapper `lax.cond`s between the two variants, so the channel program's
parity stays a traced scalar), every tap of the predictor addresses a
statically-known field:

- 5 window DMAs per row block pull exactly the planes the predictor
  reads — par-field windows of prev/cur/next (A/B, F/G + keep + alpha,
  K/L taps) and q-field windows of cur and of prev-or-next (C/D/E and
  H/I/J, picked statically by `is_second`) — 17 half-height channel
  planes total, double-buffered so block i+1 streams behind block i;
- every row tap is a STATIC sublane slice of its window at the single
  base 8 (Mosaic rejects dynamic sublane offsets it can't prove
  mod 8): kb is a free multiple of 8 over a ceil grid — the hardware
  drops the last block's out-of-bounds output rows — so every window
  start k0-8 is 8-aligned by construction.  Where hh % 8 != 0 (1080i:
  hh=540) the frame-bottom rows are unreachable by any aligned DMA
  (starts AND lengths must be 8-aligned), so the caller passes 8-row
  zero-padded aux tails built by a ~250 KB XLA slice+pad and the last
  block tops its windows up from those;
- no MXU anywhere: field extraction/interleave is free in this layout
  (the output block writes pred and keep as two static lane slices),
  and column taps are lane rolls (pltpu.roll) with a clamp-to-edge
  select on the 3 frame-edge columns — no gather;
- the only rows whose row taps cross the frame edge (the first and
  last predicted row of the FRAME — window halos elsewhere are real
  neighbour rows) are recomputed exactly with per-tap clamped indices
  under `pl.when` on the first/last block; the one clamped tap that
  lands on the q-plane this kernel never windows (prev's when
  `is_second`, else next's) comes from a dedicated one-row patch DMA.

Tap formulas and their order match ops.yadif/_yadif_full term for term
(yadifCl.ts:34-103); tests assert bit-equality with the XLA path.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "make_yadif_ring_program",
    "yadif_ring_fits",
    "make_yadif_pair_program",
    "yadif_pair_fits",
]

VMEM_BUDGET = 15 * 1024 * 1024  # total incl. the modelled Mosaic stack
STACK_TILES = 24  # live (kb, W) f32 temporaries the predictor peaks at


class _Cfg(NamedTuple):
    kb: int  # predicted rows (half-height plane rows) per block
    dbl: bool  # double-buffered windows (block i+1 streams behind i)


def _search_cfg(hh: int, width: int, planes: int, out_ch: int) -> _Cfg | None:
    """Cheapest feasible (double-buffered?, rows-per-block) plan —
    shared by the single-field and pair kernels (they differ only in
    window-plane count and output channel count).

    kb is any multiple of 8: the grid is ceil(hh/kb) blocks and the
    hardware drops the last block's out-of-bounds output rows, so kb
    need not divide hh — which is what keeps every window start
    (k0 - 8) provably 8-aligned and the tap base a single static 8.
    The Mosaic stack is modelled as STACK_TILES live (kb, W) tiles.
    Cost = halo read amplification, with a 1.3x penalty for
    single-buffered windows (DMA stalls unoverlapped)."""
    best = None
    best_cost = None
    for dbl in (True, False):
        for kb in range(8, hh // 2 + 1, 8):
            win = planes * (kb + 16) * width * 4
            out = 2 * out_ch * kb * 2 * width * 4  # pallas double-buffers out
            stack = STACK_TILES * kb * width * 4
            if (2 if dbl else 1) * win + out + stack > VMEM_BUDGET:
                continue
            cost = (kb + 16) / kb * (1.0 if dbl else 1.3)
            if best_cost is None or cost < best_cost:
                best, best_cost = _Cfg(kb, dbl), cost
    return best


def _config(height: int, width: int, channels: int = 4) -> _Cfg | None:
    """Single-field plan: 17 channel planes of kb+16 rows (cur carries
    `channels` in both fields, prev/next 3 in one field each + one of
    them 3 more in q) — 15 for 3-channel rings (opaque sources carry
    no alpha plane at all)."""
    return _search_cfg(height // 2, width, 2 * channels + 9, channels)


class _DmaConsts(NamedTuple):
    """The three static (start, dst, len) window-DMA variants' constants
    (see _make_kernel's window-plan comment for the alignment argument)."""

    len_first: int
    w0_last: int
    rem: int
    len_bulk: int


def _dma_consts(hh: int, kb: int, n_blocks: int) -> _DmaConsts:
    len_first = min(kb + 8, hh)
    k0_last = (n_blocks - 1) * kb
    w0_last = k0_last - 8
    rem = hh % 8
    assert rem in (0, 4)
    len_bulk = hh - rem - w0_last
    assert 0 < len_bulk <= kb + 16 and len_bulk % 8 == 0 and w0_last % 8 == 0
    return _DmaConsts(len_first, w0_last, rem, len_bulk)


def _window_streamer(
    tensors, auxes, plan, slots, sem, consts: _DmaConsts,
    n_blocks: int, kb: int, W: int, dbl: bool, ch0=None,
):
    """Window-DMA choreography shared by the single-field and pair
    kernels: dispatch each block's static DMA variant (plus the aux-tail
    top-up when hh % 8 != 0), double-buffered when ``dbl``.  ``plan`` is
    the kernel's window list as (buffer, tensor index, n channels,
    field) tuples; ``ch0`` (traced, channel-split kernels) offsets each
    window's channel slice.  Returns stream(i) to call once per grid
    step."""
    len_first, w0_last, rem, len_bulk = consts

    def chs(nch):
        return pl.ds(0 if ch0 is None else ch0, nch)

    def copies(kind, block):
        if kind == "first":
            srow, drow = pl.ds(0, len_first), pl.ds(8, len_first)
        elif kind == "mid":
            w0 = pl.multiple_of(block * kb - 8, 8)
            srow, drow = pl.ds(w0, kb + 16), pl.ds(0, kb + 16)
        else:
            srow, drow = pl.ds(w0_last, len_bulk), pl.ds(0, len_bulk)
        cps = [
            pltpu.make_async_copy(
                tensors[t].at[chs(nch), srow, f * W : (f + 1) * W],
                buf.at[block % slots, :, drow, :],
                sem,
            )
            for buf, t, nch, f in plan
        ]
        if kind == "last" and rem:
            cps += [
                pltpu.make_async_copy(
                    auxes[t].at[chs(nch), pl.ds(0, 8), f * W : (f + 1) * W],
                    buf.at[block % slots, :, pl.ds(len_bulk, 8), :],
                    sem,
                )
                for buf, t, nch, f in plan
            ]
        return cps

    def drive(block, op):
        # dispatch the block's static DMA variant; `block` may be a
        # traced index (the double-buffered prefetch of i+1)
        @pl.when(block == 0)
        def _f():
            for c in copies("first", block):
                op(c)

        if n_blocks > 2:

            @pl.when((block > 0) & (block < n_blocks - 1))
            def _m():
                for c in copies("mid", block):
                    op(c)

        @pl.when(block == n_blocks - 1)
        def _l():
            for c in copies("last", block):
                op(c)

    def stream(i):
        if dbl:

            @pl.when(i == 0)
            def _first():
                drive(0, lambda c: c.start())

            drive(i, lambda c: c.wait())

            @pl.when(i + 1 < n_blocks)
            def _next():
                drive(i + 1, lambda c: c.start())

        else:
            drive(i, lambda c: c.start())
            drive(i, lambda c: c.wait())

    return stream


def yadif_ring_fits(height: int, width: int, channels: int = 4) -> bool:
    return (
        width % 128 == 0
        and height % 8 == 0
        and height >= 32
        and _config(height, width, channels) is not None
    )


def _col_taps(x: jnp.ndarray, width: int):
    """x[..., clamp(col+dx)] for dx in -3..3 — lane rolls with the
    3-column edge fix (CLK_ADDRESS_CLAMP_TO_EDGE, yadifCl.ts:29-32)."""
    cc = jax.lax.broadcasted_iota(jnp.int32, x.shape[-2:], 1)
    taps = []
    for dx in (-3, -2, -1, 0, 1, 2, 3):
        if dx == 0:
            taps.append(x)
        elif dx < 0:
            t = pltpu.roll(x, -dx, axis=x.ndim - 1)
            taps.append(jnp.where(cc < -dx, x[..., :1], t))
        else:
            t = pltpu.roll(x, width - dx, axis=x.ndim - 1)  # == roll by -dx
            taps.append(jnp.where(cc >= width - dx, x[..., width - 1 :], t))
    return taps


def _spatial(cu: jnp.ndarray, cd: jnp.ndarray, width: int) -> jnp.ndarray:
    """Edge-directed spatial interpolation (yadifCl.ts:34-62) on the
    line-above/line-below rows; identical term order to ops.yadif."""
    a, b, c, d, e, f, g = _col_taps(cu, width)
    h, i, j, k, l, m, n = _col_taps(cd, width)

    pred = (d + k) / 2.0
    score = jnp.abs(c - j) + jnp.abs(d - k) + jnp.abs(e - l)

    s1 = jnp.abs(b - k) + jnp.abs(c - l) + jnp.abs(d - m)
    cmp1 = s1 < score
    pred = jnp.where(cmp1, (c + l) / 2.0, pred)
    score = jnp.where(cmp1, s1, score)
    s2 = jnp.abs(a - l) + jnp.abs(b - m) + jnp.abs(c - n)
    s2 = jnp.where(cmp1, s2, s1)
    cmp2 = cmp1 & (s2 < score)
    pred = jnp.where(cmp2, (b + m) / 2.0, pred)
    score = jnp.where(cmp2, s2, score)

    s3 = jnp.abs(d - i) + jnp.abs(e - j) + jnp.abs(f - k)
    cmp3 = s3 < score
    pred = jnp.where(cmp3, (e + j) / 2.0, pred)
    score = jnp.where(cmp3, s3, score)
    s4 = jnp.abs(e - h) + jnp.abs(f - i) + jnp.abs(g - j)
    s4 = jnp.where(cmp3, s4, s3)
    cmp4 = cmp3 & (s4 < score)
    pred = jnp.where(cmp4, (f + i) / 2.0, pred)
    return pred


def _fmax3(a, b, c):
    return jnp.maximum(jnp.maximum(a, b), c)


def _fmin3(a, b, c):
    return jnp.minimum(jnp.minimum(a, b), c)


def _temporal(A, B, C, D, E, F, G, H, I, J, K, L, spatial, skip_spatial):
    """Temporal clamp (yadifCl.ts:72-103); identical term order."""
    p0 = (C + H) / 2.0
    p2 = (D + I) / 2.0
    p4 = (E + J) / 2.0

    tdiff0 = jnp.abs(D - I)
    tdiff1 = (jnp.abs(A - F) + jnp.abs(B - G)) / 2.0
    tdiff2 = (jnp.abs(K - F) + jnp.abs(G - L)) / 2.0
    diff = _fmax3(tdiff0, tdiff1, tdiff2)

    if not skip_spatial:
        p2mp3 = p2 - G
        p2mp1 = p2 - F
        p0mp1 = p0 - F
        p4mp3 = p4 - G
        maxi = _fmax3(p2mp3, p2mp1, jnp.minimum(p0mp1, p4mp3))
        mini = _fmin3(p2mp3, p2mp1, jnp.maximum(p0mp1, p4mp3))
        diff = _fmax3(diff, mini, -maxi)

    pred = jnp.where(spatial > p2 + diff, p2 + diff, spatial)
    pred = jnp.where(pred < p2 - diff, p2 - diff, pred)
    return pred


@lru_cache(maxsize=None)
def _make_kernel(
    height: int,
    width: int,
    par: int,
    tff: bool,
    skip_spatial: bool,
    interpret: bool,
    opaque: bool = False,
    channels: int = 4,
):
    assert channels in (3, 4)
    cfg = _config(height, width, channels)
    assert cfg is not None, "caller gates on yadif_ring_fits"
    kb, dbl = cfg
    hh = height // 2
    n_blocks = -(-hh // kb)  # ceil: the hw drops the last block's OOB rows
    assert n_blocks >= 2
    q = 1 - par  # the predicted field
    is_second = (par ^ int(tff)) == 0  # static (yadifCl.ts:144)
    tC = 1 if is_second else 0
    tH = 2 if is_second else 1
    xq_t = 2 if is_second else 0  # the non-cur tensor with a q window
    miss_t = 0 if is_second else 2  # the tensor with NO q window
    alloc = kb + 16
    slots = 2 if dbl else 1
    W = width
    # opaque sources (every non-RGB unpack emits alpha == 1): skip the
    # alpha channel's windows and write constant 1 — ~1/4 less cur
    # traffic and VMEM for the interlaced default load's v210 sources.
    # channels == 3: the ring frames carry NO alpha plane at all
    # ((3, H, W) in and out) — the 1/4 saving extends to the output
    # write and to every downstream window of the yadif result
    nc = 3 if (opaque or channels == 3) else 4

    # ---- window plan.  Block i needs plane rows [k0-1, k0+kb]
    # (k0 = i*kb).  Because kb % 8 == 0, every interior window can DMA
    # from the 8-aligned start k0-8 into buffer row 0, landing plane
    # row k0 at the SINGLE static base 8; the first block instead lands
    # plane row 0 at destination row 8, and the last block shortens its
    # copy to the frame bottom.  Three static (start, dst, len)
    # variants — no dynamic-alignment games, no body duplication.
    # Mosaic also requires 8-aligned DMA *lengths*: when hh % 8 != 0
    # (1080i: hh=540) no aligned start+length reaches the frame bottom
    # exactly, so the caller passes 8-row AUX TAIL inputs (the last rem
    # rows, zero-padded — an XLA slice+pad of ~250 KB, built outside
    # the kernel) and the last block tops its windows up from those.
    consts = _dma_consts(hh, kb, n_blocks)
    k0_last = (n_blocks - 1) * kb
    rem = consts.rem
    BASE = 8

    # one-row patch of the un-windowed q plane, for the frame-edge fix:
    # q==0 needs miss_t's plane row 0 (top), q==1 its row hh-1 (bottom,
    # which lives in the aux tail when hh is misaligned)
    patch_from_aux = q == 1 and rem > 0
    w0p = 0 if q == 0 else hh - 8 - rem
    patch_idx = 0 if q == 0 else (rem - 1 if patch_from_aux else 7)
    patch_block = 0 if q == 0 else n_blocks - 1

    def kernel(prev_ref, cur_ref, next_ref, aux_p, aux_c, aux_n, out_ref,
               wp_par, wc_par, wn_par, wc_q, wx_q, patch, sem, psem):
        i = pl.program_id(0)
        tensors = (prev_ref, cur_ref, next_ref)
        auxes = (aux_p, aux_c, aux_n)
        # (buffer, tensor, nch, field): the 5 windows of a block
        plan = (
            (wp_par, 0, 3, par),
            (wc_par, 1, nc, par),
            (wn_par, 2, 3, par),
            (wc_q, 1, nc, q),
            (wx_q, xq_t, 3, q),
        )
        _window_streamer(
            tensors, auxes, plan, slots, sem, consts, n_blocks, kb, W, dbl
        )(i)

        @pl.when(i == patch_block)
        def _patch():
            src = (
                auxes[miss_t].at[0:3, pl.ds(0, 8), q * W : (q + 1) * W]
                if patch_from_aux
                else tensors[miss_t].at[
                    0:3, pl.ds(w0p, 8), q * W : (q + 1) * W
                ]
            )
            cp = pltpu.make_async_copy(src, patch.at[:, pl.ds(0, 8), :], psem)
            cp.start()
            cp.wait()

        slot = i % slots
        q_wins = {1: wc_q, xq_t: wx_q}

        def body(base):
            # window row of plane row j (relative to the block's first
            # predicted row): par windows and q windows share the plan
            for ch in range(channels):
                if ch == 3:
                    if opaque:
                        # alpha is the constant-1 plane every non-RGB
                        # unpack emits: write it, never window it
                        out_ref[3, :, :] = jnp.ones((kb, 2 * W), jnp.float32)
                        continue
                    # alpha passes through from cur on every row
                    # (yadifCl.ts:163): both fields, no predictor
                    out_ref[3, :, q * W : (q + 1) * W] = wc_q[
                        slot, 3, base : base + kb, :
                    ]
                    out_ref[3, :, par * W : (par + 1) * W] = wc_par[
                        slot, 3, base : base + kb, :
                    ]
                    continue

                def par_tap(buf, d, ch=ch):
                    # global row (2k+q)+d for d=+-1 -> par plane row
                    # k+q-1 (up) / k+q (down)
                    r = base + q - 1 + (d + 1) // 2
                    return buf[slot, ch, r : r + kb, :]

                def q_tap(t, d, ch=ch):
                    # global row (2k+q)+2d -> q plane row k+d
                    r = base + d
                    return q_wins[t][slot, ch, r : r + kb, :]

                cu, cd = par_tap(wc_par, -1), par_tap(wc_par, 1)
                spatial = _spatial(cu, cd, W)
                pred = _temporal(
                    par_tap(wp_par, -1), par_tap(wp_par, 1),
                    q_tap(tC, -1), q_tap(tC, 0), q_tap(tC, 1),
                    cu, cd,
                    q_tap(tH, -1), q_tap(tH, 0), q_tap(tH, 1),
                    par_tap(wn_par, -1), par_tap(wn_par, 1),
                    spatial, skip_spatial,
                )
                out_ref[ch, :, q * W : (q + 1) * W] = pred
                out_ref[ch, :, par * W : (par + 1) * W] = wc_par[
                    slot, ch, base : base + kb, :
                ]

        body(BASE)

        # ---- frame-edge rows: the ONE predicted row per frame edge
        # whose row taps clamp (y=q at the top, y=H-2+q at the bottom).
        # Window halos elsewhere hold real neighbour rows, so every
        # other row is already exact.  k0 of both edge blocks is
        # static, so these taps are fully static.
        def fix_row(k_local, k0, eb):
            y = 2 * (k0 + k_local) + q

            def ctap(t, ch, d):
                g = min(max(y + d, 0), height - 1)
                f, j = g % 2, g // 2
                r = eb + (j - k0)
                if f == par:
                    buf = (wp_par, wc_par, wn_par)[t]
                    return buf[slot, ch, r : r + 1, :]
                if t == 1 or t == xq_t:
                    return q_wins[t][slot, ch, r : r + 1, :]
                assert t == miss_t and j == (hh - 1 if q else 0)
                return patch[ch, patch_idx : patch_idx + 1, :]

            for ch in range(3):
                ccu, ccd = ctap(1, ch, -1), ctap(1, ch, 1)
                sp = _spatial(ccu, ccd, W)
                pr = _temporal(
                    ctap(0, ch, -1), ctap(0, ch, 1),
                    ctap(tC, ch, -2), ctap(tC, ch, 0), ctap(tC, ch, 2),
                    ccu, ccd,
                    ctap(tH, ch, -2), ctap(tH, ch, 0), ctap(tH, ch, 2),
                    ctap(2, ch, -1), ctap(2, ch, 1),
                    sp, skip_spatial,
                )
                out_ref[ch, k_local : k_local + 1, q * W : (q + 1) * W] = pr

        @pl.when(i == 0)
        def _top():
            fix_row(0, 0, BASE)

        @pl.when(i == n_blocks - 1)
        def _bottom():
            fix_row(hh - 1 - k0_last, k0_last, BASE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(6)],
        out_specs=pl.BlockSpec(
            (channels, kb, 2 * W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((slots, 3, alloc, W), jnp.float32),
            pltpu.VMEM((slots, nc, alloc, W), jnp.float32),
            pltpu.VMEM((slots, 3, alloc, W), jnp.float32),
            pltpu.VMEM((slots, nc, alloc, W), jnp.float32),
            pltpu.VMEM((slots, 3, alloc, W), jnp.float32),
            pltpu.VMEM((3, 8, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((channels, hh, 2 * W), jnp.float32),
        interpret=interpret,
    )

    def run(prev, cur, next_):
        planes = [x.reshape(channels, hh, 2 * W) for x in (prev, cur, next_)]
        if rem:
            auxes = [
                jnp.pad(x[:, hh - rem :, :], ((0, 0), (0, 8 - rem), (0, 0)))
                for x in planes
            ]
        else:
            auxes = [x[:, hh - 8 :, :] for x in planes]
        out = call(*planes, *auxes)
        return out.reshape(channels, height, W)

    return run


@lru_cache(maxsize=None)
def make_yadif_ring_program(
    height: int,
    width: int,
    tff: bool,
    skip_spatial: bool = False,
    interpret: bool | None = None,
    opaque: bool = False,
    channels: int = 4,
):
    """fn(prev, cur, next_ (C,H,W) f32, parity traced int32) -> (C,H,W).

    Drop-in for ops.yadif.yadif_frame on geometries where
    yadif_ring_fits; parity stays traced via a two-way lax.cond over
    the static-parity kernels.  ``opaque`` asserts the ring's alpha is
    the constant 1 every non-RGB unpack produces — the kernel then
    writes 1 instead of windowing cur's alpha (bit-identical on such
    rings, ~1/4 less cur traffic).  ``channels=3`` takes that further:
    the ring frames carry no alpha plane at all ((3, H, W) in/out,
    bit-identical to the 4-channel result's RGB planes), dropping the
    alpha write and every downstream window of the result by 1/4."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    k0 = _make_kernel(
        height, width, 0, tff, skip_spatial, interpret, opaque, channels
    )
    k1 = _make_kernel(
        height, width, 1, tff, skip_spatial, interpret, opaque, channels
    )

    def program(prev, cur, next_, parity):
        parity = jnp.asarray(parity, dtype=jnp.int32)
        return jax.lax.cond(parity == 0, k0, k1, prev, cur, next_)

    return program


# ---------------------------------------------------------------------------
# Two-field pair kernel: both field ticks of a frame period from ONE
# ring read.  Interlaced sources emit two output fields per incoming
# frame (yadifCl.ts send_field cadence; ffmpegProducer.ts:557-566) and
# both predictions read the SAME three ring frames — only the parity
# wiring differs.  The union of the two single-field kernels' windows
# is exactly all six (tensor, field) half-planes, so one window plan
# serves both predictors: 18 half-plane reads per pair of fields where
# two single-field launches read 30 (3-channel rings), the one-row
# patch DMA disappears (every tap plane is windowed), and one launch
# replaces two.  Outputs are bit-identical to make_yadif_ring_program
# at parity 0 and 1.
# ---------------------------------------------------------------------------


def _pair_config(height: int, width: int, channels: int = 4) -> _Cfg | None:
    """Same cost model as _config for the six-window pair plan:
    prev/next carry 3 channels per field, cur carries `channels` per
    field; two double-buffered outputs."""
    return _search_cfg(
        height // 2, width, 4 * 3 + 2 * channels, 2 * channels
    )


def _split_config(height: int, width: int) -> _Cfg | None:
    """Channel-split pair plan (3-channel rings): each grid step windows
    ONE channel's six half-planes (6 planes) and writes that channel of
    both outputs (2 block-channels).  A third of the joint plan's window
    VMEM buys a larger row block: at 1080i the joint plan is stuck at
    kb=16 (2.0x halo read amplification) while the split plan reaches
    kb=40 (1.4x) — the pair stage is the default load's dominant cost,
    so the halo IS the lever."""
    return _search_cfg(height // 2, width, 6, 2)


def yadif_pair_fits(height: int, width: int, channels: int = 4) -> bool:
    return (
        width % 128 == 0
        and height % 8 == 0
        and height >= 32
        and _pair_config(height, width, channels) is not None
    )


@lru_cache(maxsize=None)
def _make_pair_kernel(
    height: int,
    width: int,
    tff: bool,
    skip_spatial: bool,
    interpret: bool,
    opaque: bool = False,
    channels: int = 4,
):
    assert channels in (3, 4)
    cfg = _pair_config(height, width, channels)
    assert cfg is not None, "caller gates on yadif_pair_fits"
    kb, dbl = cfg
    hh = height // 2
    n_blocks = -(-hh // kb)
    assert n_blocks >= 2
    alloc = kb + 16
    slots = 2 if dbl else 1
    W = width
    nc = 3 if (opaque or channels == 3) else 4
    # window plan constants: identical three static DMA variants as the
    # single-field kernel (see its header for the alignment argument)
    consts = _dma_consts(hh, kb, n_blocks)
    k0_last = (n_blocks - 1) * kb
    rem = consts.rem
    BASE = 8

    def kernel(prev_ref, cur_ref, next_ref, aux_p, aux_c, aux_n,
               out0_ref, out1_ref, wp0, wp1, wc0, wc1, wn0, wn1, sem):
        i = pl.program_id(0)
        tensors = (prev_ref, cur_ref, next_ref)
        auxes = (aux_p, aux_c, aux_n)
        wins = ((wp0, wp1), (wc0, wc1), (wn0, wn1))
        plan = (
            (wp0, 0, 3, 0), (wp1, 0, 3, 1),
            (wc0, 1, nc, 0), (wc1, 1, nc, 1),
            (wn0, 2, 3, 0), (wn1, 2, 3, 1),
        )
        _window_streamer(
            tensors, auxes, plan, slots, sem, consts, n_blocks, kb, W, dbl
        )(i)

        slot = i % slots

        def body(p):
            # parity-p field tick: predict field q = 1-p, keep field p
            q = 1 - p
            is_second = (p ^ int(tff)) == 0
            tC = 1 if is_second else 0
            tH = 2 if is_second else 1
            out_ref = (out0_ref, out1_ref)[p]
            wp_par, wc_par, wn_par = wins[0][p], wins[1][p], wins[2][p]
            for ch in range(channels):
                if ch == 3:
                    if opaque:
                        out_ref[3, :, :] = jnp.ones((kb, 2 * W), jnp.float32)
                        continue
                    out_ref[3, :, q * W : (q + 1) * W] = wins[1][q][
                        slot, 3, BASE : BASE + kb, :
                    ]
                    out_ref[3, :, p * W : (p + 1) * W] = wc_par[
                        slot, 3, BASE : BASE + kb, :
                    ]
                    continue

                def par_tap(buf, d, ch=ch, q=q):
                    r = BASE + q - 1 + (d + 1) // 2
                    return buf[slot, ch, r : r + kb, :]

                def q_tap(t, d, ch=ch, q=q):
                    r = BASE + d
                    return wins[t][q][slot, ch, r : r + kb, :]

                cu, cd = par_tap(wc_par, -1), par_tap(wc_par, 1)
                spatial = _spatial(cu, cd, W)
                pred = _temporal(
                    par_tap(wp_par, -1), par_tap(wp_par, 1),
                    q_tap(tC, -1), q_tap(tC, 0), q_tap(tC, 1),
                    cu, cd,
                    q_tap(tH, -1), q_tap(tH, 0), q_tap(tH, 1),
                    par_tap(wn_par, -1), par_tap(wn_par, 1),
                    spatial, skip_spatial,
                )
                out_ref[ch, :, q * W : (q + 1) * W] = pred
                out_ref[ch, :, p * W : (p + 1) * W] = wc_par[
                    slot, ch, BASE : BASE + kb, :
                ]

        body(0)
        body(1)

        def fix_row(p, k_local, k0):
            # the one predicted row per frame edge whose row taps clamp;
            # every tap plane is windowed here, so no patch DMA
            q = 1 - p
            is_second = (p ^ int(tff)) == 0
            tC = 1 if is_second else 0
            tH = 2 if is_second else 1
            out_ref = (out0_ref, out1_ref)[p]
            y = 2 * (k0 + k_local) + q

            def ctap(t, ch, d):
                g = min(max(y + d, 0), height - 1)
                f, j = g % 2, g // 2
                r = BASE + (j - k0)
                return wins[t][f][slot, ch, r : r + 1, :]

            for ch in range(3):
                ccu, ccd = ctap(1, ch, -1), ctap(1, ch, 1)
                sp = _spatial(ccu, ccd, W)
                pr = _temporal(
                    ctap(0, ch, -1), ctap(0, ch, 1),
                    ctap(tC, ch, -2), ctap(tC, ch, 0), ctap(tC, ch, 2),
                    ccu, ccd,
                    ctap(tH, ch, -2), ctap(tH, ch, 0), ctap(tH, ch, 2),
                    ctap(2, ch, -1), ctap(2, ch, 1),
                    sp, skip_spatial,
                )
                out_ref[ch, k_local : k_local + 1, q * W : (q + 1) * W] = pr

        @pl.when(i == 0)
        def _top():
            fix_row(0, 0, 0)
            fix_row(1, 0, 0)

        @pl.when(i == n_blocks - 1)
        def _bottom():
            fix_row(0, hh - 1 - k0_last, k0_last)
            fix_row(1, hh - 1 - k0_last, k0_last)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(6)],
        out_specs=[
            pl.BlockSpec(
                (channels, kb, 2 * W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (channels, kb, 2 * W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((slots, 3, alloc, W), jnp.float32),
            pltpu.VMEM((slots, 3, alloc, W), jnp.float32),
            pltpu.VMEM((slots, nc, alloc, W), jnp.float32),
            pltpu.VMEM((slots, nc, alloc, W), jnp.float32),
            pltpu.VMEM((slots, 3, alloc, W), jnp.float32),
            pltpu.VMEM((slots, 3, alloc, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((channels, hh, 2 * W), jnp.float32),
            jax.ShapeDtypeStruct((channels, hh, 2 * W), jnp.float32),
        ],
        interpret=interpret,
    )

    def run(prev, cur, next_):
        planes = [x.reshape(channels, hh, 2 * W) for x in (prev, cur, next_)]
        if rem:
            auxes = [
                jnp.pad(x[:, hh - rem :, :], ((0, 0), (0, 8 - rem), (0, 0)))
                for x in planes
            ]
        else:
            auxes = [x[:, hh - 8 :, :] for x in planes]
        o0, o1 = call(*planes, *auxes)
        return (
            o0.reshape(channels, height, W),
            o1.reshape(channels, height, W),
        )

    return run


@lru_cache(maxsize=None)
def _make_pair_split_kernel(
    height: int,
    width: int,
    tff: bool,
    skip_spatial: bool,
    interpret: bool,
):
    """Channel-split pair kernel (3-channel rings only): grid
    (3, n_blocks), each step predicting one RGB channel of both field
    ticks from six SINGLE-channel windows.  Bit-identical to the joint
    pair kernel — the predictor never mixes channels, so splitting the
    grid by channel changes scheduling only.  See _split_config for why:
    a third of the window VMEM buys kb 16 -> 40 at 1080i (halo read
    amplification 2.0x -> 1.4x on the load's dominant stage)."""
    cfg = _split_config(height, width)
    assert cfg is not None, "caller gates on yadif_pair_fits"
    kb, dbl = cfg
    hh = height // 2
    n_blocks = -(-hh // kb)
    assert n_blocks >= 2
    alloc = kb + 16
    slots = 2 if dbl else 1
    W = width
    consts = _dma_consts(hh, kb, n_blocks)
    k0_last = (n_blocks - 1) * kb
    rem = consts.rem
    BASE = 8

    def kernel(prev_ref, cur_ref, next_ref, aux_p, aux_c, aux_n,
               out0_ref, out1_ref, wp0, wp1, wc0, wc1, wn0, wn1, sem):
        c = pl.program_id(0)
        i = pl.program_id(1)
        tensors = (prev_ref, cur_ref, next_ref)
        auxes = (aux_p, aux_c, aux_n)
        wins = ((wp0, wp1), (wc0, wc1), (wn0, wn1))
        plan = (
            (wp0, 0, 1, 0), (wp1, 0, 1, 1),
            (wc0, 1, 1, 0), (wc1, 1, 1, 1),
            (wn0, 2, 1, 0), (wn1, 2, 1, 1),
        )
        _window_streamer(
            tensors, auxes, plan, slots, sem, consts, n_blocks, kb, W, dbl,
            ch0=c,
        )(i)

        slot = i % slots

        def body(p):
            q = 1 - p
            is_second = (p ^ int(tff)) == 0
            tC = 1 if is_second else 0
            tH = 2 if is_second else 1
            out_ref = (out0_ref, out1_ref)[p]
            wp_par, wc_par, wn_par = wins[0][p], wins[1][p], wins[2][p]

            def par_tap(buf, d, q=q):
                r = BASE + q - 1 + (d + 1) // 2
                return buf[slot, 0, r : r + kb, :]

            def q_tap(t, d, q=q):
                r = BASE + d
                return wins[t][q][slot, 0, r : r + kb, :]

            cu, cd = par_tap(wc_par, -1), par_tap(wc_par, 1)
            spatial = _spatial(cu, cd, W)
            pred = _temporal(
                par_tap(wp_par, -1), par_tap(wp_par, 1),
                q_tap(tC, -1), q_tap(tC, 0), q_tap(tC, 1),
                cu, cd,
                q_tap(tH, -1), q_tap(tH, 0), q_tap(tH, 1),
                par_tap(wn_par, -1), par_tap(wn_par, 1),
                spatial, skip_spatial,
            )
            out_ref[0, :, q * W : (q + 1) * W] = pred
            out_ref[0, :, p * W : (p + 1) * W] = wc_par[
                slot, 0, BASE : BASE + kb, :
            ]

        body(0)
        body(1)

        def fix_row(p, k_local, k0):
            # the one predicted row per frame edge whose row taps clamp;
            # every (tensor, field) plane is windowed, so no patch DMA
            q = 1 - p
            is_second = (p ^ int(tff)) == 0
            tC = 1 if is_second else 0
            tH = 2 if is_second else 1
            out_ref = (out0_ref, out1_ref)[p]
            y = 2 * (k0 + k_local) + q

            def ctap(t, d):
                g = min(max(y + d, 0), height - 1)
                f, j = g % 2, g // 2
                r = BASE + (j - k0)
                return wins[t][f][slot, 0, r : r + 1, :]

            ccu, ccd = ctap(1, -1), ctap(1, 1)
            sp = _spatial(ccu, ccd, W)
            pr = _temporal(
                ctap(0, -1), ctap(0, 1),
                ctap(tC, -2), ctap(tC, 0), ctap(tC, 2),
                ccu, ccd,
                ctap(tH, -2), ctap(tH, 0), ctap(tH, 2),
                ctap(2, -1), ctap(2, 1),
                sp, skip_spatial,
            )
            out_ref[0, k_local : k_local + 1, q * W : (q + 1) * W] = pr

        @pl.when(i == 0)
        def _top():
            fix_row(0, 0, 0)
            fix_row(1, 0, 0)

        @pl.when(i == n_blocks - 1)
        def _bottom():
            fix_row(0, hh - 1 - k0_last, k0_last)
            fix_row(1, hh - 1 - k0_last, k0_last)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(3, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(6)],
        out_specs=[
            pl.BlockSpec(
                (1, kb, 2 * W), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kb, 2 * W), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((slots, 1, alloc, W), jnp.float32) for _ in range(6)
        ]
        + [pltpu.SemaphoreType.DMA],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, hh, 2 * W), jnp.float32),
            jax.ShapeDtypeStruct((3, hh, 2 * W), jnp.float32),
        ],
        interpret=interpret,
    )

    def run(prev, cur, next_):
        planes = [x.reshape(3, hh, 2 * W) for x in (prev, cur, next_)]
        if rem:
            auxes = [
                jnp.pad(x[:, hh - rem :, :], ((0, 0), (0, 8 - rem), (0, 0)))
                for x in planes
            ]
        else:
            auxes = [x[:, hh - 8 :, :] for x in planes]
        o0, o1 = call(*planes, *auxes)
        return (
            o0.reshape(3, height, W),
            o1.reshape(3, height, W),
        )

    return run


@lru_cache(maxsize=None)
def make_yadif_pair_program(
    height: int,
    width: int,
    tff: bool,
    skip_spatial: bool = False,
    interpret: bool | None = None,
    opaque: bool = False,
    channels: int = 4,
    channel_split: bool = False,
):
    """fn(prev, cur, next_ (C,H,W) f32) -> (out_parity0, out_parity1).

    Both outputs are bit-identical to make_yadif_ring_program at
    parity 0 / 1 on the same ring; one launch and one ring read serve
    both field ticks of the frame period (the yadifCl.ts send_field
    cadence).  Callers order the pair by tff: the FIRST emitted field's
    parity is 0 when tff else 1 (runtime/layer.py parity law).

    ``channel_split`` dispatches the channel-split grid variant
    (bit-identical, tests assert it).  Kept OFF: despite cutting the
    window halo read amplification 2.0x -> 1.4x at 1080i (kb 16 -> 40),
    it measured SLOWER on hardware — 0.477 vs 0.444 ms/pair in an
    8-launch chain step — so the kernel is not read-bandwidth-bound
    and the 3x finer grid/DMA granularity costs more than the halo
    saves.  Measured 2026-08-20, v5e via tunnel."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if (
        channel_split
        and channels == 3
        and _split_config(height, width) is not None
    ):
        return _make_pair_split_kernel(
            height, width, tff, skip_spatial, interpret
        )
    return _make_pair_kernel(
        height, width, tff, skip_spatial, interpret, opaque, channels
    )
