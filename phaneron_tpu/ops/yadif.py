"""Yadif deinterlacer — spatial + temporal field interpolation.

Port of the algorithm the reference uses (src/process/yadifCl.ts, which
itself follows FFmpeg's yadif_cuda): for every missing-field pixel, a
spatial predictor searches ±3px edge directions across the adjacent
lines, then a temporal predictor clamps it against prev/cur/next frame
statistics.  Operates on (4, H, W) linear RGBA frames; `parity` is a
traced scalar so field alternation never recompiles.

Two formulations share the exact tap formulas (yadifCl.ts:34-100):

- `_yadif_full`: the straightforward full-frame one — every pixel
  computed, keep-rows selected at the end.  Used directly for small
  frames and for the 8-row edge strips of the fast path.
- `_yadif_half`: the production path.  The frame reshapes to
  (4, H/2, 2, W) field planes — a row-major-dim split, no lane
  relayout — and the predictor runs ONLY on the missing field's rows
  with a STATIC parity, so every `y±1 / y±2` tap is a static
  plane-select plus a ±1 shift along the half-height axis.  Half the
  predictor arithmetic and none of the full path's traced
  `where(is_second, cur, prev)` double-reads.  Frame-edge rows (where
  clamp-to-edge crosses field planes) come from `_yadif_full` strips,
  so the result is bit-identical to the full formulation.

The public `yadif_frame` keeps `parity` traced by `lax.cond`-ing
between the two static-parity halves.

The 3-frame sliding-window driver (send_frame / send_field modes,
yadif.ts:115-145) lives in runtime.yadif_driver; this module is the
pure per-frame math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["yadif_frame"]


def _shift(img: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """out[..., y, x] = img[..., clamp(y+dy), clamp(x+dx)] — the kernel's
    CLK_ADDRESS_CLAMP_TO_EDGE sampling (yadifCl.ts:29-32)."""
    h, w = img.shape[-2], img.shape[-1]
    if dy:
        img = jnp.pad(
            img, ((0, 0), (max(-dy, 0), max(dy, 0)), (0, 0)), mode="edge"
        )
        img = img[:, max(dy, 0) : max(dy, 0) + h, :]
    if dx:
        img = jnp.pad(
            img, ((0, 0), (0, 0), (max(-dx, 0), max(dx, 0))), mode="edge"
        )
        img = img[:, :, max(dx, 0) : max(dx, 0) + w]
    return img


def _spatial_from_taps(a, b, c, d, e, f, g, h, i, j, k, l, m, n):
    """Edge-directed spatial interpolation (yadifCl.ts:34-62); a..g are
    the line-above taps at x-3..x+3, h..n the line below."""
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


def _temporal_clamp(A, B, C, D, E, F, G, H, I, J, K, L, spatial, skip_spatial):
    """Temporal predictor clamp (yadifCl.ts:72-103)."""
    p0 = (C + H) / 2.0
    p1 = F
    p2 = (D + I) / 2.0
    p3 = G
    p4 = (E + J) / 2.0

    tdiff0 = jnp.abs(D - I)
    tdiff1 = (jnp.abs(A - F) + jnp.abs(B - G)) / 2.0
    tdiff2 = (jnp.abs(K - F) + jnp.abs(G - L)) / 2.0
    diff = _fmax3(tdiff0, tdiff1, tdiff2)

    if not skip_spatial:
        p2mp3 = p2 - p3
        p2mp1 = p2 - p1
        p0mp1 = p0 - p1
        p4mp3 = p4 - p3
        maxi = _fmax3(p2mp3, p2mp1, jnp.minimum(p0mp1, p4mp3))
        mini = _fmin3(p2mp3, p2mp1, jnp.maximum(p0mp1, p4mp3))
        diff = _fmax3(diff, mini, -maxi)

    pred = jnp.where(spatial > p2 + diff, p2 + diff, spatial)
    pred = jnp.where(pred < p2 - diff, p2 - diff, pred)
    return pred


def _yadif_full(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    next_: jnp.ndarray,
    parity,
    tff: bool,
    skip_spatial: bool = False,
) -> jnp.ndarray:
    """One yadif pass over a full frame (yadifCl.ts:105-167).

    Rows of the primary field pass through; the other field's rows get
    the spatial prediction clamped by the temporal predictor."""
    parity = jnp.asarray(parity, dtype=jnp.int32)
    is_second = (parity ^ int(tff)) == 0  # traced bool (yadifCl.ts:144)

    s = lambda dx, dy: _shift(cur, dx, dy)
    spatial = _spatial_from_taps(
        *(s(dx, -1) for dx in (-3, -2, -1, 0, 1, 2, 3)),
        *(s(dx, 1) for dx in (-3, -2, -1, 0, 1, 2, 3)),
    )

    sv = lambda img, dy: _shift(img, 0, dy)
    A = sv(prev, -1)
    B = sv(prev, 1)
    C = jnp.where(is_second, sv(cur, -2), sv(prev, -2))
    D = jnp.where(is_second, cur, prev)
    E = jnp.where(is_second, sv(cur, 2), sv(prev, 2))
    F = sv(cur, -1)
    G = sv(cur, 1)
    H = jnp.where(is_second, sv(next_, -2), sv(cur, -2))
    I = jnp.where(is_second, next_, cur)
    J = jnp.where(is_second, sv(next_, 2), sv(cur, 2))
    K = sv(next_, -1)
    L = sv(next_, 1)

    pred = _temporal_clamp(A, B, C, D, E, F, G, H, I, J, K, L, spatial, skip_spatial)
    if cur.shape[0] == 4:
        # Alpha passes through from cur (yadifCl.ts:163-164)
        pred = pred.at[3].set(cur[3])
    # 3-channel frames (opaque alpha-free rings) have no alpha to carry

    rows = jnp.arange(cur.shape[-2], dtype=jnp.int32)[None, :, None]
    keep = (rows % 2) == parity
    return jnp.where(keep, cur, pred)


_STRIP = 8  # edge-strip rows: covers every tap (±3) of the 2 edge rows


def _yadif_half(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    next_: jnp.ndarray,
    par: int,
    tff: bool,
    skip_spatial: bool,
) -> jnp.ndarray:
    """Static-parity fast path: predictor math on the missing field's
    (4, H/2, W) rows only.  Interior-exact by construction (every tap of
    an interior row is in range, so the in-plane edge clamps never
    fire); the first/last row pair — where frame-edge clamping crosses
    field planes — is replaced by `_yadif_full` strips."""
    nc, h, w = cur.shape
    kh = h // 2
    q = 1 - par  # the missing (predicted) field's plane index
    is_second = (par ^ int(tff)) == 0  # static here (yadifCl.ts:144)

    p4 = prev.reshape(nc, kh, 2, w)
    c4 = cur.reshape(nc, kh, 2, w)
    n4 = next_.reshape(nc, kh, 2, w)
    cp, cq = c4[:, :, par, :], c4[:, :, q, :]
    pp, pq = p4[:, :, par, :], p4[:, :, q, :]
    xp, xq = n4[:, :, par, :], n4[:, :, q, :]

    def sk(a: jnp.ndarray, d: int) -> jnp.ndarray:
        # out[k] = a[clamp(k+d)] along the half-height axis
        if d == 0:
            return a
        a = jnp.pad(a, ((0, 0), (max(-d, 0), max(d, 0)), (0, 0)), mode="edge")
        return a[:, max(d, 0) : max(d, 0) + kh, :]

    # frame rows y∓1 of a predicted row y = 2k+q live in the kept plane
    # at k-offsets: q=0 -> (k-1, k); q=1 -> (k, k+1)
    du, dd = (-1, 0) if q == 0 else (0, 1)
    up1 = lambda plane: sk(plane, du)
    dn1 = lambda plane: sk(plane, dd)

    cu, cd = up1(cp), dn1(cp)  # cur[y-1], cur[y+1]
    sx = lambda img, dx: _shift(img, dx, 0)
    spatial = _spatial_from_taps(
        *(sx(cu, dx) for dx in (-3, -2, -1, 0, 1, 2, 3)),
        *(sx(cd, dx) for dx in (-3, -2, -1, 0, 1, 2, 3)),
    )

    A, B = up1(pp), dn1(pp)
    if is_second:
        C, D, E = sk(cq, -1), cq, sk(cq, 1)  # y±2 stay in the q plane
        H, I, J = sk(xq, -1), xq, sk(xq, 1)
    else:
        C, D, E = sk(pq, -1), pq, sk(pq, 1)
        H, I, J = sk(cq, -1), cq, sk(cq, 1)
    F, G = cu, cd
    K, L = up1(xp), dn1(xp)

    pred = _temporal_clamp(A, B, C, D, E, F, G, H, I, J, K, L, spatial, skip_spatial)
    if nc == 4:
        pred = pred.at[3].set(cq[3])  # alpha from cur (yadifCl.ts:163-164)

    # assemble: kept plane from cur, predicted plane from pred — a
    # broadcast channel-index select, never a stack/concat (fusion rule)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2, 1), 2)
    out = jnp.where(jj == par, c4, pred[:, :, None, :])

    # frame-edge row pairs via the full formulation on 8-row strips
    top = _yadif_full(
        prev[:, :_STRIP], cur[:, :_STRIP], next_[:, :_STRIP], par, tff, skip_spatial
    )[:, :2]
    bot = _yadif_full(
        prev[:, h - _STRIP :], cur[:, h - _STRIP :], next_[:, h - _STRIP :],
        par, tff, skip_spatial,
    )[:, _STRIP - 2 :]
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, kh, 1, 1), 1)
    out = jnp.where(kk == 0, top.reshape(nc, 1, 2, w), out)
    out = jnp.where(kk == kh - 1, bot.reshape(nc, 1, 2, w), out)
    return out.reshape(nc, h, w)


def yadif_frame(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    next_: jnp.ndarray,
    parity,  # traced int32 0/1: rows y%2==parity keep cur
    tff: bool,
    skip_spatial: bool = False,
) -> jnp.ndarray:
    """One yadif pass over a full frame (yadifCl.ts:105-167).

    `parity` stays a traced argument (field alternation must never
    recompile the channel program); the static-parity fast paths sit
    behind a two-way `lax.cond`."""
    h = cur.shape[-2]
    if h % 2 or h < 2 * _STRIP:
        return _yadif_full(prev, cur, next_, parity, tff, skip_spatial)
    parity = jnp.asarray(parity, dtype=jnp.int32)
    return jax.lax.cond(
        parity == 0,
        lambda p, c, n: _yadif_half(p, c, n, 0, tff, skip_spatial),
        lambda p, c, n: _yadif_half(p, c, n, 1, tff, skip_spatial),
        prev, cur, next_,
    )
