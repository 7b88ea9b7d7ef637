"""Yadif deinterlacer — spatial + temporal field interpolation.

Port of the algorithm the reference uses (src/process/yadifCl.ts, which
itself follows FFmpeg's yadif_cuda): for every missing-field pixel, a
spatial predictor searches ±3px edge directions across the adjacent
lines, then a temporal predictor clamps it against prev/cur/next frame
statistics.  Operates on (4, H, W) linear RGBA frames; `parity` is a
traced scalar so field alternation never recompiles.

The 3-frame sliding-window driver (send_frame / send_field modes,
yadif.ts:115-145) lives in runtime.yadif_driver; this module is the
pure per-frame math.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["yadif_frame"]


def _shift(img: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """out[..., y, x] = img[..., clamp(y+dy), clamp(x+dx)] — the kernel's
    CLK_ADDRESS_CLAMP_TO_EDGE sampling (yadifCl.ts:29-32)."""
    h, w = img.shape[-2], img.shape[-1]
    if dy:
        pad = (max(dy, 0), max(-dy, 0))
        img = jnp.pad(img, ((0, 0), pad, (0, 0)), mode="edge")
        img = img[:, pad[1] : pad[1] + h, :] if dy < 0 else img[:, dy : dy + h, :]
    if dx:
        pad = (max(dx, 0), max(-dx, 0))
        img = jnp.pad(img, ((0, 0), (0, 0), pad), mode="edge")
        img = img[:, :, pad[1] : pad[1] + w] if dx < 0 else img[:, :, dx : dx + w]
    return img


def _spatial_predictor(cur: jnp.ndarray) -> jnp.ndarray:
    """Edge-directed spatial interpolation (yadifCl.ts:34-62)."""
    s = lambda dx, dy: _shift(cur, dx, dy)
    a, b, c, d, e, f, g = (s(dx, -1) for dx in (-3, -2, -1, 0, 1, 2, 3))
    h, i, j, k, l, m, n = (s(dx, 1) for dx in (-3, -2, -1, 0, 1, 2, 3))

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


def yadif_frame(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    next_: jnp.ndarray,
    parity: jnp.ndarray,  # traced int32 0/1: rows y%2==parity keep cur
    tff: bool,
    skip_spatial: bool = False,
) -> jnp.ndarray:
    """One yadif pass over a full frame (yadifCl.ts:105-167).

    Rows of the primary field pass through; the other field's rows get
    the spatial prediction clamped by the temporal predictor."""
    parity = jnp.asarray(parity, dtype=jnp.int32)
    is_second = (parity ^ int(tff)) == 0  # traced bool (yadifCl.ts:144)

    spatial = _spatial_predictor(cur)

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
    # Alpha passes through from cur (yadifCl.ts:163-164)
    pred = pred.at[3].set(cur[3])

    rows = jnp.arange(cur.shape[-2], dtype=jnp.int32)[None, :, None]
    keep = (rows % 2) == parity
    return jnp.where(keep, cur, pred)
