"""Yadif deinterlacer semantics (reference yadifCl.ts / yadif.ts)."""

import jax.numpy as jnp
import numpy as np

from phaneron_tpu.ops.yadif import yadif_frame


def test_constant_frames_pass_through():
    c = jnp.full((4, 16, 32), 0.5, dtype=jnp.float32)
    out = np.asarray(yadif_frame(c, c, c, parity=0, tff=True))
    assert np.allclose(out, 0.5, atol=1e-6)


def test_primary_field_untouched():
    rng = np.random.default_rng(1)
    prev, cur, nxt = (
        jnp.asarray(rng.random((4, 16, 32), dtype=np.float32)) for _ in range(3)
    )
    out0 = np.asarray(yadif_frame(prev, cur, nxt, parity=0, tff=True))
    assert np.array_equal(out0[:, 0::2, :], np.asarray(cur)[:, 0::2, :])
    out1 = np.asarray(yadif_frame(prev, cur, nxt, parity=1, tff=True))
    assert np.array_equal(out1[:, 1::2, :], np.asarray(cur)[:, 1::2, :])


def test_interpolated_rows_bounded_by_temporal_window():
    rng = np.random.default_rng(2)
    prev, cur, nxt = (
        jnp.asarray(rng.random((4, 16, 32), dtype=np.float32)) for _ in range(3)
    )
    out = np.asarray(yadif_frame(prev, cur, nxt, parity=0, tff=True))
    assert np.isfinite(out).all()
    assert out.min() >= -1.0 and out.max() <= 2.0


def test_alpha_comes_from_cur():
    rng = np.random.default_rng(3)
    prev, cur, nxt = (
        jnp.asarray(rng.random((4, 16, 32), dtype=np.float32)) for _ in range(3)
    )
    cur = cur.at[3].set(0.25)
    out = np.asarray(yadif_frame(prev, cur, nxt, parity=0, tff=True))
    assert np.allclose(out[3], 0.25)


def test_static_interlaced_content_reconstructs():
    """Static scenes with no vertical detail (or pure vertical ramps)
    reconstruct exactly: the temporal clamp window collapses to p2 (or
    the spatial average already equals the original row)."""
    rng = np.random.default_rng(4)
    # varies along x and channel only: p0..p4 all equal -> diff 0
    cols = rng.random((4, 1, 32), dtype=np.float32)
    base = np.broadcast_to(cols, (4, 16, 32)).copy()
    frame = jnp.asarray(base)
    out = np.asarray(yadif_frame(frame, frame, frame, parity=0, tff=True))
    assert np.allclose(out, base, atol=1e-6)
    # pure vertical ramp: spatial average of y±1 == original row, within clamp
    ramp = np.broadcast_to(
        np.linspace(0.0, 1.0, 16, dtype=np.float32)[None, :, None], (4, 16, 32)
    ).copy()
    frame = jnp.asarray(ramp)
    out = np.asarray(yadif_frame(frame, frame, frame, parity=1, tff=True))
    assert np.allclose(out, ramp, atol=1e-6)


def _yadif_scalar(prev, cur, nxt, parity, tff, skip_spatial=False):
    """Direct numpy transliteration of the reference kernel
    (yadifCl.ts:105-167) — clamp-to-edge scalar sampling.  Pins the tap
    NEIGHBOURHOOD (x±3, y±1, y±2): a shift-direction regression in
    ops.yadif can't pass against this."""
    _, h, w = cur.shape
    out = np.empty_like(cur)

    def rd(img, x, y):
        return img[:, min(max(y, 0), h - 1), min(max(x, 0), w - 1)]

    is_second = not (parity ^ int(tff))
    for y in range(h):
        for x in range(w):
            if y % 2 == parity:
                out[:, y, x] = cur[:, y, x]
                continue
            a, b, c, d, e, f, g = (rd(cur, x + dx, y - 1) for dx in range(-3, 4))
            h_, i, j, k, l, m, n = (rd(cur, x + dx, y + 1) for dx in range(-3, 4))
            pred = (d + k) / 2.0
            score = abs(c - j) + abs(d - k) + abs(e - l)
            s1 = abs(b - k) + abs(c - l) + abs(d - m)
            cmp1 = s1 < score
            pred = np.where(cmp1, (c + l) / 2.0, pred)
            score = np.where(cmp1, s1, score)
            s2 = np.where(cmp1, abs(a - l) + abs(b - m) + abs(c - n), s1)
            cmp2 = cmp1 & (s2 < score)
            pred = np.where(cmp2, (b + m) / 2.0, pred)
            score = np.where(cmp2, s2, score)
            s3 = abs(d - i) + abs(e - j) + abs(f - k)
            cmp3 = s3 < score
            pred = np.where(cmp3, (e + j) / 2.0, pred)
            score = np.where(cmp3, s3, score)
            s4 = np.where(cmp3, abs(e - h_) + abs(f - i) + abs(g - j), s3)
            cmp4 = cmp3 & (s4 < score)
            pred = np.where(cmp4, (f + i) / 2.0, pred)

            A, B = rd(prev, x, y - 1), rd(prev, x, y + 1)
            tC = cur if is_second else prev
            C, D, E = rd(tC, x, y - 2), rd(tC, x, y), rd(tC, x, y + 2)
            F, G = rd(cur, x, y - 1), rd(cur, x, y + 1)
            tH = nxt if is_second else cur
            H, I, J = rd(tH, x, y - 2), rd(tH, x, y), rd(tH, x, y + 2)
            K, L = rd(nxt, x, y - 1), rd(nxt, x, y + 1)
            p0, p1, p2, p3, p4 = (C + H) / 2, F, (D + I) / 2, G, (E + J) / 2
            diff = np.maximum(
                abs(D - I),
                np.maximum((abs(A - F) + abs(B - G)) / 2, (abs(K - F) + abs(G - L)) / 2),
            )
            if not skip_spatial:
                maxi = np.maximum(
                    np.maximum(p2 - p3, p2 - p1), np.minimum(p0 - p1, p4 - p3)
                )
                mini = np.minimum(
                    np.minimum(p2 - p3, p2 - p1), np.maximum(p0 - p1, p4 - p3)
                )
                diff = np.maximum(diff, np.maximum(mini, -maxi))
            pred = np.where(pred > p2 + diff, p2 + diff, pred)
            pred = np.where(pred < p2 - diff, p2 - diff, pred)
            pred[3] = cur[3, y, x]
            out[:, y, x] = pred
    return out


def test_matches_scalar_reference_kernel():
    rng = np.random.default_rng(7)
    prev, cur, nxt = (rng.random((4, 20, 12), dtype=np.float32) for _ in range(3))
    for parity in (0, 1):
        for tff in (True, False):
            got = np.asarray(
                yadif_frame(
                    jnp.asarray(prev), jnp.asarray(cur), jnp.asarray(nxt), parity, tff
                )
            )
            exp = _yadif_scalar(prev, cur, nxt, parity, tff)
            assert np.allclose(got, exp, atol=2e-6), (parity, tff)


def test_half_path_bit_equals_full():
    from phaneron_tpu.ops.yadif import _yadif_full

    rng = np.random.default_rng(8)
    prev, cur, nxt = (
        jnp.asarray(rng.random((4, 32, 48), dtype=np.float32)) for _ in range(3)
    )
    for parity in (0, 1):
        for tff in (True, False):
            for skip in (False, True):
                fast = np.asarray(yadif_frame(prev, cur, nxt, parity, tff, skip))
                full = np.asarray(_yadif_full(prev, cur, nxt, parity, tff, skip))
                assert np.array_equal(fast, full), (parity, tff, skip)
