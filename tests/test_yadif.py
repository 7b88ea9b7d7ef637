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
    """A static scene split into fields should reconstruct close to the
    original progressive frame."""
    rng = np.random.default_rng(4)
    base = rng.random((4, 16, 32), dtype=np.float32)
    # smooth it a bit so spatial prediction is meaningful
    base = (base + np.roll(base, 1, axis=1) + np.roll(base, 1, axis=2)) / 3.0
    frame = jnp.asarray(base)
    out = np.asarray(yadif_frame(frame, frame, frame, parity=0, tff=True))
    # temporal predictor sees identical frames -> diff 0 -> pred == p2 == original
    assert np.allclose(out, base, atol=1e-6)
