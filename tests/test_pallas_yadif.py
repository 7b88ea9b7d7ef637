"""Pallas yadif kernel vs the XLA formulation (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from phaneron_tpu.ops.pallas_yadif import (
    make_yadif_pair_program,
    make_yadif_ring_program,
    yadif_pair_fits,
    yadif_ring_fits,
)
from phaneron_tpu.ops.yadif import yadif_frame


@pytest.mark.parametrize("h,w", [(96, 128), (120, 256), (48, 128)])
@pytest.mark.parametrize("tff", [True, False])
def test_matches_xla_path(h, w, tff):
    assert yadif_ring_fits(h, w)
    prog = make_yadif_ring_program(h, w, tff, interpret=True)
    rng = np.random.default_rng(42)
    prev, cur, nxt = (
        jnp.asarray(rng.random((4, h, w), dtype=np.float32)) for _ in range(3)
    )
    for parity in (0, 1):
        got = np.asarray(prog(prev, cur, nxt, jnp.int32(parity)))
        exp = np.asarray(yadif_frame(prev, cur, nxt, parity, tff))
        assert np.allclose(got, exp, atol=1e-6), (
            parity,
            np.abs(got - exp).max(),
            np.argwhere(np.abs(got - exp) > 1e-6)[:5],
        )


def test_skip_spatial_matches():
    h, w = 96, 128
    prog = make_yadif_ring_program(h, w, True, skip_spatial=True, interpret=True)
    rng = np.random.default_rng(3)
    prev, cur, nxt = (
        jnp.asarray(rng.random((4, h, w), dtype=np.float32)) for _ in range(3)
    )
    for parity in (0, 1):
        got = np.asarray(prog(prev, cur, nxt, jnp.int32(parity)))
        exp = np.asarray(yadif_frame(prev, cur, nxt, parity, True, skip_spatial=True))
        assert np.allclose(got, exp, atol=1e-6), parity


def test_opaque_bit_equals_full_on_alpha_one_rings():
    """The opaque variant (alpha windows skipped, constant 1 written)
    must be bit-identical to the full kernel AND the XLA path on rings
    whose alpha is 1 — exactly what every non-RGB unpack produces."""
    h, w = 96, 128
    rng = np.random.default_rng(9)

    def ring_frame():
        f = rng.random((4, h, w), dtype=np.float32)
        f[3] = 1.0
        return jnp.asarray(f)

    prev, cur, nxt = (ring_frame() for _ in range(3))
    full = make_yadif_ring_program(h, w, True, interpret=True)
    opaq = make_yadif_ring_program(h, w, True, interpret=True, opaque=True)
    for parity in (0, 1):
        a = np.asarray(full(prev, cur, nxt, jnp.int32(parity)))
        b = np.asarray(opaq(prev, cur, nxt, jnp.int32(parity)))
        assert np.array_equal(a, b), parity
        exp = np.asarray(yadif_frame(prev, cur, nxt, parity, True))
        assert np.allclose(b, exp, atol=1e-6), parity


def test_keep_rows_bit_exact():
    h, w = 96, 128
    prog = make_yadif_ring_program(h, w, True, interpret=True)
    rng = np.random.default_rng(5)
    prev, cur, nxt = (
        jnp.asarray(rng.random((4, h, w), dtype=np.float32)) for _ in range(3)
    )
    out = np.asarray(prog(prev, cur, nxt, jnp.int32(0)))
    assert np.array_equal(out[:, 0::2, :], np.asarray(cur)[:, 0::2, :])
    assert np.array_equal(out[3], np.asarray(cur)[3])


@pytest.mark.parametrize("h,w", [(96, 128), (120, 256)])
@pytest.mark.parametrize("tff", [True, False])
@pytest.mark.parametrize("channels", [4, 3])
def test_pair_bit_equals_single(h, w, tff, channels):
    """The two-field pair kernel must be bit-identical to the
    single-field kernel at parity 0 AND 1 on the same ring."""
    assert yadif_pair_fits(h, w, channels)
    single = make_yadif_ring_program(h, w, tff, interpret=True, channels=channels)
    pair = make_yadif_pair_program(h, w, tff, interpret=True, channels=channels)
    rng = np.random.default_rng(17)
    prev, cur, nxt = (
        jnp.asarray(rng.random((channels, h, w), dtype=np.float32))
        for _ in range(3)
    )
    o0, o1 = pair(prev, cur, nxt)
    for parity, got in ((0, o0), (1, o1)):
        exp = np.asarray(single(prev, cur, nxt, jnp.int32(parity)))
        assert np.array_equal(np.asarray(got), exp), (
            parity,
            np.abs(np.asarray(got) - exp).max(),
        )


@pytest.mark.parametrize("h,w", [(96, 128), (120, 256)])
def test_pair_channel_split_bit_equals_joint(h, w):
    """The gated channel-split pair variant (one RGB channel per grid
    step; OFF by default — measured slower on hardware, see
    make_yadif_pair_program) must stay bit-identical to the joint
    kernel."""
    joint = make_yadif_pair_program(h, w, True, interpret=True, channels=3)
    split = make_yadif_pair_program(
        h, w, True, interpret=True, channels=3, channel_split=True
    )
    rng = np.random.default_rng(31)
    prev, cur, nxt = (
        jnp.asarray(rng.random((3, h, w), dtype=np.float32)) for _ in range(3)
    )
    for a, b in zip(joint(prev, cur, nxt), split(prev, cur, nxt)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pair_opaque_bit_equals_full():
    h, w = 96, 128
    rng = np.random.default_rng(23)

    def ring_frame():
        f = rng.random((4, h, w), dtype=np.float32)
        f[3] = 1.0
        return jnp.asarray(f)

    prev, cur, nxt = (ring_frame() for _ in range(3))
    full = make_yadif_pair_program(h, w, True, interpret=True)
    opaq = make_yadif_pair_program(h, w, True, interpret=True, opaque=True)
    for a, b in zip(full(prev, cur, nxt), opaq(prev, cur, nxt)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_fits_gate():
    assert yadif_ring_fits(1080, 1920)
    assert yadif_ring_fits(2160, 3840)
    assert not yadif_ring_fits(97, 128)  # odd height
    assert not yadif_ring_fits(96, 130)  # lane-unaligned width
