"""Compositing op semantics (reference combine.ts / transition.ts /
mix.ts / wipe.ts)."""

import jax.numpy as jnp
import numpy as np

from phaneron_tpu.ops.composite import (
    combine,
    combine_masked,
    dissolve,
    mix_frames,
    transparent,
    wipe_h,
    wipe_mask,
)


def rand_frame(rng, h=8, w=16, alpha=None):
    f = rng.random((4, h, w), dtype=np.float32)
    if alpha is not None:
        f[3] = alpha
    return jnp.asarray(f)


def test_combine_over_semantics():
    rng = np.random.default_rng(1)
    bg = rand_frame(rng, alpha=1.0)
    fg = rand_frame(rng, alpha=1.0)
    out = combine([bg, fg])
    # opaque top layer fully replaces RGB and alpha
    assert np.allclose(np.asarray(out), np.asarray(fg), atol=1e-6)

    half = rand_frame(rng, alpha=0.5)
    out = combine([bg, half])
    expected_rgb = np.asarray(bg[:3]) * 0.5 + np.asarray(half[:3])
    assert np.allclose(np.asarray(out[:3]), expected_rgb, atol=1e-6)
    assert np.allclose(np.asarray(out[3]), 0.5)


def test_combine_transparent_layer_takes_alpha():
    # reference quirk: the top layer's alpha wins (combine.ts:50 k4 has 0
    # in the alpha slot), so a transparent top layer zeroes output alpha
    rng = np.random.default_rng(2)
    bg = rand_frame(rng, alpha=1.0)
    out = combine([bg, transparent(8, 16)])
    assert np.allclose(np.asarray(out[:3]), np.asarray(bg[:3]), atol=1e-6)
    assert np.allclose(np.asarray(out[3]), 0.0)


def test_combine_masked_matches_unpadded():
    rng = np.random.default_rng(3)
    layers = [rand_frame(rng, alpha=a) for a in (1.0, 0.7, 0.3)]
    pad = [transparent(8, 16)] * 2
    enables = jnp.asarray([True, True, True, False, False])
    masked = combine_masked(layers + pad, enables)
    plain = combine(layers)
    assert np.allclose(np.asarray(masked), np.asarray(plain), atol=0)


def test_dissolve_endpoints_and_mid():
    rng = np.random.default_rng(4)
    a, b = rand_frame(rng), rand_frame(rng)
    assert np.allclose(np.asarray(dissolve(a, b, 1.0)), np.asarray(a))
    assert np.allclose(np.asarray(dissolve(a, b, 0.0)), np.asarray(b))
    mid = dissolve(a, b, 0.25)
    assert np.allclose(np.asarray(mid), 0.25 * np.asarray(a) + 0.75 * np.asarray(b), atol=1e-6)


def test_wipe_mask_blend():
    rng = np.random.default_rng(5)
    a, b = rand_frame(rng), rand_frame(rng)
    mask = rand_frame(rng)
    out = np.asarray(wipe_mask(a, b, mask))
    m = np.asarray(mask[0])
    expected = np.asarray(b) * m + np.asarray(a) * (1 - m)
    assert np.allclose(out, expected, atol=1e-6)


def test_mix_and_hard_wipe():
    rng = np.random.default_rng(6)
    a, b = rand_frame(rng), rand_frame(rng)
    assert np.allclose(np.asarray(mix_frames(a, b, 1.0)), np.asarray(a))
    out = np.asarray(wipe_h(a, b, 0.5))
    w = a.shape[-1]
    edge = int(w * 0.5)
    # x > w*wipe -> in1
    assert np.allclose(out[..., : edge + 1], np.asarray(a)[..., : edge + 1])
    assert np.allclose(out[..., edge + 1 :], np.asarray(b)[..., edge + 1 :])
