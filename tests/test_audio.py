"""Audio engine semantics: pan/volume/amix/rechunk/adapt/interleave."""

import numpy as np

from phaneron_tpu.audio.engine import (
    Rechunker,
    adapt_channels,
    amix,
    apply_volume,
    interleave_s32,
    pan,
    silence,
)
from phaneron_tpu.runtime.mixer import Mixer


def test_silence_and_volume():
    s = silence(4, 256)
    assert s.shape == (4, 256) and np.all(s == 0)
    x = np.ones((2, 8), np.float32)
    assert np.allclose(apply_volume(x, 0.5), 0.5)


def test_pan_matrix():
    x = np.stack([np.ones(4, np.float32), 2 * np.ones(4, np.float32)])
    swap = np.array([[0, 1], [1, 0]], np.float32)
    out = pan(x, swap)
    assert np.allclose(out[0], 2) and np.allclose(out[1], 1)


def test_amix_normalizes():
    a = np.ones((2, 8), np.float32)
    b = 3 * np.ones((2, 8), np.float32)
    assert np.allclose(amix([a, b]), 2.0)
    assert np.allclose(amix([a, b], normalize=False), 4.0)
    assert np.allclose(amix([a]), 1.0)


def test_rechunker():
    r = Rechunker(2, 960)
    out = r.push(np.ones((2, 1024), np.float32))
    assert len(out) == 1 and out[0].shape == (2, 960)
    out = r.push(np.ones((2, 1024), np.float32))  # 64 + 1024 = 1088 -> 1 frame
    assert len(out) == 1
    tail = r.flush()
    assert tail.shape == (2, 960)  # 128 samples zero-padded
    assert np.all(tail[:, 128:] == 0)


def test_adapt_channels():
    x = np.arange(8, dtype=np.float32).reshape(2, 4)
    wide = adapt_channels(x, 4)
    assert wide.shape == (4, 4)
    assert np.array_equal(wide[2], x[0])  # cycle-duplicated
    narrow = adapt_channels(wide, 2)
    assert np.array_equal(narrow, x)


def test_mixer_audio_chain():
    m = Mixer(96, 64)
    x = np.ones((2, 8), np.float32)
    assert np.allclose(m.apply_audio(x), 1.0)
    m.set_volume(0.5)
    m.set_levels([1.0, 0.0])
    out = m.apply_audio(x)
    assert np.allclose(out[0], 0.5) and np.allclose(out[1], 0.0)


def test_interleave_s32():
    x = np.array([[1.0, -1.0], [0.5, 0.25]], np.float32)
    out = interleave_s32(x)
    assert out.shape == (4,)
    assert out[0] > 2**30 and out[2] < 0


def test_crossfade_unity_and_constant_power():
    from phaneron_tpu.audio.engine import crossfade

    t = np.linspace(0, 1, 960, dtype=np.float32)
    tone = np.stack([np.sin(2 * np.pi * 20 * t)] * 2).astype(np.float32)
    for mix in (1.0, 0.75, 0.5, 0.25, 0.0):
        out = crossfade(tone, tone, mix)
        assert np.allclose(out, tone, atol=1e-6)  # coherent: unity gain
    # constant-power: equal-power at the midpoint for uncorrelated inputs
    out = crossfade(tone, np.zeros_like(tone), 0.5, constant_power=True)
    assert np.allclose(out, tone * np.float32(0.5**0.5), atol=1e-6)
