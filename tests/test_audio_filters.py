"""Per-source audio filter chain (the reference's shipped-but-disabled
mixer graph, mixer.ts:146, made enable-able)."""

import numpy as np

from phaneron_tpu.audio.engine import QUANTUM
from phaneron_tpu.audio.filters import Compressor, Delay, FilterChain, Highpass
from phaneron_tpu.runtime.mixer import Mixer


def _tone(freq, n=QUANTUM * 8, rate=48000, ch=2):
    t = np.arange(n, dtype=np.float32) / rate
    s = np.sin(2 * np.pi * freq * t).astype(np.float32)
    return np.stack([s] * ch)


def _rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def _run_chunks(filt, x):
    outs = [filt.process(x[:, o : o + QUANTUM]) for o in range(0, x.shape[1], QUANTUM)]
    return np.concatenate(outs, axis=1)


def test_highpass_attenuates_low_passes_high():
    hp = Highpass(frequency=1000.0)
    low = _run_chunks(hp, _tone(50.0))
    hp2 = Highpass(frequency=1000.0)
    high = _run_chunks(hp2, _tone(8000.0))
    # steady-state response (skip the transient)
    assert _rms(low[:, QUANTUM:]) < 0.02  # ~ -24 dB/oct * >4 octaves
    assert _rms(high[:, QUANTUM:]) > 0.6


def test_highpass_streaming_equals_oneshot():
    """Chunked processing with carried biquad state == one-shot."""
    x = _tone(440.0, QUANTUM * 4)
    a = _run_chunks(Highpass(300.0), x)
    b = Highpass(300.0).process(x)
    assert np.abs(a - b).max() < 1e-6


def test_delay_shifts_and_is_seamless():
    d = Delay(samples=100)
    x = np.zeros((2, QUANTUM), np.float32)
    x[:, 0] = 1.0
    y1 = d.process(x)
    y2 = d.process(np.zeros((2, QUANTUM), np.float32))
    assert y1[0, 100] == 1.0 and y1[0, 0] == 0.0
    assert np.all(y2 == 0.0)
    # impulse near the end crosses the chunk boundary
    d2 = Delay(samples=100)
    x2 = np.zeros((2, QUANTUM), np.float32)
    x2[:, QUANTUM - 1] = 1.0
    d2.process(x2)
    y = d2.process(np.zeros((2, QUANTUM), np.float32))
    assert y[0, 99] == 1.0


def test_compressor_reduces_loud_keeps_quiet():
    c = Compressor(threshold=0.1, ratio=4.0, attack=1.0, release=50.0)
    loud = _run_chunks(c, _tone(1000.0) * 0.8)
    assert _rms(loud[:, QUANTUM:]) < 0.8 * _rms(_tone(1000.0)[:, QUANTUM:]) * 0.7
    c2 = Compressor(threshold=0.1, ratio=4.0)
    quiet_in = _tone(1000.0) * 0.05
    quiet = _run_chunks(c2, quiet_in)
    assert abs(_rms(quiet) - _rms(quiet_in)) < 0.005


def test_chain_order_and_mixer_integration():
    ch = FilterChain()
    ch.set("acompressor", threshold=0.5)
    ch.set("highpass", frequency=100.0)
    assert ch.active == ["highpass", "acompressor"]  # reference order
    ch.clear("acompressor")
    assert ch.active == ["highpass"]

    m = Mixer(1920, 1080)
    x = _tone(50.0, QUANTUM)
    before = m.apply_audio(x)
    assert np.array_equal(before, x)  # filters default OFF (mixer.ts:146)
    m.set_audio_filter("highpass", frequency=2000.0)
    after = m.apply_audio(x)
    assert _rms(after) < _rms(x) * 0.5
    m.clear_audio_filter()
    assert np.array_equal(m.apply_audio(x), x)
