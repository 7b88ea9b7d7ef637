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


def test_linear_resampler_rate_and_pitch():
    from phaneron_tpu.audio.engine import LinearResampler

    src_rate, dst_rate = 24000, 48000
    t = np.arange(src_rate, dtype=np.float64) / src_rate
    tone = np.sin(2 * np.pi * 600.0 * t).astype(np.float32)[None, :]
    rs = LinearResampler(src_rate, dst_rate, 1)
    outs = [rs.push(tone[:, i : i + 700]) for i in range(0, src_rate, 700)]
    out = np.concatenate(outs, axis=1)
    # ~2x the samples out (one second of audio either way)
    assert abs(out.shape[1] - dst_rate) < 8
    # the tone stays at 600 Hz in the new rate: count zero crossings
    zc = np.sum(np.abs(np.diff(np.signbit(out[0])))) / 2
    assert abs(zc - 600) <= 2
    # phase continuity across chunk boundaries: no sample-to-sample jumps
    step = np.abs(np.diff(out[0])).max()
    assert step < 2 * np.pi * 600 / dst_rate * 1.2


def test_source_rate_audio_resampled_to_channel(tmp_path):
    """A raw clip whose sidecar declares 24 kHz PCM plays at the channel's
    48 kHz with the tone intact (mixer.ts src->dst sample-rate path)."""
    import asyncio
    import json

    from conftest import run_async as run
    from phaneron_tpu.config import VideoFormat
    from phaneron_tpu.ops.formats import get_format
    from phaneron_tpu.producer.producer import LoadParams, ProducerRegistry
    from phaneron_tpu.producer.raw_file import create_raw_file_producer
    from phaneron_tpu.runtime.channel import Channel

    TINY = VideoFormat("tiny", 1, 96, 64, 96, 50, 1, 48000, 2)
    v210 = get_format("v210")
    clip = tmp_path / "clip.v210"
    clip.write_bytes(np.asarray(v210.fill_buf(96, 64)[0]).tobytes() * 8)
    src_rate = 24000
    t = np.arange(src_rate, dtype=np.float64) / src_rate
    tone = np.sin(2 * np.pi * 600.0 * t).astype(np.float32)
    pcm = np.stack([tone, tone])  # stored planar per QUANTUM blocks
    blocks = [pcm[:, i : i + 1024] for i in range(0, pcm.shape[1] - 1024, 1024)]
    (tmp_path / "clip.pcm").write_bytes(
        b"".join(b.tobytes() for b in blocks)
    )
    (tmp_path / "clip.v210.json").write_text(
        json.dumps({
            "format": "v210", "width": 96, "height": 64, "loop": True,
            "audio": "clip.pcm", "audio_channels": 2, "audio_rate": src_rate,
        })
    )

    async def main():
        ch = Channel(1, TINY, ProducerRegistry([create_raw_file_producer]))
        assert await ch.load_source(1, LoadParams(str(clip), loop=True))
        ch.play(1)
        chunks = []
        for _ in range(6):
            f = await ch.render_frame()
            chunks.append(f.audio)
        out = np.concatenate(chunks[1:], axis=1)  # skip warmup silence
        rms = float(np.sqrt(np.mean(np.square(out))))
        assert rms > 0.3  # the tone arrived
        zc = np.sum(np.abs(np.diff(np.signbit(out[0])))) / 2
        seconds = out.shape[1] / 48000
        assert abs(zc / seconds - 600) < 30  # pitch preserved at 48 kHz

    run(main())
