"""Native WAV audio producer: audio beds with black video substitution
(the reference's ffmpeg audio-only path, here with zero binaries)."""

import wave

import numpy as np
import pytest

from conftest import run_async
from phaneron_tpu.config import VideoFormat
from phaneron_tpu.producer.producer import (
    InvalidProducerError,
    LoadParams,
    ProducerRegistry,
)
from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
from phaneron_tpu.producer.wav_file import WavProducer, create_wav_producer
from phaneron_tpu.runtime.stream import END

TINY = VideoFormat("wav_t", 1, 96, 64, 96, 50, 1, 48000, 2)


def _write_wav(path, samples, rate=48000, channels=1, sampwidth=2):
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(rate)
        if sampwidth == 2:
            wf.writeframes((samples * 32767).astype("<i2").tobytes())
        else:
            wf.writeframes((samples * 2147483647).astype("<i4").tobytes())


def test_wav_plays_audio_with_black_video(tmp_path):
    path = tmp_path / "tone.wav"
    t = np.arange(48000, dtype=np.float32)
    tone = 0.5 * np.sin(2 * np.pi * 1000 * t / 48000)
    _write_wav(path, tone)

    async def main():
        p = WavProducer("wav", LoadParams(str(path)), TINY)
        await p.initialise()
        audio = p.audio_stream()
        chunk = await audio.next()
        assert chunk is not END
        # mono up-maps to the channel count by repetition
        assert chunk.samples.shape[0] == TINY.audio_channels
        rms = float(np.sqrt((chunk.samples[0] ** 2).mean()))
        assert 0.3 < rms < 0.4  # 0.5 amplitude sine -> ~0.354 rms
        video = p.video_stream()
        vf = await video.next()
        assert vf is not END and vf.format == "v210"
        # true-black codes: unpacking yields Y=64 (black), not zeros
        from phaneron_tpu.ops.formats import get_format
        from phaneron_tpu.ops.pallas_kernels import planes_to_words

        words = np.asarray(planes_to_words(vf.payload[0]))
        y, u, v = (
            np.asarray(q)
            for q in get_format("v210").unpack_codes(
                [words], TINY.width, TINY.height
            )
        )
        assert (y == 64).all() and (u == 512).all() and (v == 512).all()
        p.release()

    run_async(main())


def test_wav_ends_after_audio_and_loops(tmp_path):
    path = tmp_path / "short.wav"
    _write_wav(path, np.zeros(2048, np.float32))

    async def main():
        p = WavProducer("wav", LoadParams(str(path)), TINY)
        await p.initialise()
        audio = p.audio_stream()
        chunks = 0
        while (await audio.next()) is not END:
            chunks += 1
        assert chunks == 2  # 2048 samples = 2 QUANTA
        lp = WavProducer("wav", LoadParams(str(path), loop=True), TINY)
        await lp.initialise()
        la = lp.audio_stream()
        for _ in range(5):  # loops past the file length
            assert (await la.next()) is not END
        lp.release()

    run_async(main())


def test_rejects_non_wav_and_falls_through_registry(tmp_path):
    with pytest.raises(InvalidProducerError):
        WavProducer("wav", LoadParams("nope.mp3"), TINY)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a riff wave at all")
    with pytest.raises(InvalidProducerError):
        WavProducer("wav", LoadParams(str(bad)), TINY)

    async def main():
        reg = ProducerRegistry([create_wav_producer, create_test_pattern_producer])
        # a non-WAV source falls through to the next factory
        p = await reg.create_source("s", LoadParams("BARS"), TINY)
        assert p is not None and type(p).__name__ != "WavProducer"

    run_async(main())
