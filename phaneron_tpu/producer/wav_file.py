"""Native WAV audio producer: audio beds with zero codec binaries.

The reference plays audio files through FFmpeg, substituting black
video at the channel rate for the missing video stream
(ffmpegProducer.ts:213-246 silence handling; the audio-only black
pacing mirrored from this package's gated FFmpeg producer).  This
producer covers the PCM-WAV subset natively via the stdlib ``wave``
module — `PLAY 1-1 bed.wav` works in an environment with no ffmpeg —
and falls through the registry chain for anything else.
"""

from __future__ import annotations

import asyncio
import wave
from pathlib import Path

import numpy as np

from ..audio.engine import QUANTUM
from ..config import VideoFormat
from ..runtime.frame import AudioFrame, VideoFrame
from ..runtime.stream import END, Stream, from_generator
from .producer import InvalidProducerError, LoadParams, Producer

__all__ = ["create_wav_producer"]


class WavProducer(Producer):
    def __init__(self, source_id: str, params: LoadParams, fmt: VideoFormat):
        super().__init__(source_id, fmt)
        url = params.url
        if not url.lower().endswith(".wav"):
            raise InvalidProducerError("not a WAV path")
        self.path = Path(url)
        if not self.path.exists():
            raise InvalidProducerError(f"no such file: {url}")
        try:
            with wave.open(str(self.path), "rb") as wf:
                self.src_channels = wf.getnchannels()
                self.sample_rate = wf.getframerate()
                self.sampwidth = wf.getsampwidth()
                self.num_samples = wf.getnframes()
        except (wave.Error, EOFError) as err:
            raise InvalidProducerError(f"unsupported WAV: {err}") from err
        if self.sampwidth not in (1, 2, 3, 4):
            raise InvalidProducerError(f"unsupported sample width {self.sampwidth}")
        self.loop = params.loop
        self.width, self.height = fmt.width, fmt.height
        self.interlaced = False
        self._audio_done = asyncio.Event()

    async def initialise(self) -> None:
        def decode() -> np.ndarray:
            with wave.open(str(self.path), "rb") as wf:
                raw = wf.readframes(self.num_samples)
            if self.sampwidth == 1:  # WAV 8-bit is unsigned
                x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
            elif self.sampwidth == 2:
                x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
            elif self.sampwidth == 3:  # packed 24-bit
                b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
                i = (
                    b[:, 0].astype(np.int32)
                    | (b[:, 1].astype(np.int32) << 8)
                    | (b[:, 2].astype(np.int32) << 16)
                )
                i = np.where(i >= 1 << 23, i - (1 << 24), i)
                x = i.astype(np.float32) / float(1 << 23)
            else:
                x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
            n = len(x) // self.src_channels
            return (
                x[: n * self.src_channels]
                .reshape(n, self.src_channels)
                .T.copy()  # (channels, samples) planar
            )

        self._pcm = await asyncio.to_thread(decode)

    def video_stream(self) -> Stream:
        """Black frames at the channel rate until the audio ends — the
        reference's audio-only substitution."""

        async def gen():
            import jax

            from ..ops.formats import get_format, host_split

            # true-black codes, NOT zeros (zero YUV decodes below black
            # with an extreme chroma excursion)
            fmt_mod = get_format(self.pix_format)
            black = [
                jax.device_put(p)
                for p in host_split(
                    fmt_mod, fmt_mod.black_buf(self.width, self.height)
                )
            ]
            ts = 0
            while not self.released and not self._audio_done.is_set():
                yield VideoFrame(
                    timestamp=ts, format=self.pix_format, payload=black,
                    width=self.width, height=self.height,
                )
                ts += 1
                await asyncio.sleep(0)
            yield END

        return from_generator(gen)

    def audio_stream(self) -> Stream:
        channels = self.fmt.audio_channels

        async def gen():
            pcm = self._pcm
            total = pcm.shape[1]
            ts = 0
            off = 0
            while not self.released:
                if off + QUANTUM > total:
                    if self.loop and total >= QUANTUM:
                        off = 0
                    else:
                        break
                chunk = pcm[:, off : off + QUANTUM]
                if chunk.shape[0] < channels:  # up-map by repetition
                    reps = -(-channels // chunk.shape[0])
                    chunk = np.tile(chunk, (reps, 1))[:channels]
                else:
                    chunk = chunk[:channels]
                off += QUANTUM
                yield AudioFrame(
                    timestamp=ts, samples=chunk, sample_rate=self.sample_rate
                )
                ts += 1
            self._audio_done.set()
            yield END

        return from_generator(gen)


def create_wav_producer(source_id, params, fmt) -> WavProducer:
    return WavProducer(source_id, params, fmt)
