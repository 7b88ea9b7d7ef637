"""FFmpeg-based media ingest (gated on an ffmpeg binary or PyAV).

The reference's largest component is its FFmpeg producer
(producer/ffmpegProducer.ts, 705 LoC: demux -> decode -> filter ->
GPU load).  This image ships neither libav bindings nor an ffmpeg
binary, so the factory rejects cleanly and the registry falls through
(producer.ts:62-102 fallback chain).  When an ffmpeg binary IS present,
this producer spawns it decoding any container/codec to raw yuv422p10le
on a pipe and feeds the standard unpack path — decode on host threads,
unpack/colour on TPU.
"""

from __future__ import annotations

import asyncio
import shutil

import numpy as np

from ..audio.engine import silence
from ..config import VideoFormat
from ..ops.formats import get_format
from ..runtime.frame import AudioFrame, VideoFrame
from ..runtime.stream import END, Stream, from_generator
from .producer import InvalidProducerError, LoadParams, Producer

__all__ = ["create_ffmpeg_producer", "ffmpeg_available"]

PIPE_FORMAT = "yuv422p10le"


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


class FFmpegProducer(Producer):
    def __init__(self, source_id: str, params: LoadParams, fmt: VideoFormat):
        super().__init__(source_id, fmt)
        if not ffmpeg_available():
            raise InvalidProducerError("no ffmpeg binary in this environment")
        self.params = params
        self.pix_format = PIPE_FORMAT
        self.proc: asyncio.subprocess.Process | None = None

    async def initialise(self) -> None:
        w, h = self.fmt.width, self.fmt.height
        args = [
            "ffmpeg", "-hide_banner", "-loglevel", "warning",
        ]
        if self.params.seek:
            args += ["-ss", str(self.params.seek * self.fmt.duration / self.fmt.timescale)]
        if self.params.loop:
            args += ["-stream_loop", "-1"]
        args += [
            "-i", self.params.url,
            "-f", "rawvideo", "-pix_fmt", "yuv422p10le",
            "-s", f"{w}x{h}", "-r", f"{self.fmt.timescale}/{self.fmt.duration}",
            "pipe:1",
        ]
        self.proc = await asyncio.create_subprocess_exec(
            *args, stdout=asyncio.subprocess.PIPE, stderr=asyncio.subprocess.DEVNULL
        )
        fmt_mod = get_format(PIPE_FORMAT)
        # ffmpeg rawvideo output is unpadded; pitch == width when w % 8 == 0
        if fmt_mod.pitch(w) != w:
            raise InvalidProducerError("width must be a multiple of 8 for pipe ingest")
        self.frame_bytes = sum(fmt_mod.num_bytes(w, h))
        self._fmt_mod = fmt_mod

    def video_stream(self) -> Stream:
        import jax

        w, h = self.fmt.width, self.fmt.height
        length = self.params.length

        async def gen():
            ts = 0
            while not self.released:
                if length is not None and ts >= length:
                    break
                try:
                    raw = await self.proc.stdout.readexactly(self.frame_bytes)
                except (asyncio.IncompleteReadError, AttributeError):
                    break
                planes = self._fmt_mod.from_bytes(raw, w, h)
                yield VideoFrame(
                    timestamp=ts,
                    format=PIPE_FORMAT,
                    payload=[jax.device_put(p) for p in planes],
                    width=w,
                    height=h,
                )
                ts += 1
            yield END

        return from_generator(gen)

    def audio_stream(self) -> Stream:
        channels = self.fmt.audio_channels

        async def gen():
            ts = 0
            while not self.released:
                yield AudioFrame(
                    timestamp=ts,
                    samples=silence(channels),
                    sample_rate=self.fmt.audio_sample_rate,
                )
                ts += 1
            yield END

        return from_generator(gen)

    def release(self) -> None:
        super().release()
        if self.proc and self.proc.returncode is None:
            self.proc.kill()


def create_ffmpeg_producer(source_id, params, fmt) -> FFmpegProducer:
    return FFmpegProducer(source_id, params, fmt)
