"""Raw file consumer: packed video frames to disk (+ audio WAV).

The file-writing role of the reference's FFmpegConsumer
(consumer/ffmpegConsumer.ts) without codec libraries: writes the
channel's packed planes verbatim (v210/yuv422p8/... — playable by any
raw-video tool and bit-comparable in tests) plus a standard WAV for the
mixed audio.  A sidecar JSON records geometry for the raw-file producer
to play back.
"""

from __future__ import annotations

import asyncio
import json
import wave
from pathlib import Path

import numpy as np

from .consumer import ChannelFrame, Consumer

__all__ = ["FileConsumer"]


class FileConsumer(Consumer):
    def __init__(self, params: dict | None = None):
        super().__init__(params)
        self.pix_format = self.params.get("format", "v210")
        self.path = Path(self.params.get("path", "channel_out.raw"))
        self.audio_path = self.params.get("audio_path")
        self.max_frames = self.params.get("max_frames")
        self._fh = None
        self._wav = None
        self._frames = 0
        self._lock = asyncio.Lock()
        self._pending_field = None  # top-field rgba awaiting its pair

    async def initialise(self, fmt) -> None:
        await super().initialise(fmt)
        self.interlaced = fmt.interlaced
        if self.interlaced:
            # pack field pairs ourselves from the RGBA output
            self.needs_rgba = True
            from ..graph.pipeline import make_interlaced_pack_program

            self._pack_pair = make_interlaced_pack_program(
                self.pix_format, fmt.width, fmt.height, "709"
            )
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "wb")
        sidecar = {
            "format": self.pix_format,
            "width": fmt.width,
            "height": fmt.height,
            "fps": fmt.fps / (2 if fmt.interlaced else 1),
            "interlaced": fmt.interlaced,
        }
        Path(str(self.path) + ".json").write_text(json.dumps(sidecar))
        if self.audio_path:
            self._wav = wave.open(str(self.audio_path), "wb")
            self._wav.setnchannels(fmt.audio_channels)
            self._wav.setsampwidth(2)
            self._wav.setframerate(fmt.audio_sample_rate)

    async def deliver(self, frame: ChannelFrame) -> None:
        if self._fh is None or (self.max_frames and self._frames >= self.max_frames):
            return
        planes = frame.packed
        if self.interlaced and frame.rgba is not None:
            # two field-rate frames -> one interlaced frame
            # (macadamConsumer.ts:224-244 two-pass field packing)
            if self._pending_field is None:
                self._pending_field = frame.rgba
                self._write_audio(frame)
                return
            planes = self._pack_pair(self._pending_field, frame.rgba)
            self._pending_field = None
        async with self._lock:
            # device -> host copy happens here, off the render loop's
            # critical path only insofar as dispatch is async; a real
            # deployment would double-buffer (SURVEY.md §7.1)
            for p in planes:
                self._fh.write(np.asarray(p).tobytes())
            self._write_audio(frame)
        self._frames += 1

    def _write_audio(self, frame: ChannelFrame) -> None:
        if self._wav is not None:
            pcm = np.clip(frame.audio.T, -1.0, 1.0 - 2**-15)
            self._wav.writeframes((pcm * 32767).astype("<i2").tobytes())

    def release(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._wav:
            self._wav.close()
            self._wav = None
