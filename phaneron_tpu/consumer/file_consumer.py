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

    async def initialise(self, fmt) -> None:
        await super().initialise(fmt)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "wb")
        sidecar = {
            "format": self.pix_format,
            "width": fmt.width,
            "height": fmt.height,
            "fps": fmt.fps,
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
        async with self._lock:
            # device -> host copy happens here, off the render loop's
            # critical path only insofar as dispatch is async; a real
            # deployment would double-buffer (SURVEY.md §7.1) — next round
            for p in planes:
                self._fh.write(np.asarray(p).tobytes())
            if self._wav is not None:
                pcm = np.clip(frame.audio.T, -1.0, 1.0 - 2**-15)
                self._wav.writeframes((pcm * 32767).astype("<i2").tobytes())
        self._frames += 1

    def release(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._wav:
            self._wav.close()
            self._wav = None
