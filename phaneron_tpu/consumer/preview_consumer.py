"""Web preview consumer: latest frame as raw RGBA over HTTP.

Parity with the reference ScreenConsumer's HTTP side
(consumer/screenConsumer.ts:85-92,218): the most recent frame is kept
packed as rgba8 (sRGB) and served at GET / with CORS headers so a web
page can poll it.  PortAudio monitoring (naudiodon,
screenConsumer.ts:73-80) has no TPU-cloud host-audio analogue, so the
monitor feed is served over HTTP instead: GET /audio.wav is an endless
stereo s16 WAV stream a browser <audio> tag plays live; /audio keeps
the last raw chunk for polling tools."""

from __future__ import annotations

import asyncio
from typing import Optional

import numpy as np

from ..graph.pipeline import make_pack_program
from .consumer import ChannelFrame, Consumer

__all__ = ["PreviewConsumer"]


class PreviewConsumer(Consumer):
    pix_format = None  # packs its own rgba8/sRGB from the RGBA frame

    def __init__(self, params: dict | None = None):
        super().__init__(params)
        self.port = int(self.params.get("port", 3001))
        self._last: Optional[bytes] = None
        self._last_audio: Optional[bytes] = None
        self._server: Optional[asyncio.AbstractServer] = None
        self._latest: Optional[ChannelFrame] = None
        self._task: Optional[asyncio.Task] = None
        self._listeners: set[asyncio.Queue] = set()

    async def initialise(self, fmt) -> None:
        await super().initialise(fmt)
        # sRGB gamma for display (screenConsumer.ts:128-133)
        self._pack = make_pack_program("rgba8", fmt.width, fmt.height, "sRGB")
        self._server = await asyncio.start_server(self._handle, "0.0.0.0", self.port)

    async def deliver(self, frame: ChannelFrame) -> None:
        if frame.rgba is None:
            return
        self._latest = frame  # latest-wins; fetch happens off the loop
        if self._task is None or self._task.done():
            self._task = asyncio.create_task(self._drain())

    async def _drain(self) -> None:
        while self._latest is not None:
            frame, self._latest = self._latest, None
            planes = self._pack(frame.rgba)  # device dispatch only
            self._last = await asyncio.to_thread(
                lambda p: np.asarray(p).tobytes(), planes[0]
            )
            self._last_audio = frame.audio.tobytes()
            if self._listeners:
                pcm = self._monitor_pcm(frame.audio)
                for q in list(self._listeners):
                    try:
                        q.put_nowait(pcm)
                    except asyncio.QueueFull:
                        # slow listener: drop oldest, keep the feed live
                        try:
                            q.get_nowait()
                        except asyncio.QueueEmpty:
                            pass
                        q.put_nowait(pcm)

    @staticmethod
    def _monitor_pcm(audio: np.ndarray) -> bytes:
        """(channels, n) float planar -> stereo s16 interleaved (the
        reference's 2-ch monitor mix, screenConsumer.ts:73-80)."""
        stereo = audio[:2] if audio.shape[0] >= 2 else np.repeat(audio, 2, axis=0)
        clipped = np.clip(stereo.T, -1.0, 1.0 - 2**-15)
        return (clipped * 32767).astype("<i2").tobytes()

    @staticmethod
    def _wav_stream_header(rate: int) -> bytes:
        """WAV header with maxed sizes: players treat it as endless."""
        import struct

        return (
            b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 2, rate, rate * 4, 4, 16)
            + b"data" + struct.pack("<I", 0xFFFFFFFF)
        )

    async def _stream_audio(self, writer) -> None:
        q: asyncio.Queue = asyncio.Queue(maxsize=16)
        self._listeners.add(q)
        try:
            head = (
                "HTTP/1.1 200 OK\r\nContent-Type: audio/wav\r\n"
                "Access-Control-Allow-Origin: *\r\nConnection: close\r\n\r\n"
            )
            writer.write(head.encode())
            writer.write(self._wav_stream_header(self.fmt.audio_sample_rate))
            await writer.drain()
            while True:
                writer.write(await q.get())
                await writer.drain()
        except (ConnectionResetError, BrokenPipeError):
            pass
        finally:
            self._listeners.discard(q)
            writer.close()

    async def _handle(self, reader, writer):
        try:
            request = await reader.readline()
            while (await reader.readline()).strip():
                pass
            path = request.split()[1].decode() if len(request.split()) > 1 else "/"
            if path.startswith("/audio.wav"):
                await self._stream_audio(writer)
                return
            body = self._last_audio if path.startswith("/audio") else self._last
            if body is None:
                writer.write(b"HTTP/1.1 503 Service Unavailable\r\n\r\n")
            else:
                head = (
                    "HTTP/1.1 200 OK\r\n"
                    "Content-Type: application/octet-stream\r\n"
                    f"Content-Length: {len(body)}\r\n"
                    f"X-Width: {self.fmt.width}\r\nX-Height: {self.fmt.height}\r\n"
                    "Access-Control-Allow-Origin: *\r\n\r\n"
                )
                writer.write(head.encode() + body)
            await writer.drain()
        except (ConnectionResetError, IndexError):
            pass
        finally:
            writer.close()

    def release(self) -> None:
        if self._server:
            self._server.close()
            self._server = None
