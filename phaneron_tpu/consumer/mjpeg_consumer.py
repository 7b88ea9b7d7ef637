"""MJPEG HTTP streaming consumer — the cluster transport.

Parity with the reference FFmpegConsumer (consumer/ffmpegConsumer.ts:
163-258): frames encode to JPEG and stream as multipart/x-mixed-replace
(mpjpeg) on an HTTP port; a peer server's producer ingests the stream.
JPEG encoding uses PIL on the host (the reference used libavcodec's
mjpeg encoder on the CPU too); colour conversion + 8-bit packing stay
on the TPU via the rgba8 pack program."""

from __future__ import annotations

import asyncio
import io
from typing import Optional

import numpy as np

from ..graph.pipeline import make_pack_program
from .consumer import ChannelFrame, Consumer

__all__ = ["MJPEGConsumer"]

BOUNDARY = b"phaneronframe"


class MJPEGConsumer(Consumer):
    pix_format = None

    def __init__(self, params: dict | None = None):
        super().__init__(params)
        self.port = int(self.params.get("port", 3000))
        self.quality = int(self.params.get("quality", 85))
        self._clients: list[asyncio.StreamWriter] = []
        self._server: Optional[asyncio.AbstractServer] = None
        self._latest: Optional[ChannelFrame] = None
        self._task: Optional[asyncio.Task] = None
        self.dropped = 0

    async def initialise(self, fmt) -> None:
        await super().initialise(fmt)
        self._pack = make_pack_program("rgba8", fmt.width, fmt.height, "sRGB")
        self._server = await asyncio.start_server(self._handle, "0.0.0.0", self.port)

    async def _handle(self, reader, writer):
        try:
            await reader.readline()
            while (await reader.readline()).strip():
                pass
            writer.write(
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: multipart/x-mixed-replace; boundary=" + BOUNDARY + b"\r\n"
                b"Access-Control-Allow-Origin: *\r\n\r\n"
            )
            await writer.drain()
            self._clients.append(writer)
        except ConnectionResetError:
            writer.close()

    async def deliver(self, frame: ChannelFrame) -> None:
        """Latest-wins: enqueue and return — the blocking device fetch
        and JPEG encode run off the event loop in the drain task (the
        frame loop never stalls on a consumer, SURVEY.md §7.1)."""
        if frame.rgba is None or not self._clients:
            return
        if self._latest is not None:
            self.dropped += 1  # encoder slower than channel rate
        self._latest = frame
        if self._task is None or self._task.done():
            self._task = asyncio.create_task(self._drain())

    def _encode(self, planes) -> Optional[bytes]:
        try:
            from PIL import Image
        except ImportError:
            return None
        rgba = np.asarray(planes[0])  # device -> host (worker thread)
        img = Image.fromarray(rgba[:, :, :3], "RGB")
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=self.quality)
        return buf.getvalue()

    async def _drain(self) -> None:
        while self._latest is not None:
            frame, self._latest = self._latest, None
            planes = self._pack(frame.rgba)  # device dispatch only
            jpeg = await asyncio.to_thread(self._encode, planes)
            if jpeg is None:
                return
            part = (
                b"--" + BOUNDARY + b"\r\n"
                b"Content-Type: image/jpeg\r\n"
                + f"Content-Length: {len(jpeg)}\r\n\r\n".encode()
                + jpeg
                + b"\r\n"
            )
            dead = []
            for w in self._clients:
                try:
                    w.write(part)
                    await w.drain()
                except (ConnectionResetError, BrokenPipeError):
                    dead.append(w)
            for w in dead:
                self._clients.remove(w)
                w.close()

    def release(self) -> None:
        for w in self._clients:
            w.close()
        self._clients.clear()
        if self._server:
            self._server.close()
            self._server = None
