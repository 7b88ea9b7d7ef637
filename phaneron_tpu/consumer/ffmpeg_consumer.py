"""FFmpeg encode consumer (gated on an ffmpeg binary).

The encode half of the reference's FFmpegConsumer
(consumer/ffmpegConsumer.ts:163-258): channel frames encode through an
ffmpeg subprocess to any container/codec/URL — file recording or a
stream another server ingests.  Without a binary the factory raises and
ADD falls back to the built-in MJPEG/file consumers.

The channel's packed planes pipe to ffmpeg as rawvideo (v210 frames are
repacked to yuv422p10le host-side via the RGBA frame when the channel
format isn't pipe-safe); audio pipes to a SECOND ffmpeg input as f32
interleaved PCM over an inherited fd (pass_fds), muxed with ``-map``
(the reference filters audio but only muxes video, ffmpegConsumer.ts:245
— this consumer completes that).  All piping runs on a worker task —
the frame loop only enqueues (latest-wins for streams, bounded for
files).  Audio writes are best-effort: an encoder that stops reading its
audio input sheds audio bytes rather than stalling video delivery.
"""

from __future__ import annotations

import asyncio
import os
import shutil
from typing import Optional

import numpy as np

from ..graph.pipeline import make_pack_program
from .consumer import ChannelFrame, Consumer

__all__ = ["FFmpegConsumer", "ffmpeg_available"]

PIPE_FORMAT = "yuv422p10le"  # rawvideo-safe (no pitch padding at %8 widths)
AUDIO_HIGH_WATER = 2 * 1024 * 1024  # shed audio beyond this transport backlog


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
        self.acodec = self.params.get("acodec", "pcm_s16le")
        self.container = self.params.get("container")
        self.realtime = bool(self.params.get("realtime", False))
        self.audio_enabled = bool(self.params.get("audio", True))
        self.proc: Optional[asyncio.subprocess.Process] = None
        self._q: asyncio.Queue = asyncio.Queue(maxsize=4)
        self._task: Optional[asyncio.Task] = None
        self._closing = False
        self._failed = False  # encoder died mid-recording: shed, don't stall
        self._aud_writer: Optional[asyncio.StreamWriter] = None
        self.dropped = 0
        self.audio_dropped = 0

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
        ]
        aud_r = aud_w = None
        if self.audio_enabled:
            aud_r, aud_w = os.pipe()
            args += [
                "-f", "f32le",
                "-ar", str(fmt.audio_sample_rate),
                "-ac", str(fmt.audio_channels),
                "-i", f"pipe:{aud_r}",
                "-map", "0:v", "-map", "1:a",
                "-c:a", self.acodec,
            ]
        args += ["-c:v", self.vcodec]
        if self.container:
            args += ["-f", self.container]
        args.append(self.url)
        self.proc = await asyncio.create_subprocess_exec(
            *args,
            stdin=asyncio.subprocess.PIPE,
            stderr=asyncio.subprocess.DEVNULL,
            pass_fds=(aud_r,) if aud_r is not None else (),
        )
        if aud_r is not None:
            os.close(aud_r)  # the child owns its copy now
            loop = asyncio.get_running_loop()
            transport, protocol = await loop.connect_write_pipe(
                asyncio.streams.FlowControlMixin, os.fdopen(aud_w, "wb")
            )
            self._aud_writer = asyncio.StreamWriter(transport, protocol, None, loop)
        self._task = asyncio.create_task(self._drain())

    async def deliver(self, frame: ChannelFrame) -> None:
        if self.proc is None or self._closing or self._failed or frame.rgba is None:
            return
        planes = self._pack(frame.rgba)  # device dispatch only
        aud = None
        if self._aud_writer is not None and frame.audio is not None:
            # planar (ch, samples) f32 -> interleaved bytes
            aud = np.ascontiguousarray(
                np.asarray(frame.audio, dtype=np.float32).T
            ).tobytes()
        item = (planes, aud)
        try:
            self._q.put_nowait(item)
        except asyncio.QueueFull:
            if self.realtime:
                self.dropped += 1  # stream semantics: never stall
                return
            await self._q.put(item)  # recording: honest backpressure

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

    def _write_audio(self, aud: Optional[bytes]) -> None:
        """Best-effort audio write: never blocks the video path.  An
        encoder ignoring its audio input just accumulates transport
        backlog, which we shed at the high-water mark."""
        w = self._aud_writer
        if w is None or aud is None:
            return
        try:
            if w.transport.get_write_buffer_size() > AUDIO_HIGH_WATER:
                self.audio_dropped += 1
                return
            w.write(aud)
        except (BrokenPipeError, ConnectionResetError, RuntimeError):
            pass

    async def _drain(self) -> None:
        proc = self.proc
        stopping = False
        while not stopping:
            item = await self._q.get()
            if item is None:
                break
            if self._failed:
                continue  # encoder died: keep consuming so deliver() never blocks
            batch = [item]
            while len(batch) < 8:
                try:
                    nxt = self._q.get_nowait()
                except asyncio.QueueEmpty:
                    break
                if nxt is None:
                    stopping = True
                    break
                batch.append(nxt)
            datas = await asyncio.to_thread(
                self._batch_to_bytes, [planes for planes, _ in batch]
            )
            try:
                for data, (_, aud) in zip(datas, batch):
                    self._write_audio(aud)
                    proc.stdin.write(data)
                    await proc.stdin.drain()
            except (BrokenPipeError, ConnectionResetError):
                # mid-recording encoder death: flag it and keep draining
                # (discarding) so deliver() returns immediately forever
                self._failed = True
        if proc.stdin:
            try:
                proc.stdin.close()
            except RuntimeError:
                pass
        if self._aud_writer is not None:
            try:
                self._aud_writer.close()
            except RuntimeError:
                pass

    def release(self) -> None:
        if self.proc is None or self._closing:
            return
        self._closing = True
        task, p = self._task, self.proc

        async def _finish():
            if task is not None:
                await task  # drain the queue, close stdin+audio -> encoder EOF
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
