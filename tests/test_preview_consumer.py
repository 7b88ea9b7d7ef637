"""Web preview consumer: raw-RGBA poll endpoint + live WAV monitor
stream (the naudiodon monitoring role over HTTP,
screenConsumer.ts:73-92,218)."""

import asyncio
import struct

import jax.numpy as jnp
import numpy as np

from conftest import run_async
from phaneron_tpu.config import get_video_format
from phaneron_tpu.consumer.consumer import ChannelFrame
from phaneron_tpu.consumer.preview_consumer import PreviewConsumer


def _fmt():
    from dataclasses import replace

    return replace(get_video_format("1080p5000"), width=96, height=64)


def _frame(ts):
    t = np.arange(960, dtype=np.float32)
    tone = 0.5 * np.sin(2 * np.pi * 440 * t / 48000)
    audio = np.stack([tone, -tone]).astype(np.float32)
    rgba = jnp.full((4, 64, 96), 0.25, jnp.float32)
    return ChannelFrame(timestamp=ts, packed=None, rgba=rgba, audio=audio)


def test_preview_frame_and_wav_stream():
    async def main():
        fmt = _fmt()
        cons = PreviewConsumer({"port": 0})
        await cons.initialise(fmt)
        port = cons._server.sockets[0].getsockname()[1]
        await cons.deliver(_frame(0))
        await cons._task  # drain completes

        # raw RGBA poll
        r, w = await asyncio.open_connection("127.0.0.1", port)
        w.write(b"GET / HTTP/1.1\r\n\r\n")
        await w.drain()
        head = await r.readuntil(b"\r\n\r\n")
        assert b"200 OK" in head
        body = await r.read(96 * 64 * 4)
        assert len(body) == 96 * 64 * 4
        w.close()

        # live WAV stream: header + PCM chunks as frames deliver
        r, w = await asyncio.open_connection("127.0.0.1", port)
        w.write(b"GET /audio.wav HTTP/1.1\r\n\r\n")
        await w.drain()
        head = await r.readuntil(b"\r\n\r\n")
        assert b"audio/wav" in head

        async def pump():
            for k in range(3):
                await cons.deliver(_frame(k + 1))
                if cons._task:
                    await cons._task
                await asyncio.sleep(0)

        pump_task = asyncio.create_task(pump())
        wav = await asyncio.wait_for(r.readexactly(44 + 960 * 4), timeout=5)
        await pump_task
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        ch, rate = struct.unpack_from("<HI", wav, 22)
        assert ch == 2 and rate == 48000
        pcm = np.frombuffer(wav[44:], "<i2").reshape(-1, 2)
        assert np.abs(pcm[:, 0]).max() > 1000  # the tone, not silence
        assert np.all(pcm[:, 0] == -pcm[:, 1])  # inverted channels survive
        w.close()
        cons.release()

    run_async(main())
