"""Cluster transport loopback: channel 1's MJPEG HTTP consumer feeds
channel 2's MJPEG producer — the phaneron->phaneron story (SURVEY.md
§2.7 P8) on localhost, like the reference's default
http://localhost:3000/ loopback."""

import asyncio

import numpy as np

from conftest import run_async as run
from phaneron_tpu.config import VideoFormat
from phaneron_tpu.consumer.mjpeg_consumer import MJPEGConsumer
from phaneron_tpu.producer.mjpeg import create_mjpeg_producer
from phaneron_tpu.producer.producer import LoadParams, ProducerRegistry
from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
from phaneron_tpu.runtime.channel import Channel

TINY = VideoFormat("tiny", 1, 96, 64, 96, 50, 1, 48000, 2)


def test_mjpeg_loopback_between_channels():
    async def main():
        reg = ProducerRegistry([create_test_pattern_producer, create_mjpeg_producer])

        # upstream: bars -> mjpeg http on :13000
        ch1 = Channel(1, TINY, reg)
        mjpeg_out = MJPEGConsumer({"port": 13000, "quality": 95})
        await ch1.add_consumer(mjpeg_out)
        assert await ch1.load_source(1, LoadParams("BARS"))
        ch1.play(1)

        # downstream: ingest the stream
        ch2 = Channel(2, TINY, reg)
        load_task = asyncio.create_task(
            ch2.load_source(1, LoadParams("http://127.0.0.1:13000/"))
        )
        # drive ch1 so the HTTP client can connect and receive parts
        for _ in range(3):
            f = await ch1.render_frame()
            await mjpeg_out.deliver(f)
            await asyncio.sleep(0.02)
        assert await load_task
        ch2.play(1)

        out = None
        for _ in range(6):
            f = await ch1.render_frame()
            await mjpeg_out.deliver(f)
            out = await ch2.render_frame()
            await asyncio.sleep(0.01)

        from phaneron_tpu.ops.formats import get_format

        y, _, _ = get_format("v210").unpack_codes([np.asarray(out.packed[0])], 96, 64)
        # bars made it across the HTTP hop (JPEG-lossy, so just expect
        # clearly non-black content with bright regions)
        assert np.asarray(y).max() > 700
        mjpeg_out.release()
        ch2.layer(1).clear()

    run(main())
