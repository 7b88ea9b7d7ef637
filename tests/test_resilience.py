"""Failure handling: producer crashes degrade to source-end; consumer
errors don't kill the channel loop (SURVEY.md §5.3)."""

import asyncio

import numpy as np

from conftest import run_async as run
from phaneron_tpu.config import VideoFormat
from phaneron_tpu.consumer.consumer import Consumer
from phaneron_tpu.producer.producer import LoadParams, Producer, ProducerRegistry
from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
from phaneron_tpu.runtime.channel import Channel
from phaneron_tpu.runtime.frame import AudioFrame, VideoFrame
from phaneron_tpu.runtime.stream import END, from_generator

TINY = VideoFormat("tiny", 1, 96, 64, 96, 50, 1, 48000, 2)


class ExplodingProducer(Producer):
    """Emits two good frames, then raises from the decode pipeline."""

    def __init__(self, source_id, params, fmt):
        super().__init__(source_id, fmt)
        if params.url != "EXPLODE":
            from phaneron_tpu.producer.producer import InvalidProducerError

            raise InvalidProducerError("no")
        self.inner = create_test_pattern_producer(source_id, LoadParams("BARS"), fmt)

    async def initialise(self):
        await self.inner.initialise()

    def video_stream(self):
        inner = self.inner.video_stream()

        async def gen():
            for _ in range(2):
                yield await inner.next()
            raise RuntimeError("decoder exploded")

        return from_generator(gen)

    def audio_stream(self):
        return self.inner.audio_stream()


class FailingConsumer(Consumer):
    async def deliver(self, frame):
        raise RuntimeError("disk full")


def test_producer_crash_degrades_to_end():
    async def main():
        reg = ProducerRegistry([ExplodingProducer, create_test_pattern_producer])
        ch = Channel(1, TINY, reg)
        assert await ch.load_source(1, LoadParams("EXPLODE"))
        ch.play(1)
        ended = []
        ch.layer(1).on_end(lambda l: ended.append(True))
        for _ in range(6):
            frame = await ch.render_frame()  # must never raise
            assert frame.packed is not None
        assert ended  # crash surfaced as a clean source-end event

    run(main())


def test_consumer_error_does_not_stop_channel():
    async def main():
        reg = ProducerRegistry([create_test_pattern_producer])
        ch = Channel(1, TINY, reg)
        await ch.add_consumer(FailingConsumer())
        assert await ch.load_source(1, LoadParams("BARS"))
        ch.play(1)
        ch.start()
        await asyncio.sleep(0.3)
        assert ch.timestamp > 5  # loop kept running through the errors
        await ch.shutdown()

    run(main())
