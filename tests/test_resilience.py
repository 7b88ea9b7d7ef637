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


def test_zero_frame_failure_restarts():
    """A producer that loads OK but dies BEFORE its first frame must
    still fire the end event and engage the restart chain (the
    frames_seen>0 guard used to swallow this case)."""

    async def main():
        creations = {"n": 0}

        def flaky_factory(source_id, params, fmt):
            if params.url != "INSTAFAIL":
                from phaneron_tpu.producer.producer import InvalidProducerError

                raise InvalidProducerError("no")
            prod = create_test_pattern_producer(source_id, LoadParams("BARS"), fmt)
            creations["n"] += 1
            if creations["n"] == 1:
                # first incarnation crashes on the very first pull
                async def gen():
                    raise RuntimeError("died before first frame")
                    yield  # pragma: no cover

                prod.video_stream = lambda: from_generator(gen)
            return prod

        ch = Channel(1, TINY, ProducerRegistry([flaky_factory]))
        assert await ch.load_source(1, LoadParams("INSTAFAIL"))
        ch.play(1)
        for _ in range(60):
            await ch.render_frame()
            await asyncio.sleep(0.01)
            if creations["n"] >= 2:
                break
        assert creations["n"] >= 2, "zero-frame failure never restarted"

    run(main())


def test_failed_producer_restarts_with_backoff():
    """A producer that crashes mid-stream is reloaded with the same
    LoadParams (bounded attempts) — elastic recovery on top of the
    reference's degrade-to-black (SURVEY §5.3)."""

    async def main():
        import asyncio

        import numpy as np

        from phaneron_tpu.config import VideoFormat
        from phaneron_tpu.ops.formats import get_format
        from phaneron_tpu.producer.producer import ProducerRegistry
        from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
        from phaneron_tpu.runtime.channel import Channel
        from phaneron_tpu.producer.producer import LoadParams

        TINY = VideoFormat("tiny", 1, 96, 64, 96, 50, 1, 48000, 2)
        creations = {"n": 0}

        def flaky_factory(source_id, params, fmt):
            if not params.url.upper().startswith("FLAKY"):
                from phaneron_tpu.producer.producer import InvalidProducerError

                raise InvalidProducerError("not flaky")
            prod = create_test_pattern_producer(source_id, LoadParams("BARS"), fmt)
            creations["n"] += 1
            if creations["n"] == 1:
                # first incarnation dies after two frames
                real_stream = prod.video_stream

                def broken_stream():
                    s = real_stream()
                    count = {"k": 0}
                    orig_next = s.next

                    async def next_():
                        count["k"] += 1
                        if count["k"] > 2:
                            raise RuntimeError("decoder crashed")
                        return await orig_next()

                    s.next = next_
                    return s

                prod.video_stream = broken_stream
            return prod

        ch = Channel(1, TINY, ProducerRegistry([flaky_factory]))
        assert await ch.load_source(1, LoadParams("FLAKY"))
        ch.play(1)
        v210 = get_format("v210")
        saw_recovery = False
        for _ in range(90):
            f = await ch.render_frame()
            await asyncio.sleep(0.01)
            if creations["n"] >= 2:
                y, _, _ = v210.unpack_codes([np.asarray(f.packed[0])], 96, 64)
                if np.asarray(y).max() > 64:
                    saw_recovery = True
                    break
        assert creations["n"] >= 2, "failed source was never reloaded"
        assert saw_recovery, "restarted source never produced frames"

    run(main())
