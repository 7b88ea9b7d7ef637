"""Runtime integration: producers -> layers -> channel engine ->
consumers, transitions, routes — on CPU with tiny formats."""

import asyncio
import json

import numpy as np
import pytest

from phaneron_tpu.config import VideoFormat
from phaneron_tpu.consumer.file_consumer import FileConsumer
from phaneron_tpu.producer.producer import LoadParams, ProducerRegistry
from phaneron_tpu.producer.raw_file import create_raw_file_producer
from phaneron_tpu.producer.route import make_route_factory
from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
from phaneron_tpu.runtime.channel import Channel
from phaneron_tpu.runtime.types import TransitionSpec

TINY = VideoFormat("tiny", 1, 96, 64, 96, 50, 1, 48000, 2)


def make_registry(channels=None):
    factories = [create_test_pattern_producer, create_raw_file_producer]
    if channels is not None:
        factories.insert(0, make_route_factory(lambda n: channels.get(n)))
    return ProducerRegistry(factories)


from conftest import run_async as run


def test_empty_channel_renders_black():
    async def main():
        ch = Channel(1, TINY, make_registry())
        frame = await ch.render_frame()
        assert frame.packed is not None
        # black v210: Y=64 Cb=Cr=512 everywhere
        from phaneron_tpu.ops.formats import get_format

        y, cb, cr = get_format("v210").unpack_codes(
            [np.asarray(frame.packed[0])], 96, 64
        )
        assert np.all(np.asarray(y) == 64)
        assert np.all(np.asarray(cb) == 512)
        assert frame.audio.shape == (2, 960)
        assert np.all(frame.audio == 0)

    run(main())


def test_play_bars_and_deliver_to_file(tmp_path):
    async def main():
        ch = Channel(1, TINY, make_registry())
        out = tmp_path / "out.v210"
        consumer = FileConsumer({"path": str(out), "format": "v210"})
        await ch.add_consumer(consumer)

        ok = await ch.load_source(1, LoadParams("BARS"))
        assert ok
        assert ch.play(1)
        for _ in range(5):
            frame = await ch.render_frame()
            await consumer.deliver(frame)
        consumer.release()

        meta = json.loads((str(out) + ".json") and open(str(out) + ".json").read())
        assert meta["width"] == 96
        data = out.read_bytes()
        from phaneron_tpu.ops.formats import get_format

        fbytes = get_format("v210").num_bytes(96, 64)[0]
        assert len(data) == 5 * fbytes
        # bars are not black
        y, cb, cr = get_format("v210").unpack_codes(
            [np.frombuffer(data[:fbytes], np.uint32).reshape(64, -1)], 96, 64
        )
        assert np.asarray(y).max() > 64

    run(main())


def test_dissolve_transition_promotes():
    async def main():
        ch = Channel(1, TINY, make_registry())
        assert await ch.load_source(1, LoadParams("BARS"))
        ch.play(1)
        await ch.render_frame()
        # LOADBG black with dissolve over 4 frames, then PLAY
        assert await ch.load_source(
            1, LoadParams("BLACK"), preview=False, transition=TransitionSpec("dissolve", 4)
        )
        lay = ch.layer(1)
        assert lay.next is not None
        ch.play(1)
        assert lay.transition is not None
        for _ in range(4):
            await ch.render_frame()
        assert lay.transition is None  # promoted
        assert lay.next is None
        # now fully BLACK: output luma ~64
        frame = await ch.render_frame()
        from phaneron_tpu.ops.formats import get_format

        y, _, _ = get_format("v210").unpack_codes([np.asarray(frame.packed[0])], 96, 64)
        assert np.all(np.asarray(y) == 64)

    run(main())


def test_route_between_channels():
    async def main():
        channels = {}
        reg = make_registry(channels)
        ch1 = Channel(1, TINY, reg)
        ch2 = Channel(2, TINY, reg)
        channels[1] = ch1
        channels[2] = ch2

        assert await ch1.load_source(1, LoadParams("BARS"))
        ch1.play(1)
        # route channel 1 into channel 2 layer 1
        assert await ch2.load_source(1, LoadParams("route://1"))
        ch2.play(1)

        # drive both channels; ch1 feeds the tap, ch2 consumes
        out2 = None
        for _ in range(4):
            await ch1.render_frame()
            out2 = await ch2.render_frame()
        from phaneron_tpu.ops.formats import get_format

        y, _, _ = get_format("v210").unpack_codes([np.asarray(out2.packed[0])], 96, 64)
        assert np.asarray(y).max() > 64  # bars arrived through the route

    run(main())


def test_pause_freezes_frame():
    async def main():
        ch = Channel(1, TINY, make_registry())
        assert await ch.load_source(1, LoadParams("RAMP"))
        ch.play(1)
        await ch.render_frame()
        ch.pause(1)
        f1 = await ch.render_frame()
        f2 = await ch.render_frame()
        assert np.array_equal(np.asarray(f1.packed[0]), np.asarray(f2.packed[0]))
        ch.resume(1)
        f3 = await ch.render_frame()
        assert not np.array_equal(np.asarray(f2.packed[0]), np.asarray(f3.packed[0]))

    run(main())


def test_length_limited_source_ends():
    async def main():
        ch = Channel(1, TINY, make_registry())
        assert await ch.load_source(1, LoadParams("BARS", length=3))
        ch.play(1)
        ended = []
        ch.layer(1).on_end(lambda l: ended.append(True))
        for _ in range(6):
            await ch.render_frame()
        assert ended

    run(main())


def test_raw_file_roundtrip_via_producer(tmp_path):
    async def main():
        # write bars with the file consumer, play it back with the
        # raw-file producer, expect identical packed bytes
        ch = Channel(1, TINY, make_registry())
        out = tmp_path / "clip.v210"
        cons = FileConsumer({"path": str(out), "format": "v210"})
        await ch.add_consumer(cons)
        assert await ch.load_source(1, LoadParams("BARS"))
        ch.play(1)
        frames = []
        for _ in range(3):
            f = await ch.render_frame()
            frames.append(np.asarray(f.packed[0]).copy())
            await cons.deliver(f)
        cons.release()

        ch2 = Channel(2, TINY, make_registry())
        out2 = tmp_path / "replay.v210"
        cons2 = FileConsumer({"path": str(out2), "format": "v210"})
        await ch2.add_consumer(cons2)
        assert await ch2.load_source(1, LoadParams(str(out)))
        ch2.play(1)
        for _ in range(3):
            f = await ch2.render_frame()
            await cons2.deliver(f)
        cons2.release()

        a = out.read_bytes()
        b = out2.read_bytes()
        assert a == b  # bit-exact through write -> read -> composite -> write

    run(main())


def test_wipe_transition_with_mask(tmp_path):
    async def main():
        ch = Channel(1, TINY, make_registry())
        assert await ch.load_source(1, LoadParams("BARS"))
        ch.play(1)
        await ch.render_frame()
        # wipe to BLACK using a RAMP mask over 4 frames
        assert await ch.load_source(
            1, LoadParams("BLACK"),
            transition=TransitionSpec("wipe", 4, mask_url="RAMP"),
        )
        lay = ch.layer(1)
        assert lay.mask is not None
        ch.play(1)
        frames = [await ch.render_frame() for _ in range(6)]
        assert lay.transition is None  # completed + promoted
        from phaneron_tpu.ops.formats import get_format

        y, _, _ = get_format("v210").unpack_codes(
            [np.asarray(frames[-1].packed[0])], 96, 64
        )
        assert np.all(np.asarray(y) == 64)  # fully wiped to black

    run(main())


def test_nv12_raw_file_source(tmp_path):
    async def main():
        import json

        from phaneron_tpu.ops.formats import get_format

        nv12 = get_format("nv12")
        planes = nv12.fill_buf(96, 64)
        clip = tmp_path / "clip.nv12"
        clip.write_bytes(b"".join(np.asarray(p).tobytes() for p in planes) * 3)
        (tmp_path / "clip.nv12.json").write_text(
            json.dumps({"format": "nv12", "width": 96, "height": 64})
        )
        ch = Channel(1, TINY, make_registry())
        assert await ch.load_source(1, LoadParams(str(clip), loop=True))
        ch.play(1)
        out = await ch.render_frame()
        y, _, _ = get_format("v210").unpack_codes([np.asarray(out.packed[0])], 96, 64)
        assert np.asarray(y).max() > 64  # nv12 ramp content flowed through

    run(main())


def test_25fps_source_cadence_on_50hz_channel(tmp_path):
    """A 25 fps file on a 50 Hz channel shows each source frame exactly
    twice (the reference's frame-rate doubling, ffmpegProducer.ts:557-566;
    SourceSlot._pull_ratio)."""

    async def main():
        import json

        from phaneron_tpu.ops.formats.v210 import pack_codes

        n_src = 4
        frames = []
        for i in range(n_src):
            yv = np.full((64, 96), 100 + 100 * i, np.int32)
            c = np.full((64, 96), 512, np.int32)
            frames.append(np.asarray(pack_codes(yv, c, c, 96, 64)[0]))
        clip = tmp_path / "clip.v210"
        clip.write_bytes(b"".join(f.tobytes() for f in frames))
        (tmp_path / "clip.v210.json").write_text(
            json.dumps({"format": "v210", "width": 96, "height": 64, "fps": 25})
        )

        ch = Channel(1, TINY, make_registry())  # TINY is a 50 Hz channel
        assert await ch.load_source(1, LoadParams(str(clip)))
        ch.play(1)
        from phaneron_tpu.ops.formats import get_format

        seen = []
        for _ in range(2 * n_src):
            out = await ch.render_frame()
            y, _, _ = get_format("v210").unpack_codes(
                [np.asarray(out.packed[0])], 96, 64
            )
            seen.append(int(np.asarray(y)[0, 0]))
        expected = [100 + 100 * (k // 2) for k in range(2 * n_src)]
        assert seen == expected  # each source frame exactly twice, in order

    run(main())


def test_dissolve_audio_is_crossfade_not_duck():
    """A tone present on both transition sources must hold level through
    a dissolve (equal-gain crossfade), not drop 6 dB like the
    reference's amix/2 (transitioner.ts:83-121)."""

    async def main():
        ch = Channel(1, TINY, make_registry())
        assert await ch.load_source(1, LoadParams("BARS"))
        ch.play(1)
        ref = await ch.render_frame()
        ref_rms = float(np.sqrt(np.mean(np.square(ref.audio))))
        assert ref_rms > 0.05  # BARS carries a tone

        assert await ch.load_source(
            1, LoadParams("BARS"), transition=TransitionSpec("dissolve", 6)
        )
        ch.play(1)
        for _ in range(6):
            f = await ch.render_frame()
            rms = float(np.sqrt(np.mean(np.square(f.audio))))
            # BARS tone is frame-periodic (20 cycles / 960 samples), so
            # cur and next are coherent: the crossfade must stay within
            # 1 dB of the steady level throughout
            assert abs(20 * np.log10(rms / ref_rms)) < 1.0

    run(main())


def test_warm_spec_dispatch_runs_inline():
    """First dispatch of a structure hops to a worker thread (compile
    isolation); warm ticks dispatch inline — no per-frame thread
    hand-off on the hot path."""

    async def main():
        import threading

        ch = Channel(1, TINY, ProducerRegistry([create_test_pattern_producer]))
        loop_thread = threading.get_ident()
        on_loop = []
        orig = ch._dispatch

        def record(spec, contribs):
            on_loop.append(threading.get_ident() == loop_thread)
            return orig(spec, contribs)

        ch._dispatch = record
        assert await ch.load_source(1, LoadParams("BARS"))
        ch.play(1)
        for _ in range(4):
            await ch.render_frame()
        assert on_loop[0] is False  # cold structure: off the event loop
        assert all(on_loop[1:])  # warm structure: inline
        # a structural change (new layer) goes back to the thread once
        assert await ch.load_source(2, LoadParams("RAMP"))
        ch.play(2)
        n = len(on_loop)
        for _ in range(3):
            await ch.render_frame()
        assert on_loop[n] is False
        assert all(on_loop[n + 1 :])

    run(main())
