"""Channel-per-chip placement and cross-chip ROUTE transfers on the
virtual 8-device mesh (ICI on real pods)."""

import jax
import numpy as np

from conftest import run_async as run
from phaneron_tpu.config import VideoFormat
from phaneron_tpu.producer.producer import LoadParams, ProducerRegistry
from phaneron_tpu.producer.route import make_route_factory
from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
from phaneron_tpu.runtime.channel import Channel

TINY = VideoFormat("tiny", 1, 96, 64, 96, 50, 1, 48000, 2)


def test_channels_pinned_to_devices_with_cross_chip_route():
    devices = jax.devices()
    assert len(devices) >= 2

    async def main():
        channels = {}
        reg = ProducerRegistry(
            [make_route_factory(lambda n: channels.get(n)), create_test_pattern_producer]
        )
        ch1 = Channel(1, TINY, reg, device=devices[0])
        ch2 = Channel(2, TINY, reg, device=devices[1])
        channels.update({1: ch1, 2: ch2})

        assert await ch1.load_source(1, LoadParams("BARS"))
        ch1.play(1)
        assert await ch2.load_source(1, LoadParams("route://1"))
        ch2.play(1)

        out2 = None
        for _ in range(4):
            f1 = await ch1.render_frame()
            out2 = await ch2.render_frame()

        # each channel's output lives on its own device
        assert devices[0] in f1.packed[0].devices()
        assert devices[1] in out2.packed[0].devices()

        from phaneron_tpu.ops.formats import get_format

        y, _, _ = get_format("v210").unpack_codes([np.asarray(out2.packed[0])], 96, 64)
        assert np.asarray(y).max() > 64  # bars crossed the chip boundary

    run(main())


def test_heterogeneous_channel_structures_tick_concurrently():
    """Two channels with DIFFERENT frame-program structures, pinned to
    different devices, tick concurrently (no shared-structure
    constraint — each chip compiles its own fused program; SURVEY §2.7
    P2)."""
    devices = jax.devices()
    assert len(devices) >= 2

    async def main():
        import asyncio

        from phaneron_tpu.runtime.types import TransitionSpec

        reg = ProducerRegistry([create_test_pattern_producer])
        ch1 = Channel(1, TINY, reg, device=devices[0])
        ch2 = Channel(2, TINY, reg, device=devices[1])

        # ch1: plain single layer.  ch2: DVE transform + mid-dissolve —
        # a structurally different fused program.
        assert await ch1.load_source(1, LoadParams("BARS"))
        ch1.play(1)
        assert await ch2.load_source(1, LoadParams("RAMP"))
        ch2.play(1)
        assert ch2.layer(1).set_fill(0.1, 0.1, 0.8, 0.8)
        await ch2.render_frame()
        assert await ch2.load_source(
            1, LoadParams("BARS"), transition=TransitionSpec("dissolve", 8)
        )
        ch2.play(1)

        # concurrent ticks: both channels render in parallel
        f1 = f2 = None
        for _ in range(4):
            f1, f2 = await asyncio.gather(ch1.render_frame(), ch2.render_frame())
        assert devices[0] in f1.packed[0].devices()
        assert devices[1] in f2.packed[0].devices()
        s1 = ch1._last_layer_specs[1]
        s2 = ch2._last_layer_specs[1]
        assert s1 != s2  # genuinely different structures
        assert s2.transition == "dissolve" and s2.has_transform

    run(main())


def test_route_between_different_geometries():
    """ROUTE a channel into a differently-sized channel: the forked RGBA
    tap stretch-fits the destination (combiner output is whole-frame,
    routeProducer.ts:51-132 + the scaler leg)."""

    async def main():
        from phaneron_tpu.config import VideoFormat
        from phaneron_tpu.producer.route import make_route_factory

        BIG = VideoFormat("big", 1, 192, 128, 192, 50, 1, 48000, 2)
        channels = {}
        reg = ProducerRegistry(
            [make_route_factory(lambda n: channels.get(n)), create_test_pattern_producer]
        )
        ch1 = Channel(1, TINY, reg)
        ch2 = Channel(2, BIG, reg)
        channels.update({1: ch1, 2: ch2})
        assert await ch1.load_source(1, LoadParams("BARS"))
        ch1.play(1)
        assert await ch2.load_source(1, LoadParams("route://1"))
        ch2.play(1)
        out = None
        for _ in range(4):
            await ch1.render_frame()
            out = await ch2.render_frame()
        plane = np.asarray(out.packed[0])
        assert plane.shape[0] == 128  # destination geometry
        from phaneron_tpu.ops.formats import get_format

        y, _, _ = get_format("v210").unpack_codes([plane], 192, 128)
        assert np.asarray(y).max() > 64  # routed bars, stretch-fit

    run(main())
