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
