"""Source geometry adaptation: SD/HD sources on a differently-sized
channel stretch-fit through the scaler (BASELINE config 2 scaler leg)."""

import numpy as np

from conftest import run_async as run
from phaneron_tpu.config import VideoFormat
from phaneron_tpu.producer.producer import LoadParams, ProducerRegistry
from phaneron_tpu.producer.raw_file import create_raw_file_producer
from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
from phaneron_tpu.runtime.channel import Channel

BIG = VideoFormat("big", 1, 192, 128, 192, 50, 1, 48000, 2)


def test_smaller_source_upscales_to_channel(tmp_path):
    async def main():
        import json

        from phaneron_tpu.ops.formats import get_format

        # write a small 96x64 clip
        small = VideoFormat("small", 1, 96, 64, 96, 50, 1, 48000, 2)
        reg = ProducerRegistry([create_test_pattern_producer, create_raw_file_producer])
        ch_small = Channel(1, small, reg)
        assert await ch_small.load_source(1, LoadParams("BARS"))
        ch_small.play(1)
        f = await ch_small.render_frame()
        clip = tmp_path / "clip.v210"
        clip.write_bytes(np.asarray(f.packed[0]).tobytes())
        (tmp_path / "clip.v210.json").write_text(
            json.dumps({"format": "v210", "width": 96, "height": 64})
        )

        # play it on a 192x128 channel
        ch_big = Channel(2, BIG, reg)
        assert await ch_big.load_source(1, LoadParams(str(clip), loop=True))
        ch_big.play(1)
        out = await ch_big.render_frame()
        plane = np.asarray(out.packed[0])
        assert plane.shape[0] == 128  # channel-sized output
        y, _, _ = get_format("v210").unpack_codes([plane], 192, 128)
        y = np.asarray(y)
        assert y.max() > 600  # upscaled bars content present
        # content reaches the full channel width (stretch-fit)
        assert y[:, -4:].mean() != y[:, :4].mean() or y.max() > 64

    run(main())


def test_interlaced_source_at_foreign_geometry_stretch_fits(tmp_path):
    """A deinterlaced (yadif-ring) source whose geometry differs from the
    channel must stretch-fit like any other source — regression for the
    deinterlace branch ignoring src_size (shape-mismatch crash)."""

    async def main():
        import json

        from phaneron_tpu.ops.formats import get_format

        small = VideoFormat("small", 1, 96, 64, 96, 50, 1, 48000, 2)
        reg = ProducerRegistry([create_test_pattern_producer, create_raw_file_producer])
        ch_small = Channel(1, small, reg)
        assert await ch_small.load_source(1, LoadParams("BARS"))
        ch_small.play(1)
        f = await ch_small.render_frame()
        clip = tmp_path / "clip_i.v210"
        clip.write_bytes(np.asarray(f.packed[0]).tobytes() * 4)
        (tmp_path / "clip_i.v210.json").write_text(
            json.dumps({"format": "v210", "width": 96, "height": 64,
                        "interlaced": True})
        )

        ch_big = Channel(2, BIG, reg)
        assert await ch_big.load_source(1, LoadParams(str(clip), loop=True))
        ch_big.play(1)
        out = None
        for _ in range(6):  # the yadif ring needs 3 source frames
            out = await ch_big.render_frame()
        plane = np.asarray(out.packed[0])
        assert plane.shape[0] == 128  # channel-sized, no shape crash
        y, _, _ = get_format("v210").unpack_codes([plane], 192, 128)
        assert np.asarray(y).max() > 64  # deinterlaced + stretch-fit content

    run(main())
