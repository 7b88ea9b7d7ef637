"""AOT prewarm: predicted channel programs compile at load time."""

import numpy as np

from conftest import run_async as run
from phaneron_tpu.config import VideoFormat
from phaneron_tpu.graph.pipeline import ChannelSpec, LayerSpec
from phaneron_tpu.graph.warmup import dummy_params, prewarm
from phaneron_tpu.producer.producer import LoadParams, ProducerRegistry
from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
from phaneron_tpu.runtime.channel import Channel
from phaneron_tpu.runtime.types import TransitionSpec

TINY = VideoFormat("tiny", 1, 96, 64, 96, 50, 1, 48000, 2)


def test_dummy_params_cover_spec_shapes():
    spec = ChannelSpec(
        96, 64, "v210",
        layers=(
            LayerSpec("v210", transition="dissolve", has_transform=True,
                      src_b_format="v210"),
            LayerSpec("yuv422p8"),
            LayerSpec("rgba_f32", deinterlace=True),
        ),
    )
    params = dummy_params(spec)
    assert len(params["layers"]) == 3
    assert "mix" in params["layers"][0] and "matrix" in params["layers"][0]
    assert "src_ring" in params["layers"][2]


def test_prewarm_compiles_and_program_runs():
    async def main():
        spec = ChannelSpec(96, 64, "v210", layers=(LayerSpec("v210"),))
        await prewarm(spec)  # must not raise
        from phaneron_tpu.graph.pipeline import make_channel_program
        from phaneron_tpu.ops.formats import get_format

        src = [np.asarray(p) for p in get_format("v210").fill_buf(96, 64)]
        out = make_channel_program(spec)({"layers": [{"src": src}]})
        assert np.asarray(out[0]).shape[0] == 64

    run(main())


def test_load_source_triggers_prewarm_and_renders():
    async def main():
        ch = Channel(1, TINY, ProducerRegistry([create_test_pattern_producer]))
        assert await ch.load_source(
            1, LoadParams("BARS"), transition=TransitionSpec("dissolve", 4)
        )
        ch.play(1)
        frame = await ch.render_frame()
        assert frame.packed is not None

    run(main())


def test_interlaced_prewarm_prediction_matches_layer_spec():
    """The LOADBG prediction and the live layer must agree on
    src_opaque (a v210 wire format's alpha==1 ring) — a mismatch means
    PLAY recompiles the frame program it just prewarmed."""
    from phaneron_tpu.config import VideoFormat

    tiny_i = VideoFormat("warm_i", 2, 96, 64, 96, 50, 1, 48000, 2)

    async def main():
        ch = Channel(1, tiny_i, ProducerRegistry([create_test_pattern_producer]))
        assert await ch.load_source(1, LoadParams("BARS"))
        ch.play(1)
        await ch.render_frame()
        layer = ch.layers[1]
        fields = layer.cur.layer_spec_fields()
        assert fields["deinterlace"] and fields["src_opaque"]
        # the prediction built in _prewarm_for must carry the same flag
        from phaneron_tpu.graph.pipeline import LayerSpec

        producer = layer.cur.producer
        deint = producer.fmt.interlaced and producer.pix_format != "rgba_f32"
        assert deint
        from phaneron_tpu.ops.formats import get_format

        opaque = not get_format(producer.pix_format).INFO.is_rgb
        predicted = LayerSpec(
            src_format="rgba_f32", deinterlace=True, src_opaque=opaque
        )
        assert predicted.src_opaque == fields["src_opaque"]

    run(main())
