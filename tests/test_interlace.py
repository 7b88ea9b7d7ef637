"""Interlaced paths: field-pair packing and the yadif ring cadence of
an interlaced source on a field-rate channel."""

import asyncio

import jax.numpy as jnp
import numpy as np

from phaneron_tpu.config import VideoFormat
from phaneron_tpu.consumer.file_consumer import FileConsumer
from phaneron_tpu.graph.pipeline import make_interlaced_pack_program, make_pack_program
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.producer.producer import LoadParams, ProducerRegistry
from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
from phaneron_tpu.runtime.channel import Channel

TINY_I = VideoFormat("tiny_i", 2, 96, 64, 96, 50, 1, 48000, 2)


from conftest import run_async as run


def test_interlaced_pack_merges_fields():
    rng = np.random.default_rng(1)
    top = jnp.asarray(rng.random((4, 64, 96), dtype=np.float32))
    bot = jnp.asarray(rng.random((4, 64, 96), dtype=np.float32))
    pack_pair = make_interlaced_pack_program("v210", 96, 64, "709")
    pack = make_pack_program("v210", 96, 64, "709")

    merged_planes = pack_pair(top, bot)
    # line k of the packed output equals line k of packing the source
    # frame that owns that field
    top_packed = np.asarray(pack(top)[0])
    bot_packed = np.asarray(pack(bot)[0])
    out = np.asarray(merged_planes[0])
    assert np.array_equal(out[0::2], top_packed[0::2])
    assert np.array_equal(out[1::2], bot_packed[1::2])


def test_word_pair_bit_equals_rgba_pair():
    """Packed-domain field pairing (row-parity select over per-field
    packs) is bit-identical to interleave+re-encode for every
    sub_y == 1 format, and refuses 4:2:0 (whose merged-frame chroma
    mixes rows of both fields)."""
    from phaneron_tpu.graph.pipeline import make_interlaced_word_pack_program

    rng = np.random.default_rng(3)
    top = jnp.asarray(rng.random((4, 64, 96), dtype=np.float32))
    bot = jnp.asarray(rng.random((4, 64, 96), dtype=np.float32))
    for fmt_name in ("v210", "yuv422p10le", "rgba8"):
        word_pair = make_interlaced_word_pack_program(fmt_name)
        assert word_pair is not None, fmt_name
        pack = make_pack_program(fmt_name, 96, 64, "709")
        rgba_pair = make_interlaced_pack_program(fmt_name, 96, 64, "709")
        got = word_pair(pack(top), pack(bot))
        want = rgba_pair(top, bot)
        for gp, wp in zip(got, want):
            assert np.array_equal(np.asarray(gp), np.asarray(wp)), fmt_name
    for fmt_name in ("yuv420p", "nv12"):
        assert make_interlaced_word_pack_program(fmt_name) is None, fmt_name


def test_interlaced_file_consumer_halves_frame_rate(tmp_path):
    async def main():
        ch = Channel(1, TINY_I, ProducerRegistry([create_test_pattern_producer]))
        out = tmp_path / "out.v210"
        cons = FileConsumer({"path": str(out), "format": "v210"})
        await ch.add_consumer(cons)
        assert await ch.load_source(1, LoadParams("BARS"))
        ch.play(1)
        for _ in range(6):  # 6 fields -> 3 interlaced frames
            f = await ch.render_frame()
            await cons.deliver(f)
        cons.release()
        fbytes = get_format("v210").num_bytes(96, 64)[0]
        assert out.stat().st_size == 3 * fbytes

    run(main())


def test_interlaced_source_deinterlaces_on_channel():
    """An interlaced producer on a progressive channel goes through the
    yadif ring (field-rate doubling, yadif.ts:115-145)."""

    async def main():
        prog_fmt = VideoFormat("tiny_p", 1, 96, 64, 96, 50, 1, 48000, 2)
        ch = Channel(1, prog_fmt, ProducerRegistry([create_test_pattern_producer]))
        assert await ch.load_source(1, LoadParams("BARS"))
        lay = ch.layer(1)
        # mark the source interlaced (test pattern is progressive by default);
        # LOADBG binds to the background slot until PLAY promotes it
        slot = lay.next
        slot.producer.fmt = TINY_I

        async def patched_pull():
            await type(slot)._pull_video(slot)
            if slot.last is not None:
                slot.last.interlaced = True

        slot._pull_video = patched_pull
        ch.play(1)
        # ring needs 3 frames: first ticks render black (layer not ready)
        outs = [await ch.render_frame() for _ in range(8)]
        y, _, _ = get_format("v210").unpack_codes(
            [np.asarray(outs[-1].packed[0])], 96, 64
        )
        assert np.asarray(y).max() > 64  # deinterlaced bars flowing

    run(main())


def test_interlaced_pack_broadcast_geometry_1080i():
    """The 1080i5000 field-pair path at real broadcast geometry
    (1920x1080, 48-px v210 pitch): line-exact vs two single-field packs
    (macadamConsumer.ts:224-244, v210.ts:126-129), and bit-exact through
    a pack -> unpack -> pack round-trip of the interlaced frame."""
    from phaneron_tpu.graph.pipeline import make_unpack_program

    w, h = 1920, 1080
    v210 = get_format("v210")
    # two distinct field-rate frames from the reference ramp, one shifted
    unpack = make_unpack_program("v210", w, h, "709", "709")
    src_words = jnp.asarray(v210.fill_buf(w, h)[0])
    top = unpack([src_words])
    bot = unpack([jnp.roll(src_words, 1, axis=0)])

    pack_pair = make_interlaced_pack_program("v210", w, h, "709")
    pack = make_pack_program("v210", w, h, "709")

    merged = np.asarray(pack_pair(top, bot)[0])
    top_packed = np.asarray(pack(top)[0])
    bot_packed = np.asarray(pack(bot)[0])
    assert np.array_equal(merged[0::2], top_packed[0::2])
    assert np.array_equal(merged[1::2], bot_packed[1::2])

    # interlaced round-trip stays bit-exact at broadcast geometry
    rt = np.asarray(pack(unpack([jnp.asarray(merged)]))[0])
    assert np.array_equal(rt, merged)


def test_pair_deint_channel_bit_equals_ring_path():
    """Slot-side PAIR deinterlace (one kernel launch serves both field
    ticks, runtime/layer.SourceSlot._use_pair) must produce bit-identical
    channel output to the in-program yadif ring path, tick for tick —
    same parity law, same emission order (yadifCl.ts send_field)."""
    fmt_p = VideoFormat("t128p", 1, 128, 64, 128, 50, 1, 48000, 2)
    fmt_i = VideoFormat("t128i", 2, 128, 64, 128, 50, 1, 48000, 2)

    async def drive(pair: bool):
        ch = Channel(1, fmt_p, ProducerRegistry([create_test_pattern_producer]))
        lay = ch.layer(1)
        lay.pair_deint = pair
        assert await ch.load_source(1, LoadParams("BARS"))
        slot = lay.next
        slot.producer.fmt = fmt_i

        async def patched_pull():
            await type(slot)._pull_video(slot)
            if slot.last is not None:
                slot.last.interlaced = True

        slot._pull_video = patched_pull
        ch.play(1)
        outs = [await ch.render_frame() for _ in range(10)]
        await ch.shutdown()
        return [np.asarray(o.packed[0]).tobytes() for o in outs]

    ring_out = run(drive(False))
    pair_out = run(drive(True))
    assert pair_out == ring_out
    # sanity: the last ticks carry real deinterlaced picture, not black
    y, _, _ = get_format("v210").unpack_codes(
        [jnp.asarray(np.frombuffer(pair_out[-1], np.uint32).reshape(64, -1))],
        128, 64,
    )
    assert np.asarray(y).max() > 64
