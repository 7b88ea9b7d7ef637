"""Image / image-sequence ingest: PNG (DEFLATE) is the second
compressed codec family that decodes natively end-to-end, widening the
executed-codec surface beyond the AVI path's baseline JPEG (reference
media ingest + codec dispatch: producer/ffmpegProducer.ts:98-168,
393-466 via libavformat's image2 demuxer)."""

import numpy as np
import pytest

from conftest import run_async
from phaneron_tpu.config import get_video_format
from phaneron_tpu.producer.image_seq import ImageSeqProducer, create_image_seq_producer
from phaneron_tpu.producer.producer import InvalidProducerError, LoadParams
from phaneron_tpu.runtime.stream import END

FMT = get_video_format("1080p5000")
W, H = 96, 64


def _write_pngs(tmp_path, n=5, name="f%04d.png", start=0, alpha=False):
    """n distinct solid-colour PNGs; returns their RGBA ground truth."""
    from PIL import Image

    colours = []
    for k in range(n):
        rgba = np.zeros((H, W, 4), np.uint8)
        rgba[:, :, 0] = 40 * k + 10
        rgba[:, :, 1] = 255 - 40 * k
        rgba[:, :, 2] = 128
        rgba[:, :, 3] = 200 if alpha else 255
        colours.append(rgba)
        img = Image.fromarray(rgba if alpha else rgba[:, :, :3])
        img.save(tmp_path / (name % (start + k)))
    return colours


def _collect(prod, limit=64):
    async def drive():
        await prod.initialise()
        vs = prod.video_stream()
        got = []
        while len(got) < limit:
            f = await vs.next()
            if f is END:
                break
            got.append(f)
        prod.release()
        return got

    return run_async(drive())


def _rgba(frame):
    return np.asarray(frame.payload[0])


def test_png_sequence_bit_exact(tmp_path):
    """PNG is lossless: decoded frames must equal the source pixels
    EXACTLY (unlike the JPEG tolerance tests)."""
    want = _write_pngs(tmp_path, n=5)
    prod = ImageSeqProducer("1-1", LoadParams(url=str(tmp_path / "f%04d.png")), FMT)
    got = _collect(prod)
    assert len(got) == 5
    assert prod.pix_format == "rgba8"
    assert (prod.width, prod.height) == (W, H)
    for k, f in enumerate(got):
        assert (_rgba(f) == want[k]).all()


def test_png_alpha_survives(tmp_path):
    """RGBA PNGs keep their alpha plane — image keys/logos depend on it."""
    want = _write_pngs(tmp_path, n=2, alpha=True)
    prod = ImageSeqProducer("1-1", LoadParams(url=str(tmp_path / "f%04d.png")), FMT)
    got = _collect(prod)
    assert (_rgba(got[0])[:, :, 3] == 200).all()
    assert (_rgba(got[1]) == want[1]).all()


def test_glob_and_directory_expansion(tmp_path):
    _write_pngs(tmp_path, n=3, name="img_%d.png")
    for url in (str(tmp_path / "*.png"), str(tmp_path)):
        prod = ImageSeqProducer("1-1", LoadParams(url=url), FMT)
        assert len(prod.files) == 3, url


def test_printf_pattern_starting_at_one(tmp_path):
    _write_pngs(tmp_path, n=4, start=1)
    prod = ImageSeqProducer("1-1", LoadParams(url=str(tmp_path / "f%04d.png")), FMT)
    assert len(prod.files) == 4


def test_still_image_holds_forever(tmp_path):
    """A single image never ends — the reference's still behaviour."""
    _write_pngs(tmp_path, n=1, name="logo%d.png")
    prod = ImageSeqProducer(
        "1-1", LoadParams(url=str(tmp_path / "logo0.png")), FMT
    )
    assert prod.still and prod.loop
    got = _collect(prod, limit=7)
    assert len(got) == 7  # did not END


def test_seek_loop_length(tmp_path):
    want = _write_pngs(tmp_path, n=5)
    prod = ImageSeqProducer(
        "1-1",
        LoadParams(url=str(tmp_path / "f%04d.png"), seek=3, loop=True, length=4),
        FMT,
    )
    got = _collect(prod)
    idx = [
        next(i for i, w in enumerate(want) if (_rgba(f) == w).all()) for f in got
    ]
    assert idx == [3, 4, 3, 4]


def test_sequence_json_fps(tmp_path):
    _write_pngs(tmp_path, n=3)
    (tmp_path / "sequence.json").write_text('{"fps": 25, "loop": true}')
    prod = ImageSeqProducer("1-1", LoadParams(url=str(tmp_path / "f%04d.png")), FMT)
    assert prod.loop
    assert prod.fmt.timescale == 25000 and prod.fmt.fields == 1


def test_rejects_non_images(tmp_path):
    with pytest.raises(InvalidProducerError):
        ImageSeqProducer("1-1", LoadParams(url=str(tmp_path / "x.mov")), FMT)
    with pytest.raises(InvalidProducerError):
        ImageSeqProducer("1-1", LoadParams(url="BARS"), FMT)
    with pytest.raises(InvalidProducerError):
        ImageSeqProducer("1-1", LoadParams(url=str(tmp_path / "*.png")), FMT)


def test_geometry_mismatch_raises(tmp_path):
    from PIL import Image

    _write_pngs(tmp_path, n=2)
    Image.new("RGB", (W // 2, H)).save(tmp_path / "f0001.png")  # overwrite
    prod = ImageSeqProducer("1-1", LoadParams(url=str(tmp_path / "f%04d.png")), FMT)

    async def drive():
        await prod.initialise()
        vs = prod.video_stream()
        await vs.next()
        with pytest.raises(InvalidProducerError):
            await vs.next()
        prod.release()

    run_async(drive())


def test_registry_dispatch_and_channel_end_to_end(tmp_path):
    """PLAY a PNG sequence through a real Channel: registry fallback
    picks this producer and the composited output carries the PNG's
    colour — the full compressed-ingest -> composite -> pack path with
    zero codec binaries."""
    from dataclasses import replace

    from phaneron_tpu.ops.formats import get_format
    from phaneron_tpu.producer.producer import ProducerRegistry
    from phaneron_tpu.producer.raw_file import create_raw_file_producer
    from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
    from phaneron_tpu.runtime.channel import Channel

    _write_pngs(tmp_path, n=3)
    tiny = replace(FMT, width=W, height=H)
    reg = ProducerRegistry(
        [
            create_test_pattern_producer,
            create_image_seq_producer,
            create_raw_file_producer,
        ]
    )

    async def drive():
        ch = Channel(1, tiny, reg)
        assert await ch.load_source(
            1, LoadParams(url=str(tmp_path / "f%04d.png"), loop=True)
        )
        ch.play(1)
        assert isinstance(ch.layers[1].cur.producer, ImageSeqProducer)
        frame = await ch.render_frame()
        out = np.asarray(frame.packed[0])
        await ch.shutdown()
        return out

    out = run_async(drive())
    import jax

    from phaneron_tpu.ops import io as fio
    from phaneron_tpu.ops.coeffs import make_loader
    from phaneron_tpu.ops.formats import host_split

    # decode both the channel output (v210) and the expected source
    # pixels (rgba8) to LINEAR light with the package's own loaders and
    # compare there — transfer/matrix conventions stay single-sourced
    v210 = get_format("v210")
    lin = np.asarray(
        jax.jit(
            lambda p: fio.to_rgba(v210, [p], make_loader(v210.INFO, "709", "709",
                                                         "analytic"), W, H)
        )(out)
    )
    rgba8 = get_format("rgba8")
    src = np.zeros((H, W, 4), np.uint8)
    src[:, :, 0], src[:, :, 1], src[:, :, 2], src[:, :, 3] = 10, 255, 128, 255
    want = np.asarray(
        jax.jit(
            lambda p: fio.to_rgba(rgba8, [p], make_loader(rgba8.INFO, "709", "709",
                                                          "analytic"), W, H)
        )(host_split(rgba8, [src])[0])
    )
    got_px = lin[:3, H // 2, W // 2] if lin.shape[0] == 4 else lin[H // 2, W // 2, :3]
    want_px = (
        want[:3, H // 2, W // 2] if want.shape[0] == 4 else want[H // 2, W // 2, :3]
    )
    assert np.abs(got_px - want_px).max() <= 0.03, (got_px, want_px)
