"""SDI CAPTURE seam end-to-end against fake backends on BOTH seams:
fake capture backend -> SDICaptureProducer -> channel unpack + yadif
field ring -> interlaced channel -> SDIConsumer field-pair pack -> fake
playout backend.

This is the reference's signature hardware loop
(macadamProducer.ts:66-264 ingest -> yadif send_field ->
macadamConsumer.ts:224-244 two-field output) with the DeckLink SDK
replaced by the two shim protocols.  Because yadif preserves primary
field lines and the interlaced pack takes each line from the field
where it IS primary, displayed frames must be BIT-EQUAL to captured
wire frames."""

import asyncio

import jax.numpy as jnp
import numpy as np
import pytest

from phaneron_tpu.config import VideoFormat
from phaneron_tpu.consumer.sdi_consumer import SDIConsumer
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.producer.producer import InvalidProducerError, LoadParams, ProducerRegistry
from phaneron_tpu.producer.sdi_capture import (
    SDICaptureProducer,
    create_sdi_capture_producer,
    set_capture_backend,
)
from phaneron_tpu.producer.test_pattern import (
    TestPatternProducer as PatternProducer,
)
from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
from phaneron_tpu.runtime.channel import Channel

FMT_I = VideoFormat("96i", 2, 96, 64, 96, 50, 1, 48000, 2)
W, H = FMT_I.width, FMT_I.height
N_FRAMES = 6


def _wire_frames(n):
    """Interlaced v210 wire frames with per-field luma markers (the
    fixture convention of utils/fixtures.write_interlaced_v210)."""
    v210 = get_format("v210")
    frames = []
    for k in range(n):
        y = np.zeros((H, W), dtype=np.int32)
        y[0::2] = 120 + 16 * k
        y[1::2] = 560 + 16 * k
        u = np.full((H, W), 512, dtype=np.int32)
        v = np.full((H, W), 512, dtype=np.int32)
        words = np.asarray(
            v210.pack_codes(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), W, H)[0]
        )
        frames.append(words)
    return frames


class FakeCaptureBackend:
    """Finite capture source: n wire frames, each carrying two fields'
    worth of s32 tone audio, then end-of-input (None)."""

    def __init__(self, n=N_FRAMES, tone=0.25):
        self.opened = None
        self.closed = False
        self.frames = _wire_frames(n)
        self._i = 0
        spf = FMT_I.samples_per_frame * 2  # two fields per wire frame
        wave = np.full(spf * FMT_I.audio_channels, tone, dtype=np.float64)
        self.audio_s32 = (wave * 2**31).astype(np.int32)

    async def open(self, device_index, fmt):
        self.opened = (device_index, fmt.name)

    async def capture_frame(self):
        if self._i >= len(self.frames):
            return None
        words = self.frames[self._i]
        self._i += 1
        return words.tobytes(), self.audio_s32, float(self._i)

    def close(self):
        self.closed = True


class FakePlayoutBackend:
    def __init__(self):
        import time

        self.opened = None
        self.frames = []
        self.closed = False
        self._start = time.monotonic()

    def hardware_time(self) -> float:
        import time

        return time.monotonic() - self._start

    async def open(self, device_index, fmt, keyer=False):
        self.opened = (device_index, fmt.name)

    async def display_frame(self, planes, audio_s32, ts):
        self.frames.append((planes, audio_s32, ts))

    def close(self):
        self.closed = True


def teardown_module():
    set_capture_backend(None)


def test_capture_to_playout_loop_bit_exact():
    capture = FakeCaptureBackend()
    playout = FakePlayoutBackend()
    set_capture_backend(lambda device, fmt: capture)
    reg = ProducerRegistry(
        [create_sdi_capture_producer, create_test_pattern_producer]
    )

    async def run():
        ch = Channel(1, FMT_I, reg)
        cons = SDIConsumer({"backend": playout, "device": 3})
        await ch.add_consumer(cons)
        ok = await ch.load_source(
            1, LoadParams("DECKLINK", extra={"device": 2})
        )
        assert ok
        ch.play(1)
        for _ in range(2 * N_FRAMES + 6):
            frame = await ch.render_frame()
            await cons.deliver(frame)
        cons.release()
        await ch.shutdown()

    asyncio.run(run())
    assert capture.opened == (2, "96i")
    assert capture.closed
    assert playout.closed
    assert len(playout.frames) >= 3

    # displayed wire frames must advance bit-exactly through the
    # captured sequence (startup displays are black while the yadif
    # ring fills)
    src_flat = [f.reshape(-1) for f in capture.frames]

    def match(words):
        flat = np.asarray(words[0]).reshape(-1)
        for k, s in enumerate(src_flat):
            if np.array_equal(flat, s):
                return k
        return -1

    first_out = first_src = -1
    for j, (planes, _a, _t) in enumerate(playout.frames):
        k = match(planes)
        if k >= 0:
            first_out, first_src = j, k
            break
    assert first_out >= 0, "no displayed frame matches any captured frame"
    chained = 0
    for j in range(first_out, len(playout.frames)):
        k = first_src + (j - first_out)
        if k >= N_FRAMES - 1:  # final ring frame has no 'next'
            break
        planes, audio_s32, _ = playout.frames[j]
        assert match(planes) == k, f"displayed frame {j}: field pairing slipped"
        # A/V pairing: the displayed frame carries both fields' tone s32
        assert audio_s32.dtype == np.int32
        assert audio_s32.shape == (
            2 * FMT_I.samples_per_frame * FMT_I.audio_channels,
        )
        assert (audio_s32 > 0.2 * 2**31).all()
        chained += 1
    assert chained >= 2


def test_decklink_falls_through_to_bars_without_backend():
    """SURVEY §2.6 substitution preserved: no registered capture
    backend -> DECKLINK lands on the test-pattern producer."""
    set_capture_backend(None)
    reg = ProducerRegistry(
        [create_sdi_capture_producer, create_test_pattern_producer]
    )

    async def run():
        prod = await reg.create_source("1-1", LoadParams("DECKLINK"), FMT_I)
        prod.release()
        return prod

    prod = asyncio.run(run())
    assert isinstance(prod, PatternProducer)


def test_factory_rejects_non_decklink_and_declined_device():
    set_capture_backend(lambda device, fmt: None)
    with pytest.raises(InvalidProducerError):
        create_sdi_capture_producer("1-1", LoadParams("BARS"), FMT_I)
    with pytest.raises(InvalidProducerError):
        create_sdi_capture_producer("1-1", LoadParams("DECKLINK"), FMT_I)
    set_capture_backend(None)


def test_amcp_device_parse_routes_to_capture():
    """PLAY 1-1 DECKLINK DEVICE 2 parses the device index into
    LoadParams.extra (the AMCP surface of the capture seam)."""
    from phaneron_tpu.control.basic_cmds import _parse_load

    lp, _ = _parse_load(["DECKLINK", "DEVICE", "2"])
    assert lp.url == "DECKLINK"
    assert lp.extra == {"device": 2}
