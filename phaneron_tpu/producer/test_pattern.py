"""Test-pattern producer: SMPTE-style bars / ramps / black + tone.

Replaces the reference's SDI capture producer in TPU environments where
no DeckLink hardware exists (SURVEY.md §2.6 macadam row: "replaced by
file/stream/test-pattern I/O").  Emits real packed frames (v210 by
default) so the full unpack path is exercised; N animation phases are
pre-packed on device at init and cycled per frame at zero per-frame
cost.  Audio is a 1 kHz tone (-18 dBFS) or silence.

URLs: BARS[@fmt] | RAMP[@fmt] | BLACK[@fmt], e.g. "BARS@yuv422p10le".
"""

from __future__ import annotations

import numpy as np

from ..audio.engine import QUANTUM
from ..config import VideoFormat
from ..graph.pipeline import make_pack_program
from ..ops.formats import FORMATS
from ..runtime.frame import AudioFrame, VideoFrame
from ..runtime.stream import END, Stream, from_generator
from .producer import InvalidProducerError, LoadParams, Producer

__all__ = ["create_test_pattern_producer"]

_PATTERNS = ("BARS", "RAMP", "BLACK")

# 100% colour bars, linear-light RGB
_BAR_COLOURS = np.array(
    [
        [1.0, 1.0, 1.0],
        [1.0, 1.0, 0.0],
        [0.0, 1.0, 1.0],
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 1.0],
        [1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, 0.0],
    ],
    dtype=np.float32,
)


def _pattern_rgba(kind: str, width: int, height: int, phase: float):
    """Pattern values are constant across each horizontal pixel PAIR so
    the packed 4:2:2 output has chroma consistent with both lumas of a
    pair; mixed pairs would produce out-of-gamut (Y, C) combinations
    that saturate in the colour matrix and cannot round-trip (the
    reference's convert_*_sat kernels clamp identically).

    Built ON DEVICE (jnp): only a width-long row is computed then
    broadcast — no multi-MB host->device pattern uploads at init."""
    import jax.numpy as jnp

    pairs = (width + 1) // 2
    px = jnp.repeat(jnp.arange(pairs) * 2, 2)[:width]
    if kind == "BARS":
        xs = ((px / width + phase) % 1.0 * 8).astype(jnp.int32).clip(0, 7)
        row = jnp.asarray(_BAR_COLOURS)[xs].T  # (3, W)
    elif kind == "RAMP":
        row = jnp.broadcast_to(((px / width + phase) % 1.0).astype(jnp.float32), (3, width))
    else:
        row = jnp.zeros((3, width), dtype=jnp.float32)
    rgb = jnp.broadcast_to(row[:, None, :], (3, height, width))
    alpha = jnp.ones((1, height, width), dtype=jnp.float32)
    return jnp.concatenate([rgb, alpha])


class TestPatternProducer(Producer):
    def __init__(self, source_id: str, params: LoadParams, fmt: VideoFormat):
        super().__init__(source_id, fmt)
        url = params.url.upper()
        if url == "DECKLINK":
            # SDI capture has no hardware in TPU environments; DECKLINK
            # URLs fall through to bars so CasparCG rundowns still run
            # (SURVEY.md §2.6 macadam row)
            url = "BARS"
        kind, _, pix = url.partition("@")
        if kind not in _PATTERNS:
            raise InvalidProducerError(f"not a test pattern: {params.url}")
        self.kind = kind
        self.pix_format = pix.lower() if pix else "v210"
        if self.pix_format not in FORMATS:
            raise InvalidProducerError(f"unknown pattern format {pix}")
        self.params = params
        self.n_phases = 1 if kind == "BLACK" else 16
        self._frames: list = []
        self.length = params.length

    async def initialise(self) -> None:
        import asyncio

        import jax
        import jax.numpy as jnp

        def build():
            w, h = self.fmt.width, self.fmt.height
            pack = make_pack_program(self.pix_format, w, h, "709")
            kind = self.kind

            # one compiled program over a traced phase scalar: a single
            # compile + n_phases executions (eager per-op dispatch would
            # cost a compile round-trip per op on remote backends)
            @jax.jit
            def packed_phase(phase):
                return pack(_pattern_rgba(kind, w, h, phase))

            # cache in word-plane form: the channel program's unpack
            # takes (4, H, G) without the per-frame device transpose
            # (ops.formats.v210.host_split_planes); one jit wrapper
            # reused for all phases (a fresh wrapper per phase pays a
            # cold dispatch cache each time on the remote backend)
            from ..ops.pallas_kernels import words_to_planes

            to_planes = jax.jit(words_to_planes)
            for i in range(self.n_phases):
                frame = packed_phase(jnp.float32(i / max(self.n_phases * 8, 1)))
                if self.pix_format == "v210":
                    frame = [to_planes(frame[0])]
                self._frames.append(frame)
            jax.block_until_ready(self._frames[-1])

        await asyncio.to_thread(build)

    def video_stream(self) -> Stream:
        async def gen():
            ts = self.params.seek
            while not self.released:
                if self.length is not None and ts - self.params.seek >= self.length:
                    break
                yield VideoFrame(
                    timestamp=ts,
                    format=self.pix_format,
                    payload=self._frames[ts % self.n_phases],
                    width=self.fmt.width,
                    height=self.fmt.height,
                    interlaced=self.fmt.interlaced,
                )
                ts += 1
            yield END

        return from_generator(gen)

    def audio_stream(self) -> Stream:
        rate = self.fmt.audio_sample_rate
        channels = self.fmt.audio_channels
        tone = self.kind != "BLACK"

        async def gen():
            pos = 0
            ts = 0
            while not self.released:
                if tone:
                    t = (pos + np.arange(QUANTUM)) / rate
                    wave = (0.125 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
                    samples = np.broadcast_to(wave, (channels, QUANTUM)).copy()
                else:
                    samples = np.zeros((channels, QUANTUM), dtype=np.float32)
                yield AudioFrame(timestamp=ts, samples=samples, sample_rate=rate)
                pos += QUANTUM
                ts += 1
            yield END

        return from_generator(gen)


def create_test_pattern_producer(source_id, params, fmt) -> TestPatternProducer:
    return TestPatternProducer(source_id, params, fmt)
