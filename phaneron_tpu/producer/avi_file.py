"""AVI container producer: real-container ingest without codec libs.

The reference ingests files through libavformat (probe -> stream select
-> geometry -> per-stream packet routing, producer/ffmpegProducer.ts:
98-168,321-391).  This producer does the same for the uncompressed-AVI
subset natively: container probing (utils/avi.read_avi), fourcc ->
format-library dispatch (v210 / BI_RGB->bgra8), embedded interleaved
PCM audio, SEEK/LOOP/LENGTH and the loader-thread prefetch inherited
from RawFileProducer.  Compressed media still routes to the FFmpeg
producer (gated on a real binary) via the registry fallback chain
(producer/producer.ts:62-102 semantics).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..audio.engine import QUANTUM
from ..config import VideoFormat
from ..ops.formats import get_format
from ..runtime.frame import AudioFrame
from ..runtime.stream import END, Stream, from_generator
from ..utils.avi import read_avi
from .producer import InvalidProducerError, LoadParams, Producer
from .raw_file import RawFileProducer

__all__ = ["create_avi_producer"]

# MJPG is the one COMPRESSED fourcc decoded natively (PIL's baseline
# JPEG decoder, the same dependency the mjpeg HTTP producer uses) —
# real codec media plays with zero external binaries.  Reference codec
# dispatch breadth: ffmpegProducer.ts:393-466.
_FOURCC_FORMATS = {"v210": "v210", "BI_RGB": "bgra8", "MJPG": "rgba8"}


class AviProducer(RawFileProducer):
    def __init__(self, source_id: str, params: LoadParams, fmt: VideoFormat):
        # bypass RawFileProducer.__init__ (its sidecar/extension
        # resolution); container headers are authoritative here
        Producer.__init__(self, source_id, fmt)
        url = params.url
        if not url.lower().endswith(".avi"):
            raise InvalidProducerError("not an AVI path")
        self.path = Path(url)
        if not self.path.exists():
            raise InvalidProducerError(f"no such file: {url}")
        try:
            self.info = read_avi(self.path)
        except ValueError as err:
            # compressed payloads fall through to the FFmpeg producer
            raise InvalidProducerError(f"unsupported AVI: {err}") from err
        vid = self.info.video
        if vid.fourcc not in _FOURCC_FORMATS:
            raise InvalidProducerError(f"no decoder for fourcc {vid.fourcc}")
        if vid.fourcc == "MJPG":
            try:
                from PIL import Image  # noqa: F401
            except Exception as err:  # pragma: no cover
                raise InvalidProducerError(
                    f"PIL unavailable for MJPG decode: {err}"
                ) from err
        self.pix_format = _FOURCC_FORMATS[vid.fourcc]
        self.width, self.height = vid.width, vid.height
        self.meta: dict = {}
        self.params = params
        self.loop = params.loop
        self.interlaced = False
        if abs(vid.fps - fmt.fps / fmt.fields) > 1e-6:
            from dataclasses import replace

            self.fmt = replace(
                self.fmt,
                fields=1,
                timescale=int(round(vid.fps * 1000)),
                duration=1000,
            )
        self._mm: np.memmap | None = None
        self._pending_seek: int | None = None
        self._device_cache: dict[int, list] = {}
        self._cache_ok = False

    async def initialise(self) -> None:
        fmt_mod = get_format(self.pix_format)
        expect = sum(fmt_mod.num_bytes(self.width, self.height))
        vid = self.info.video
        self._mjpg = vid.fourcc == "MJPG"
        if not self._mjpg:  # compressed chunks are variable-size
            bad = [s for _, s in vid.frames if s != expect]
            if bad:
                raise InvalidProducerError(
                    f"AVI frame size {bad[0]} != {expect} for "
                    f"{self.pix_format} {self.width}x{self.height}"
                )
        self.num_frames = len(vid.frames)
        self.frame_bytes = expect
        self._mm = np.memmap(self.path, dtype=np.uint8, mode="r")
        self._fmt_mod = fmt_mod
        self._cache_ok = (
            self.loop and self.num_frames * self.frame_bytes <= self.CACHE_BYTES
        )

    def _load_frame(self, index: int):
        """Chunk-table addressing instead of raw_file's fixed stride;
        same loader-thread contract (host read + upload off the loop)."""
        import time

        import jax

        from ..ops.formats import host_split

        stamp = time.monotonic()
        cached = self._device_cache.get(index)
        if cached is not None:
            return cached, stamp
        off, size = self.info.video.frames[index]
        raw = bytes(self._mm[off : off + size])
        if self._mjpg:
            planes = [self._decode_jpeg(raw)]
        else:
            planes = self._fmt_mod.from_bytes(raw, self.width, self.height)
            if self.info.video.bottom_up:
                planes = [np.ascontiguousarray(p[::-1]) for p in planes]
        planes = host_split(self._fmt_mod, planes)
        arrays = [jax.device_put(p) for p in planes]
        if self._cache_ok:
            self._device_cache[index] = arrays
        return arrays, stamp

    def _decode_jpeg(self, raw: bytes) -> np.ndarray:
        """One MJPG chunk -> (H, W, 4) rgba8 plane (loader thread; PIL
        decode never touches the event loop — same contract as the
        mjpeg HTTP producer's executor decode)."""
        import io as _io

        from PIL import Image

        img = Image.open(_io.BytesIO(raw)).convert("RGB")
        if img.size != (self.width, self.height):
            raise InvalidProducerError(
                f"MJPG frame {img.size} != container {self.width}x{self.height}"
            )
        rgb = np.asarray(img, dtype=np.uint8)
        px = np.empty((self.height, self.width, 4), dtype=np.uint8)
        px[:, :, :3] = rgb
        px[:, :, 3] = 255
        return px

    def audio_stream(self) -> Stream:
        aud = self.info.audio
        channels = self.fmt.audio_channels
        if aud is None:
            return super().audio_stream()  # meta empty -> silence

        rate = aud.sample_rate
        mm = np.memmap(self.path, dtype=np.uint8, mode="r")

        def decode_all() -> np.ndarray:
            parts = []
            for off, size in aud.chunks:
                raw = mm[off : off + size]
                if aud.format_tag == 3:
                    x = raw.view("<f4")
                else:  # PCM int
                    if aud.bits == 16:
                        x = raw.view("<i2").astype(np.float32) / 32768.0
                    else:
                        x = raw.view("<i4").astype(np.float32) / 2147483648.0
                parts.append(x)
            inter = np.concatenate(parts)
            n = len(inter) // aud.channels
            return inter[: n * aud.channels].reshape(n, aud.channels).T.copy()

        pcm = decode_all()  # (src_channels, samples) f32 planar

        async def gen():
            ts = 0
            off = 0
            total = pcm.shape[1]
            while not self.released:
                if off + QUANTUM > total:
                    if self.loop and total >= QUANTUM:
                        off = 0
                    else:
                        break
                chunk = pcm[:, off : off + QUANTUM]
                if chunk.shape[0] < channels:  # up-map by repetition
                    reps = -(-channels // chunk.shape[0])
                    chunk = np.tile(chunk, (reps, 1))[:channels]
                else:
                    chunk = chunk[:channels]
                off += QUANTUM
                yield AudioFrame(timestamp=ts, samples=chunk, sample_rate=rate)
                ts += 1
            yield END

        return from_generator(gen)


def create_avi_producer(source_id, params, fmt) -> AviProducer:
    return AviProducer(source_id, params, fmt)
