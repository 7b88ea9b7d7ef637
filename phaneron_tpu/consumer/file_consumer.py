"""Raw file consumer: packed video frames to disk (+ audio WAV).

The file-writing role of the reference's FFmpegConsumer
(consumer/ffmpegConsumer.ts) without codec libraries: writes the
channel's packed planes verbatim (v210/yuv422p8/... — playable by any
raw-video tool and bit-comparable in tests) plus a standard WAV for the
mixed audio.  A sidecar JSON records geometry for the raw-file producer
to play back.

Egress mirrors the reference's unload-queue overlap (io.ts:166-174,
SURVEY.md §7.1): deliver() only enqueues the (device-resident) frame;
a fetch thread pulls device->host into the native SPSC staging ring
(utils.hostio.StagingRing) while a writer thread drains ring->disk —
the channel's frame loop never blocks on a device fetch or a write.
A bounded queue gives honest backpressure: if the disk genuinely can't
keep pace, frames go late at the channel clock instead of silently
stalling the event loop.
"""

from __future__ import annotations

import asyncio
import json
import queue
import threading
import wave
from pathlib import Path

import numpy as np

from ..utils.hostio import StagingRing
from .consumer import ChannelFrame, Consumer

__all__ = ["FileConsumer"]

_STOP = object()


class FileConsumer(Consumer):
    def __init__(self, params: dict | None = None):
        super().__init__(params)
        self.pix_format = self.params.get("format", "v210")
        self.path = Path(self.params.get("path", "channel_out.raw"))
        self.audio_path = self.params.get("audio_path")
        self.max_frames = self.params.get("max_frames")
        # queue-full policy: 'block' (archival: backpressure the channel,
        # honest lateness) or 'drop' (real-time: never stall the chain,
        # count the skipped frames — broadcast recording semantics)
        self.on_full = self.params.get("on_full", "block")
        self.dropped = 0
        # release() drain budget: a FIRST-time compile of the batched
        # device-stack program can hold the fetch thread for minutes
        # (remote compile service); archival semantics prefer waiting
        # over dropping the tail of the recording
        self.join_fetch_s = float(self.params.get("join_fetch_s", 120.0))
        self.join_write_s = float(self.params.get("join_write_s", 30.0))
        self.leaked_threads = 0
        self.container_avi = False
        self._avi = None
        self._fh = None
        self._wav = None
        self._frames = 0
        # deep enough for the fetch thread to batch device syncs
        self._q: queue.Queue = queue.Queue(maxsize=32)
        self._ring: StagingRing | None = None
        self._audio_q: queue.Queue = queue.Queue()
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()
        # set when the fetch thread can write no more ring frames (it
        # returned, or release abandoned it): the writer's exit gate
        self._fetch_done = threading.Event()

    async def initialise(self, fmt) -> None:
        await super().initialise(fmt)
        self.interlaced = fmt.interlaced
        if self.interlaced:
            # packed-domain field pairing for row-independent formats
            # (bit-identical, no re-encode, channel stays packed-only);
            # 4:2:0 outputs fall back to packing the RGBA pair
            self._init_field_pairing(fmt)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        from ..ops.formats import get_format

        frame_bytes = sum(get_format(self.pix_format).num_bytes(fmt.width, fmt.height))
        # .avi paths wrap the same packed frames in a real container
        # (utils.avi.AviWriter, streaming) with embedded float PCM —
        # openable by standard tools AND replayable by AviProducer
        self.container_avi = self.path.suffix.lower() == ".avi"
        if self.container_avi:
            from ..utils.avi import AviWriter

            if self.audio_path:
                raise ValueError(
                    "AVI output embeds its audio; audio_path sidecar WAV "
                    "is only for raw-file output"
                )
            fourcc = {"v210": "v210", "bgra8": "BI_RGB", "bgra": "BI_RGB"}.get(
                self.pix_format
            )
            if fourcc is None:
                raise ValueError(
                    f"AVI container supports v210/bgra8, not {self.pix_format}"
                )
            self._avi = AviWriter(
                self.path, fourcc, fmt.width, fmt.height,
                fmt.fps / (2 if fmt.interlaced else 1), frame_bytes,
                bit_count=32 if fourcc == "BI_RGB" else 20,
                audio_channels=fmt.audio_channels,
                audio_rate=fmt.audio_sample_rate,
            )
            self._fh = self._avi._fh  # non-None marks the consumer open
        else:
            self._avi = None
            self._fh = open(self.path, "wb")
            sidecar = {
                "format": self.pix_format,
                "width": fmt.width,
                "height": fmt.height,
                "fps": fmt.fps / (2 if fmt.interlaced else 1),
                "interlaced": fmt.interlaced,
            }
            Path(str(self.path) + ".json").write_text(json.dumps(sidecar))
        if self.audio_path:
            self._wav = wave.open(str(self.audio_path), "wb")
            self._wav.setnchannels(fmt.audio_channels)
            self._wav.setsampwidth(2)
            self._wav.setframerate(fmt.audio_sample_rate)

        self._ring = StagingRing(frame_bytes, slots=8)
        self._threads = [
            threading.Thread(target=self._fetch_loop, name="file-fetch", daemon=True),
            threading.Thread(target=self._write_loop, name="file-write", daemon=True),
        ]
        for t in self._threads:
            t.start()

    # ------------------------------------------------------ frame loop side

    async def deliver(self, frame: ChannelFrame) -> None:
        if self._fh is None or (self.max_frames and self._frames >= self.max_frames):
            return
        planes = frame.packed
        pcms = [self._audio_pcm(frame)]
        if self.interlaced:
            # two field-rate frames -> one interlaced frame
            # (macadamConsumer.ts:224-244 two-pass field packing); the
            # pair is a device dispatch — no host copy here.  The first
            # field's audio travels WITH the pending pair so a dropped
            # video frame drops both fields' audio (no A/V drift)
            pair = self._pair_field(frame, pcms[0])
            if pair is None:
                return
            planes, top_pcm = pair
            pcms = [top_pcm, pcms[0]]
        # audio rides WITH the video item: the fetch thread enqueues it
        # into _audio_q immediately before staging the frame, so the
        # writer can never observe a frame whose audio hasn't arrived
        # (enqueueing audio here from the event-loop thread raced the
        # writer's get_nowait), and a dropped frame drops its audio too
        item = (planes, pcms)
        try:
            self._q.put_nowait(item)
        except queue.Full:
            if self.on_full == "drop":
                self.dropped += 1
                return
            # bounded backpressure off the event loop: the channel goes
            # late honestly instead of the loop blocking on a fetch
            await asyncio.to_thread(self._q.put, item)
        self._frames += 1

    def _audio_pcm(self, frame: ChannelFrame) -> bytes | None:
        if self.container_avi:
            # embedded float PCM chunks, interleaved per frame
            return np.ascontiguousarray(frame.audio.T, dtype="<f4").tobytes()
        if self._wav is None:
            return None
        pcm = np.clip(frame.audio.T, -1.0, 1.0 - 2**-15)
        return (pcm * 32767).astype("<i2").tobytes()

    # --------------------------------------------------------- worker side

    def _fetch_loop(self) -> None:
        """Device -> host into the staging ring (the 'unload queue').

        Fetches BATCH frames per device sync: each sync is a fixed
        round-trip (PCIe event on a real host; ~30 ms WAN RTT through
        this tunnel), so per-frame syncs cap throughput at ~1/RTT.
        Frames are stacked on-device (async dispatch) and pulled with
        one sync per plane per batch."""
        try:
            self._fetch_impl()
        finally:
            # happens-after every ring write this thread will ever
            # make: the writer may now exit once the ring runs dry
            self._fetch_done.set()

    def _fetch_impl(self) -> None:
        import jax.numpy as jnp

        stopping = False
        while not stopping:
            try:
                item = self._q.get(timeout=0.25)
            except queue.Empty:
                if self._stop.is_set():  # abandoned by release()
                    return
                continue
            if item is _STOP:
                return
            batch = [item]
            while len(batch) < 16:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is _STOP:
                    stopping = True
                    break
                batch.append(nxt)
            # split into power-of-two sub-batches: the device-side stack
            # compiles once per size class (a fresh shape is a
            # multi-second remote compile) and, unlike padding, no
            # duplicate frame bytes cross the host link
            pos = 0
            while pos < len(batch):
                n = 1 << (len(batch) - pos).bit_length() - 1
                part = batch[pos : pos + n]
                pos += n
                if n == 1:
                    datas = [b"".join(np.asarray(p).tobytes() for p in part[0][0])]
                else:
                    n_planes = len(part[0][0])
                    stacks = [
                        np.asarray(jnp.stack([frame[0][i] for frame in part]))
                        for i in range(n_planes)
                    ]
                    datas = [
                        b"".join(stacks[i][k].tobytes() for i in range(n_planes))
                        for k in range(n)
                    ]
                for (data, frame_item) in zip(datas, part):
                    # audio FIRST, then the frame: the writer pairs them
                    # by popping after a successful ring read
                    for pcm in frame_item[1]:
                        self._audio_q.put(pcm)
                    while not self._ring.try_write(data):
                        if self._stop.is_set():
                            return
                        self._stop.wait(0.001)

    def _write_loop(self) -> None:
        """Staging ring -> disk (+ audio, kept in frame order)."""
        while True:
            buf = self._ring.try_read() if self._ring else None
            if buf is None:
                # exit only once the FETCH side is done and the ring is
                # dry: the old `_stop and _q.empty()` gate raced the
                # fetch thread's last in-flight frame (queue drained,
                # ring not yet written) and dropped the recording tail
                if self._fetch_done.is_set():
                    return
                self._stop.wait(0.001)
                continue
            data = buf.tobytes() if isinstance(buf, np.ndarray) else buf
            if self.container_avi:
                # audio was queued before the frame entered the fetch
                # pipeline (deliver order), so its chunks are ready;
                # interlaced writes carry both fields' audio
                pcm = b""
                for _ in range(2 if self.interlaced else 1):
                    try:
                        got = self._audio_q.get_nowait()
                    except queue.Empty:
                        break
                    pcm += got or b""
                self._avi.write_frame(data, pcm or None)
            else:
                self._fh.write(data)
                self._drain_audio()

    def _drain_audio(self) -> None:
        # audio arrives per delivered frame (per FIELD when interlaced —
        # both fields' audio belongs in the WAV), independent of video
        # ring pacing; drain everything queued, order preserved
        while True:
            try:
                pcm = self._audio_q.get_nowait()
            except queue.Empty:
                return
            if pcm and self._wav is not None:
                self._wav.writeframes(pcm)

    def release(self) -> None:
        if self._fh is None:
            return
        # drain: stop accepting, let the fetch thread finish the queue,
        # then the writer exits once the fetch is done AND the ring is dry
        self._q.put(_STOP)
        fetch = self._threads[0] if self._threads else None
        writer = self._threads[1] if len(self._threads) > 1 else None
        if fetch is not None:
            fetch.join(timeout=self.join_fetch_s)
            if fetch.is_alive():
                # fetch wedged past its budget (stalled tunnel / compile
                # service): abort its spins and abandon the drain — but
                # NEVER close the ring/files under the live thread (that
                # was a use-after-free: empty output + in-thread crash)
                self._stop.set()
                self._fetch_done.set()  # writer may finish what arrived
                fetch.join(timeout=5)
        if writer is not None:
            writer.join(timeout=self.join_write_s)
        self.leaked_threads = sum(t.is_alive() for t in self._threads)
        self._threads = []
        if self.leaked_threads:
            # a wedged daemon thread still holds the ring and file
            # handles: leak them (process cleanup at exit) rather than
            # corrupt state under it; mark the consumer closed so the
            # channel stops delivering
            self._fh = None
            return
        if not self.container_avi:
            self._drain_audio()
        if self._ring is not None:
            self._ring.close()
            self._ring = None
        if self.container_avi:
            self._avi.close()  # patches RIFF/movi sizes + frame counts
        else:
            self._fh.close()
        self._fh = None
        if self._wav:
            self._wav.close()
            self._wav = None
