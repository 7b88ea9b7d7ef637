"""SDI playout consumer (reference consumer/macadamConsumer.ts).

DeckLink hardware does not exist in TPU cloud deployments (SURVEY.md
§2.6 macadam row), so the hardware seam is a ``backend`` object (a
host-side C++ shim against the DeckLink SDK in production, a fake in
tests).  Everything ABOVE the seam is the real consumer logic:

- interlaced formats receive field-rate RGBA frames from the channel
  and pack FIELD PAIRS into one v210 output frame (the functional form
  of the reference's two write passes, macadamConsumer.ts:224-244);
- audio converts fltp -> interleaved s32 per displayed frame
  (macadamConsumer.ts:135-158), both fields' chunks concatenated so
  A/V travel together;
- delivery paces against the BACKEND's hardware clock — the software
  genlock of macadamConsumer.ts:174-197 (waitHW): each frame waits for
  its slot on the output clock, and frames arriving more than a period
  behind are counted late (the reference's late-frame warning,
  macadamConsumer.ts:186-193).

Backend protocol (the macadam surface the shim must provide):
    await open(device_index, fmt, keyer=False)
    hardware_time() -> float   # seconds on the output genlock clock
    await display_frame(packed_planes, audio_s32, timestamp)
    close()
Without a backend the consumer validates config and raises at
initialise, which the registry reports cleanly.
"""

from __future__ import annotations

import asyncio

import numpy as np

from ..audio.engine import interleave_s32
from .consumer import ChannelFrame, Consumer

__all__ = ["SDIConsumer"]


class SDIConsumer(Consumer):
    pix_format = "v210"

    def __init__(self, params: dict | None = None):
        super().__init__(params)
        self.device_index = int(self.params.get("device", 1))
        self.keyer = self.params.get("keyer", False)
        self.latency = self.params.get("latency", "normal")  # macadamConsumer.ts:32-50
        self.backend = self.params.get("backend")  # injected hardware shim
        self.late_frames = 0
        self._t0 = None  # hardware-clock origin of frame 0
        self._displayed = 0

    async def initialise(self, fmt) -> None:
        await super().initialise(fmt)
        if self.backend is None:
            raise RuntimeError(
                "SDI output requires DeckLink hardware and a host SDI shim; "
                "none is present in this environment"
            )
        self.interlaced = fmt.interlaced
        if self.interlaced:
            # packed-domain field pairing when the format's rows pack
            # independently (bit-identical, no re-encode, and the
            # channel keeps emitting packed-only — no RGBA round trip)
            self._init_field_pairing(fmt)
        # displayed-frame period: interlaced channels tick at field rate,
        # the wire carries one frame per two fields (config.ts:43-78)
        self.frame_period = fmt.duration / fmt.timescale * (2 if fmt.interlaced else 1)
        await self.backend.open(self.device_index, fmt, keyer=self.keyer)

    async def deliver(self, frame: ChannelFrame) -> None:
        planes = frame.packed
        audio = frame.audio
        if self.interlaced:
            pair = self._pair_field(frame, frame.audio)
            if pair is None:
                return
            planes, top_audio = pair
            audio = np.concatenate([top_audio, frame.audio], axis=1)
        await self._wait_hw()
        audio_s32 = interleave_s32(audio)
        await self.backend.display_frame(planes, audio_s32, frame.timestamp)
        self._displayed += 1

    async def _wait_hw(self) -> None:
        """Software genlock (macadamConsumer.ts:174-197): wait until this
        frame's slot on the backend's hardware clock; count (and never
        block on) frames that miss their slot by more than HALF a period
        — a frame later than that displays visibly off-cadence, so it is
        counted and the origin resyncs rather than compounding lateness
        (the reference's late-frame warning, macadamConsumer.ts:186-193).

        Backends may provide an awaitable ``wait_until(t)`` (a virtual
        clock in tests, a hardware wait in shims); otherwise the wait is
        an asyncio.sleep against ``hardware_time()``."""
        now = self.backend.hardware_time()
        if self._t0 is None:
            self._t0 = now
            return
        slot = self._t0 + self._displayed * self.frame_period
        if now + 1e-4 < slot:
            waiter = getattr(self.backend, "wait_until", None)
            if waiter is not None:
                await waiter(slot)
            else:
                await asyncio.sleep(slot - now)
        elif now > slot + 0.5 * self.frame_period:
            self.late_frames += 1
            # resync rather than compounding lateness forever
            self._t0 = now - self._displayed * self.frame_period

    def release(self) -> None:
        if self.backend is not None:
            self.backend.close()
