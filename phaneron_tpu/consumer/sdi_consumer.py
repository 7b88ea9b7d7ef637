"""SDI playout consumer interface (reference consumer/macadamConsumer.ts).

DeckLink hardware does not exist in TPU cloud deployments (SURVEY.md
§2.6 macadam row), but the consumer interface — v210 packed frames with
two-field interlaced packing, s32 interleaved audio, hardware-clock
pacing — is kept so a host-side SDI shim (C++ against the DeckLink SDK)
can be dropped in.  Without a backend it validates config and raises at
initialise, which the registry reports cleanly."""

from __future__ import annotations

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

    async def initialise(self, fmt) -> None:
        await super().initialise(fmt)
        if self.backend is None:
            raise RuntimeError(
                "SDI output requires DeckLink hardware and a host SDI shim; "
                "none is present in this environment"
            )
        await self.backend.open(self.device_index, fmt, keyer=self.keyer)

    async def deliver(self, frame: ChannelFrame) -> None:
        audio_s32 = interleave_s32(frame.audio)
        await self.backend.display_frame(frame.packed, audio_s32, frame.timestamp)

    def release(self) -> None:
        if self.backend is not None:
            self.backend.close()
