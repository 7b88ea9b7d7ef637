"""Consumer base and registry (reference consumer/consumer.ts:30-153).

A consumer attaches to a channel and receives one ChannelFrame per tick:
the packed planes in the channel's primary format, optionally the
composited RGBA (when the consumer packs its own format), and the mixed
audio chunk.  Registry maps name -> factory with add/remove index
bookkeeping (ADD/REMOVE commands, basicCmds.ts:189-219).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Callable, Optional

import numpy as np

from ..config import VideoFormat

__all__ = ["ChannelFrame", "Consumer", "ConsumerRegistry"]


@dataclass
class ChannelFrame:
    timestamp: int
    packed: Optional[list]  # planes in the channel's primary out format
    rgba: Optional[Any]  # (4, H, W) device array when emitted
    audio: np.ndarray  # (channels, samples_per_frame) f32
    width: int = 0
    height: int = 0
    packed_format: str = "v210"
    loadstamp: Optional[float] = None  # earliest source ingest time
    # (end-to-end latency metric, SURVEY.md §5.1)


class Consumer(ABC):
    """One output endpoint.  pix_format None means the consumer needs
    the RGBA frame and packs/encodes itself; needs_rgba forces RGBA
    delivery even when the packed format matches (interlaced packing)."""

    pix_format: Optional[str] = "v210"
    needs_rgba: bool = False

    def __init__(self, params: dict[str, Any] | None = None):
        self.params = params or {}
        self.index: int = 0

    async def initialise(self, fmt: VideoFormat) -> None:
        self.fmt = fmt

    @abstractmethod
    async def deliver(self, frame: ChannelFrame) -> None: ...

    def release(self) -> None:
        pass


class ConsumerRegistry:
    def __init__(self):
        self.factories: dict[str, Callable[[dict], Consumer]] = {}

    def register(self, name: str, factory: Callable[[dict], Consumer]) -> None:
        self.factories[name] = factory
        # aliases as in the reference: file/stream -> ffmpeg (basicCmds.ts:195)

    def create(self, name: str, params: dict[str, Any] | None = None) -> Consumer:
        key = name.lower()
        if key not in self.factories:
            raise KeyError(f"unknown consumer '{name}'")
        return self.factories[key](params or {})
