"""Frame value types flowing through runtime pipes.

Payloads are device (HBM) arrays; timestamps ride on every frame like
the reference's OpenCLBuffer.timestamp (SURVEY.md §5.1).  ``loadstamp``
carries the host wall-clock at ingest for end-to-end latency metrics
(the reference's dormant loadstamp mechanism made real)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

__all__ = ["VideoFrame", "AudioFrame", "RGBA_F32"]

# pseudo-format name for frames that are already unpacked linear RGBA
# (route producers fork the combiner's RGBA output, routeProducer.ts)
RGBA_F32 = "rgba_f32"


@dataclass
class VideoFrame:
    timestamp: int
    format: str  # pixel format name or RGBA_F32
    payload: Any  # list of packed plane arrays, or a (4, H, W) rgba array
    width: int
    height: int
    interlaced: bool = False
    tff: bool = True
    loadstamp: float = field(default_factory=time.monotonic)


@dataclass
class AudioFrame:
    timestamp: int
    samples: Any  # (channels, n) float32 numpy array (planar, like fltp)
    sample_rate: int = 48000
    loadstamp: float = field(default_factory=time.monotonic)
