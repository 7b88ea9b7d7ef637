"""Synthetic media fixtures shared by tests and serve benches.

Deterministic interlaced v210 sequences with per-field luma markers —
the build's analogue of the reference's fillBuf test ramps
(v210.ts:206-236), extended to carry field-line provenance so an
ingest->yadif->interlaced-output chain can be asserted bit-exactly."""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..audio.engine import QUANTUM

__all__ = ["write_interlaced_v210"]


def write_interlaced_v210(
    tmp: Path,
    width: int = 1920,
    height: int = 1080,
    n_frames: int = 6,
    tone: float = 0.25,
    audio_channels: int = 8,
    name: str = "clip",
) -> tuple[Path, list[np.ndarray]]:
    """Write `<name>.v210` (+ sidecar JSON + side PCM tone) where frame k
    carries luma 120+16k on top-field lines and 560+16k on bottom-field
    lines, chroma null.  Returns (path, word arrays per frame)."""
    from ..ops.formats import get_format

    v210 = get_format("v210")
    tmp = Path(tmp)
    path = tmp / f"{name}.v210"
    frames: list[np.ndarray] = []
    with open(path, "wb") as fh:
        for k in range(n_frames):
            y = np.zeros((height, width), dtype=np.int32)
            y[0::2] = 120 + 16 * k  # top field lines
            y[1::2] = 560 + 16 * k  # bottom field lines
            u = np.full((height, width), 512, dtype=np.int32)
            v = np.full((height, width), 512, dtype=np.int32)
            words = np.asarray(
                v210.pack_codes(
                    jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), width, height
                )[0]
            )
            frames.append(words)
            fh.write(words.tobytes())
    pcm_path = tmp / f"{name}.pcm"
    blocks = max(1, n_frames) * 48000 // (25 * QUANTUM) + 4
    chunk = np.full((audio_channels, QUANTUM), tone, dtype=np.float32)
    with open(pcm_path, "wb") as fh:
        for _ in range(blocks):
            fh.write(chunk.tobytes())
    (tmp / f"{name}.v210.json").write_text(
        json.dumps(
            {
                "format": "v210",
                "width": width,
                "height": height,
                "interlaced": True,
                "audio": f"{name}.pcm",
                "audio_channels": audio_channels,
            }
        )
    )
    return path, frames
