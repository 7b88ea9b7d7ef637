"""bgra8: 8-bit interleaved BGRA, for screen/web consumers
(reference: src/process/bgra8.ts).  Identical math to rgba8 with the
R and B bytes swapped (bgra8.ts:53-62,96-99)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .common import FormatInfo

INFO = FormatInfo(
    name="bgra8",
    num_bits=8,
    luma_black=16,
    luma_white=235,
    chroma_range=224,
    is_rgb=True,
)

CHANNEL_ORDER = (2, 1, 0, 3)  # byte positions of R, G, B, A


def pitch(width: int) -> int:
    return width


def pitch_bytes(width: int) -> int:
    return width * 4


def num_bytes(width: int, height: int) -> list[int]:
    return [pitch_bytes(width) * height]


def plane_shapes(width: int, height: int):
    return [((height, width, 4), np.dtype(np.uint8))]


def from_bytes(data: bytes, width: int, height: int) -> list[np.ndarray]:
    return [np.frombuffer(data, dtype=np.uint8).reshape(height, width, 4)]


def unpack_rgba_codes(planes, width: int, height: int) -> jnp.ndarray:
    px = planes[0].astype(jnp.int32)
    chans = [px[:, :, i] for i in CHANNEL_ORDER]
    return jnp.stack(chans)


def pack_rgba_codes(codes: jnp.ndarray, width: int, height: int):
    inv = [CHANNEL_ORDER.index(i) for i in range(4)]
    return [jnp.stack([codes[c] for c in inv], axis=-1).astype(jnp.uint8)]


def black_buf(width: int, height: int) -> list[np.ndarray]:
    """Zeros ARE black for RGB formats (transparent black, the reference
    Black generator's zeroed buffer, blackSilence.ts:109-153)."""
    return [np.zeros((height, width, 4), dtype=np.uint8)]


def fill_buf(width: int, height: int) -> list[np.ndarray]:
    px = np.zeros((height, width, 4), dtype=np.uint8)
    r, g, b, a = 16, 32, 64, 255
    for i, v in zip(CHANNEL_ORDER, (r, g, b, a)):
        px[:, :, i] = v
    return [px]
