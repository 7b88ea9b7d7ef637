"""Native hostio library: build, bind, and verify against numpy."""

import numpy as np

from phaneron_tpu.utils import hostio


def test_native_builds():
    assert hostio.native_available(), "g++ toolchain expected in this image"


def test_v210_word_plane_roundtrip():
    rng = np.random.default_rng(1)
    words = rng.integers(0, 2**30, size=(32, 64 * 4), dtype=np.uint32)
    planes = hostio.v210_deinterleave(words)
    assert planes.shape == (4, 32, 64)
    # plane k holds every 4th word
    assert np.array_equal(planes[1], words.reshape(32, 64, 4)[:, :, 1])
    back = hostio.v210_interleave(planes)
    assert np.array_equal(back, words)


def test_uv_interleave_roundtrip():
    rng = np.random.default_rng(2)
    c = rng.integers(0, 256, size=(8, 32), dtype=np.uint8)
    u, v = hostio.uv_deinterleave(c)
    assert np.array_equal(u, c[..., 0::2])
    assert np.array_equal(v, c[..., 1::2])
    assert np.array_equal(hostio.uv_interleave(u, v), c)


def test_pcm_roundtrip():
    rng = np.random.default_rng(3)
    planar = (rng.random((4, 256), dtype=np.float32) - 0.5) * 1.5  # incl. clipping
    s32 = hostio.pcm_f32_to_s32(planar)
    assert s32.shape == (1024,)
    back = hostio.pcm_s32_to_f32(s32, 4)
    clipped = np.clip(planar, -1.0, 1.0)
    assert np.max(np.abs(back - clipped)) < 1e-6


def test_staging_ring():
    ring = hostio.StagingRing(slot_bytes=16, slots=2)
    assert len(ring) == 0
    assert ring.try_write(b"a" * 16)
    assert ring.try_write(b"b" * 16)
    assert not ring.try_write(b"c" * 16)  # full
    assert len(ring) == 2
    first = ring.try_read()
    assert first is not None and bytes(first[:1]) == b"a"
    assert ring.try_write(b"c" * 16)  # slot freed
    assert bytes(ring.try_read()[:1]) == b"b"
    assert bytes(ring.try_read()[:1]) == b"c"
    assert ring.try_read() is None
    ring.close()
