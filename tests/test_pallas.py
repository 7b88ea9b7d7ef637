"""Fused Pallas v210 pipeline vs the XLA path: bit-identical outputs
(interpret mode on CPU; the TPU build runs the same kernel compiled)."""

import jax.numpy as jnp
import numpy as np
import pytest

from phaneron_tpu.graph.pipeline import ChannelSpec, LayerSpec, make_channel_program
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.ops.pallas_kernels import (
    make_fused_v210_program,
    planes_to_words,
    supported_spec,
    words_to_planes,
)


def test_word_plane_roundtrip():
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 2**30, size=(16, 64), dtype=np.uint32))
    planes = words_to_planes(words)
    assert planes.shape == (4, 16, 16)
    assert np.array_equal(np.asarray(planes_to_words(planes)), np.asarray(words))


@pytest.mark.parametrize("width,height", [(1920, 32), (1280, 16), (96, 64)])
def test_fused_matches_xla_single_layer(width, height):
    v210 = get_format("v210")
    src = np.asarray(v210.fill_buf(width, height)[0])

    spec = ChannelSpec(width, height, "v210", layers=(LayerSpec("v210"),))
    assert supported_spec(spec)
    xla_out = np.asarray(make_channel_program(spec)({"layers": [{"src": [src]}]})[0])

    fused = make_fused_v210_program(width, height, interpret=True)
    pallas_out = np.asarray(fused([jnp.asarray(src)]))
    assert pallas_out.shape == xla_out.shape
    assert pallas_out.tobytes() == xla_out.tobytes()


def test_fused_dissolve_matches_xla():
    width, height = 96, 16
    v210 = get_format("v210")
    a = np.asarray(v210.fill_buf(width, height)[0])
    b = np.zeros_like(a)

    spec = ChannelSpec(
        width, height, "v210",
        layers=(LayerSpec("v210", transition="dissolve", src_b_format="v210"),),
    )
    assert supported_spec(spec)
    xla_out = np.asarray(
        make_channel_program(spec)(
            {"layers": [{"src": [a], "src_b": [b], "mix": jnp.float32(0.35)}]}
        )[0]
    )
    fused = make_fused_v210_program(
        width, height, n_layers=1, transition="dissolve", interpret=True
    )
    pallas_out = np.asarray(fused([jnp.asarray(a), jnp.asarray(b)], mix=0.35))
    assert pallas_out.tobytes() == xla_out.tobytes()


def test_unsupported_specs_fall_back():
    spec = ChannelSpec(96, 64, "v210", layers=(LayerSpec("v210", has_transform=True),))
    assert not supported_spec(spec)
    spec = ChannelSpec(96, 64, "yuv422p8", layers=(LayerSpec("v210"),))
    assert not supported_spec(spec)
    spec = ChannelSpec(96, 64, "v210", layers=(LayerSpec("yuv422p8"),))
    assert not supported_spec(spec)
