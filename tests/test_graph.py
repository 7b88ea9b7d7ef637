"""Fused channel program: structure, equivalence to manual composition,
compile caching, and multi-chip sharding on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from phaneron_tpu.graph.pipeline import (
    ChannelSpec,
    LayerSpec,
    make_channel_program,
    make_pack_program,
    make_unpack_program,
)
from phaneron_tpu.ops import io as fio
from phaneron_tpu.ops.coeffs import make_loader, make_saver
from phaneron_tpu.ops.composite import combine
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.ops.geometry import transform_matrix

W, H = 96, 64


def v210_planes(seed=0):
    fmt = get_format("v210")
    return [np.asarray(p) for p in fmt.fill_buf(W, H)]


def test_single_layer_program_matches_manual():
    spec = ChannelSpec(W, H, "v210", layers=(LayerSpec("v210"),))
    prog = make_channel_program(spec)
    planes = v210_planes()
    out = prog({"layers": [{"src": planes}]})

    fmt = get_format("v210")
    loader = make_loader(fmt.INFO, "709", "709")
    saver = make_saver(fmt.INFO, "709")
    rgba = fio.to_rgba(fmt, planes, loader, W, H)
    black = jnp.zeros((4, H, W), jnp.float32)
    manual = fio.from_rgba(fmt, combine([black, rgba]), saver, W, H)
    assert np.array_equal(np.asarray(out[0]), np.asarray(manual[0]))


def test_dissolve_endpoint_passthrough():
    spec = ChannelSpec(
        W, H, "v210",
        layers=(LayerSpec("v210", transition="dissolve", src_b_format="v210"),),
    )
    prog = make_channel_program(spec)
    a = v210_planes()
    b = [np.zeros_like(p) for p in a]
    out_a = prog({"layers": [{"src": a, "src_b": b, "mix": jnp.float32(1.0)}]})

    plain = make_channel_program(ChannelSpec(W, H, "v210", layers=(LayerSpec("v210"),)))
    expected = plain({"layers": [{"src": a}]})
    assert np.array_equal(np.asarray(out_a[0]), np.asarray(expected[0]))


def test_transform_layer_runs():
    spec = ChannelSpec(
        W, H, "v210", layers=(LayerSpec("v210", has_transform=True, axis_aligned=True),)
    )
    prog = make_channel_program(spec)
    mat = jnp.asarray(transform_matrix(W, H, scale_x=0.5, scale_y=0.5, offset_x=0.1))
    out = prog({"layers": [{"src": v210_planes(), "matrix": mat}]})
    assert np.asarray(out[0]).shape == (H, get_format("v210").pitch_bytes(W) // 4)


def test_program_cache_and_param_stability():
    spec = ChannelSpec(W, H, "v210", layers=(LayerSpec("v210"),))
    assert make_channel_program(spec) is make_channel_program(spec)
    # same structure with different params shares the compiled program
    prog = make_channel_program(spec)
    a = prog({"layers": [{"src": v210_planes()}]})
    zeros = [np.zeros_like(p) for p in v210_planes()]
    b = prog({"layers": [{"src": zeros}]})
    assert not np.array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_modular_stage_programs():
    unpack = make_unpack_program("v210", W, H, "709", "709")
    pack = make_pack_program("v210", W, H, "709")
    planes = v210_planes()
    rgba = unpack(planes)
    out = pack(rgba)
    assert np.array_equal(np.asarray(out[0]), planes[0])


def test_multi_channel_sharded_mesh():
    from phaneron_tpu.parallel.mesh import (
        make_mesh,
        make_multi_channel_program,
        shard_channel_params,
    )

    n = len(jax.devices())
    assert n == 8, f"expected 8 virtual devices, got {n}"
    mesh = make_mesh()
    spec = ChannelSpec(
        W, H, "v210",
        layers=(LayerSpec("v210", transition="dissolve", src_b_format="v210"),),
    )
    prog = make_multi_channel_program(spec, mesh)

    n_ch = 2
    base = v210_planes()
    params = {
        "layers": [
            {
                "src": [np.stack([p] * n_ch) for p in base],
                "src_b": [np.stack([np.zeros_like(p)] * n_ch) for p in base],
                "mix": np.full((n_ch,), 0.5, np.float32),
            }
        ]
    }
    sharded = shard_channel_params(params, mesh)
    out = prog(sharded)
    arr = np.asarray(out[0])
    assert arr.shape[0] == n_ch
    # both channels identical inputs -> identical outputs
    assert np.array_equal(arr[0], arr[1])
