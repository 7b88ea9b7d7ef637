"""Ahead-of-time compilation of channel programs.

The reference compiles its OpenCL kernels during loadSource, so PLAY
starts clean (SURVEY.md §3.2).  Here LOADBG/LOAD predicts the frame
program the layer will need and AOT-compiles it (jit .lower().compile()
— no execution, no dummy data transfer) off the frame loop, so the
first played frame doesn't pay the multi-second XLA compile."""

from __future__ import annotations

import asyncio

import jax
import jax.numpy as jnp

from ..ops.formats import get_format
from .pipeline import ChannelSpec, LayerSpec, make_channel_program

__all__ = ["dummy_params", "prewarm", "prewarm_jit"]


def _plane_structs(fmt_name: str, width: int, height: int):
    fmt = get_format(fmt_name)
    shapes_fn = getattr(fmt, "device_plane_shapes", fmt.plane_shapes)
    return [
        jax.ShapeDtypeStruct(shape, dtype) for shape, dtype in shapes_fn(width, height)
    ]


def _layer_struct(ls: LayerSpec, spec: ChannelSpec) -> dict:
    w, h = ls.src_size if ls.src_size else (spec.width, spec.height)
    params: dict = {}
    if ls.deinterlace:
        # opaque wire sources ring as alpha-free (3, H, W) frames
        # (runtime/layer.SourceSlot._pull_video) — the prediction must
        # match or PLAY recompiles on the first live frame
        nc = 3 if ls.src_opaque else 4
        params["src_ring"] = tuple(
            jax.ShapeDtypeStruct((nc, h, w), jnp.float32) for _ in range(3)
        )
        params["parity"] = jax.ShapeDtypeStruct((), jnp.int32)
    elif ls.src_format == "rgba_f32":
        # slot-side pair deinterlace of an opaque wire format delivers
        # alpha-free (3, H, W) fields (src_opaque records the shape)
        nc = 3 if ls.src_opaque else 4
        params["src"] = jax.ShapeDtypeStruct((nc, h, w), jnp.float32)
    else:
        params["src"] = _plane_structs(ls.src_format, w, h)
    if ls.has_transform:
        params["matrix"] = jax.ShapeDtypeStruct((3, 3), jnp.float32)
        if ls.transition != "none":
            params["matrix_b"] = jax.ShapeDtypeStruct((3, 3), jnp.float32)
    if ls.transition == "dissolve":
        params["mix"] = jax.ShapeDtypeStruct((), jnp.float32)
        if ls.deinterlace:
            # a dissolve between two interlaced sources carries the
            # second slot's ring (runtime/layer.py src_b_ring)
            nc = 3 if ls.src_opaque else 4
            params["src_b_ring"] = tuple(
                jax.ShapeDtypeStruct((nc, h, w), jnp.float32) for _ in range(3)
            )
        elif (ls.src_b_format or ls.src_format) == "rgba_f32":
            nc = 3 if ls.src_opaque else 4
            params["src_b"] = jax.ShapeDtypeStruct((nc, h, w), jnp.float32)
        else:
            params["src_b"] = _plane_structs(
                ls.src_b_format or ls.src_format, w, h
            )
    elif ls.transition == "wipe":
        params["src_b"] = _plane_structs(ls.src_b_format or ls.src_format, w, h)
        params["mask"] = _plane_structs(ls.mask_format or ls.src_format, w, h)
    return params


def dummy_params(spec: ChannelSpec) -> dict:
    return {"layers": [_layer_struct(ls, spec) for ls in spec.layers]}


def _compile(spec: ChannelSpec) -> None:
    # make_channel_program owns fused-kernel selection, and every path
    # it returns (XLA jit or monolithic Pallas adapter) exposes .lower
    program = make_channel_program(spec)
    program.lower(dummy_params(spec)).compile()


async def prewarm(spec: ChannelSpec) -> None:
    """Compile a channel program off the event loop; failures are
    logged, never raised (prediction is best-effort)."""
    try:
        await asyncio.to_thread(_compile, spec)
    except Exception as err:
        print(f"prewarm failed for {spec}: {err}")


def prewarm_jit(program, *arg_structs) -> None:
    """AOT-compile any jitted program off the event loop (consumers'
    pack programs pay multi-second first compiles otherwise — the first
    paired deliver used to stall the frame loop behind its clock).
    No-op outside a running loop (synchronous tests compile lazily)."""

    def compile_():
        try:
            program.lower(*arg_structs).compile()
        except Exception as err:
            print(f"prewarm_jit failed: {err}")

    try:
        asyncio.get_running_loop().create_task(asyncio.to_thread(compile_))
    except RuntimeError:
        pass
