"""Multi-chip sharding: channels across chips, scanlines across chips.

The reference scales by running channels as independent streams on one
GPU and clustering servers over HTTP mpjpeg (SURVEY.md §2.7 P2/P8).
The TPU-native scaling strategy is a 2-D device mesh:

- axis 'ch' (channel parallelism): each channel's whole frame program
  runs on its own chip/slice — the reference's multi-channel server
  with the job-queue serialisation removed;
- axis 'sp' (spatial parallelism): a single channel's scanlines shard
  across chips for UHD/8K — unpack/colour/pack are row-local, and
  XLA inserts halo collectives for warp/yadif vertical taps over ICI.

Frames never leave HBM between stages; cross-chip ROUTE transfers ride
ICI via resharding (jax.device_put with a new sharding).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.pipeline import ChannelSpec, _channel_frame, _prewarm_coeffs

__all__ = ["make_mesh", "make_multi_channel_program", "shard_channel_params"]


def make_mesh(devices=None, ch: int | None = None, sp: int | None = None) -> Mesh:
    """Build a (ch, sp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if ch is None and sp is None:
        ch, sp = (2, n // 2) if n % 2 == 0 and n > 1 else (1, n)
    elif ch is None:
        ch = n // sp
    elif sp is None:
        sp = n // ch
    assert ch * sp == n, f"mesh {ch}x{sp} != {n} devices"
    return Mesh(np.asarray(devices).reshape(ch, sp), ("ch", "sp"))


def _plane_pspec(ndim: int) -> P:
    """Shard a per-channel plane array: leading channel axis on 'ch',
    the scanline axis on 'sp'.  Plane layouts are (C, H, ...) after
    channel stacking; rings are (C, 3, 4, H, W)."""
    if ndim == 5:  # (C, ring, rgba, H, W)
        return P("ch", None, None, "sp", None)
    if ndim >= 3:
        return P("ch", "sp", *([None] * (ndim - 2)))
    if ndim == 2:
        return P("ch", "sp")
    return P("ch")


def shard_channel_params(params, mesh: Mesh):
    """device_put a stacked multi-channel params pytree with ch/sp sharding."""

    def put(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim <= 1:  # per-channel scalars (C,)
            spec = P("ch") if leaf.ndim == 1 else P()
        elif leaf.shape[-1] in (3,) and leaf.ndim == 3:  # (C, 3, 3) matrices
            spec = P("ch", None, None)
        else:
            spec = _plane_pspec(leaf.ndim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)


def make_multi_channel_program(spec: ChannelSpec, mesh: Mesh):
    """Jit the channel frame program vmapped over a leading channel axis,
    with inputs sharded (ch, sp) — one compiled XLA program serving all
    channels across the whole mesh."""
    _prewarm_coeffs(spec)

    def step(params):
        return jax.vmap(partial(_channel_frame, spec))(params)

    return jax.jit(step)
