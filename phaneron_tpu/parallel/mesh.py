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

__all__ = [
    "make_mesh",
    "make_multi_channel_program",
    "shard_channel_params",
    "make_sp_mesh",
    "shard_params_sp",
]


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


_REPLICATED_KEYS = {"matrix", "matrix_b", "mix", "parity", "mask_mix"}


def _param_pspec(key: str, ndim: int) -> P:
    """Partition spec for one stacked per-channel param, selected by its
    PARAM NAME (not a shape heuristic — a (C, 3, 4) colour matrix must
    never land on a plane branch).  Leading axis is always the channel
    stack ('ch'); plane-like params also shard scanlines on 'sp'."""
    if key in _REPLICATED_KEYS or ndim <= 1:
        return P(*(["ch"] + [None] * (ndim - 1))) if ndim >= 1 else P()
    if key in ("src_ring", "src_b_ring"):  # tuple leaves: (C, rgba, H, W)
        return P("ch", None, "sp", None)
    # packed planes / rgba frames: (C, H, ...) — scanlines on 'sp'
    return P("ch", "sp", *([None] * (ndim - 2)))


def shard_channel_params(params, mesh: Mesh):
    """device_put a stacked multi-channel params pytree with ch/sp
    sharding, keyed by param name via the tree path."""
    from jax.tree_util import DictKey, tree_map_with_path

    def leaf_key(path) -> str:
        for entry in reversed(path):
            if isinstance(entry, DictKey):
                return str(entry.key)
        return ""

    def put(path, leaf):
        leaf = jnp.asarray(leaf)
        spec = _param_pspec(leaf_key(path), leaf.ndim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return tree_map_with_path(put, params)


def make_sp_mesh(devices) -> Mesh:
    """1-D scanline mesh over a channel's device group: one LIVE channel's
    frame program runs row-sharded across these chips (SURVEY §2.7 P5 /
    §5.7 — the TPU answer to UHD/8K single-channel latency)."""
    return Mesh(np.asarray(devices), ("sp",))


def _sp_pspec(key: str, ndim: int) -> P:
    """Partition spec for one live-channel param under scanline sharding,
    selected by PARAM NAME (same discipline as _param_pspec: a (3, 3)
    matrix must never land on a plane branch)."""
    if key in _REPLICATED_KEYS or ndim <= 1:
        return P()
    if key in ("src_ring", "src_b_ring"):  # tuple leaves: (rgba, H, W)
        return P(None, "sp", None)
    if ndim >= 3:  # rgba frames (4, H, W)
        return P(None, "sp", *([None] * (ndim - 3)))
    return P("sp", None)  # packed planes (H, ...)


def shard_params_sp(params, mesh: Mesh):
    """device_put one channel's frame params with scanline (row)
    sharding; XLA GSPMD inserts the halo collectives for yadif/warp
    vertical taps (bit-equality proven by the multichip dryrun)."""
    from jax.tree_util import DictKey, tree_map_with_path

    def leaf_key(path) -> str:
        for entry in reversed(path):
            if isinstance(entry, DictKey):
                return str(entry.key)
        return ""

    def put(path, leaf):
        if not hasattr(leaf, "ndim"):
            leaf = jnp.asarray(leaf)
        spec = _sp_pspec(leaf_key(path), leaf.ndim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return tree_map_with_path(put, params)


def make_multi_channel_program(spec: ChannelSpec, mesh: Mesh):
    """Jit the channel frame program vmapped over a leading channel axis,
    with inputs sharded (ch, sp) — one compiled XLA program serving all
    channels across the whole mesh."""
    _prewarm_coeffs(spec)

    def step(params):
        return jax.vmap(partial(_channel_frame, spec))(params)

    return jax.jit(step)
