"""Compositing ops: N-layer combine, transitions, mix, wipe.

Functional equivalents of the reference's generated OpenCL kernels
(src/process/combine.ts, transition.ts, mix.ts, wipe.ts) over planar
(4, H, W) linear RGBA frames.  All scalar parameters (mix, wipe
progress) are traced values, so animating them never recompiles.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "combine",
    "combine_rgb",
    "combine_masked",
    "dissolve",
    "wipe_mask",
    "mix_frames",
    "wipe_h",
    "transparent",
]


def transparent(height: int, width: int) -> jnp.ndarray:
    """Transparent black — the identity of the 'over' operator, used to
    pad layer lists to a bucketed arity without changing the result."""
    return jnp.zeros((4, height, width), dtype=jnp.float32)


def _over(out: jnp.ndarray, layer: jnp.ndarray) -> jnp.ndarray:
    """One 'over' step as a single fused elementwise expression.

    k4 = (k, k, k, 0) built by channel-index select instead of stacking
    per-channel slices — a stack of slices lowers to XLA concatenates
    that break elementwise fusion on TPU (measured 4x the bandwidth
    cost of the fused form at UHD).  RGB: out*k + layer (identical
    arithmetic); alpha: 0*out + layer = layer exactly."""
    ch = jnp.arange(4, dtype=jnp.int32)[:, None, None]
    k4 = jnp.where(ch < 3, 1.0 - layer[3:4], 0.0)
    return out * k4 + layer


def combine(layers: list[jnp.ndarray]) -> jnp.ndarray:
    """Premultiplied-alpha 'over' accumulation, bottom to top.

    out_i = out_{i-1} * (1 - alpha_i) + layer_i for RGB; the alpha
    channel takes the top layer's alpha (the reference multiplies the
    accumulated alpha by 0 each step: k4 = (k,k,k,0), combine.ts:47-59).
    """
    if not layers:
        raise ValueError("combine requires at least one layer")
    out = layers[0]
    for layer in layers[1:]:
        out = _over(out, layer)
    return out


def combine_rgb(layers: list) -> jnp.ndarray:
    """Premultiplied 'over' accumulation -> (3, H, W) RGB only.

    Each layer is either a (4, H, W) RGBA frame or an
    ``(rgb (3, H, W), wy (H,), wx (W,))`` tuple — an opaque warped
    layer whose alpha is the SEPARABLE outer product wy[:, None] * wx
    (pallas_warp.warp_alpha_vectors: an axis-aligned warp of the
    constant-1 plane factorises exactly).  The black base is implicit
    (over black = the layer itself); the result carries no alpha — for
    v210/planar-out channels whose pack never reads it.  The broadcast
    outer product fuses into the elementwise over chain (no alpha
    plane ever materialises in HBM)."""
    if not layers:
        raise ValueError("combine_rgb requires at least one layer")

    def split(entry):
        if isinstance(entry, tuple):
            rgb, wy, wx = entry
            return rgb, wy[:, None] * wx[None, :]
        return entry[:3], entry[3]

    out, _ = split(layers[0])
    for entry in layers[1:]:
        rgb, a = split(entry)
        out = out * (1.0 - a)[None, :, :] + rgb
    return out


def combine_masked(layers: list[jnp.ndarray], enables: jnp.ndarray) -> jnp.ndarray:
    """Fixed-arity combine with per-layer enable flags.

    The channel graph compiles for a bucketed maximum layer count; when
    fewer layers are live, the spare slots are disabled via traced
    booleans so the result — including the top-layer-alpha semantics —
    is exactly combine(active_layers) with no recompile (SURVEY.md §7.4
    'dynamic graph topology without recompile').

    ``enables``: (num_layers,) bool; enables[0] is ignored (the base
    layer, normally the channel's black frame, is always present).
    """
    out = layers[0]
    for i, layer in enumerate(layers[1:], start=1):
        out = jnp.where(enables[i], _over(out, layer), out)
    return out


def dissolve(in0: jnp.ndarray, in1: jnp.ndarray, mix: jnp.ndarray) -> jnp.ndarray:
    """transition_dissolve: out = in0 * mix + in1 * (1 - mix)
    (transition.ts:60-65).  ``mix`` runs 1 -> 0 over the transition
    (transitioner.ts:170)."""
    return in0 * mix + in1 * (1.0 - mix)


def wipe_mask(in0: jnp.ndarray, in1: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """transition_wipe: per-pixel blend by the mask frame's R/luma channel
    (transition.ts:66-74): out = in1 * m + in0 * (1 - m)."""
    m = mask[0]
    return in1 * m + in0 * (1.0 - m)


def mix_frames(in0: jnp.ndarray, in1: jnp.ndarray, mix: jnp.ndarray) -> jnp.ndarray:
    """Plain linear mix (mix.ts:24-46)."""
    return in0 * mix + in1 * (1.0 - mix)


def wipe_h(in0: jnp.ndarray, in1: jnp.ndarray, wipe: jnp.ndarray) -> jnp.ndarray:
    """Hard-edge horizontal wipe: x > w * wipe ? in1 : in0 (wipe.ts:24-48)."""
    w = in0.shape[-1]
    x = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    return jnp.where(x > w * wipe, in1, in0)
