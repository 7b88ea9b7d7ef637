"""Attribute the 4x1080i50 default-load tick (bench.interlaced_channels_step)
to its stages, on hardware, with the bench's dependent-chain method.

Per channel per FRAME PERIOD (two 50 Hz field ticks) the step runs:
  - 8 v210 unpacks (fresh interlaced frame per source, 3-channel RGBA)
  - 8 PAIR yadif deinterlaces (one launch -> both field ticks)
  - 2 channel-program ticks (4 premixed dissolve pair warps -> over ->
    v210 pack, packed-only)
  - 1 field-pair word interleave

This tool measures each stage for ALL FOUR channels as one jitted step
(same salting discipline as the bench), printing ms per frame PERIOD
and per field tick.  Run on the TPU: python tools/i4_ablate.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import chain_ms, log
from phaneron_tpu.graph.pipeline import (
    ChannelSpec,
    LayerSpec,
    make_channel_program,
    make_interlaced_word_pack_program,
    make_unpack_program,
    make_yadif_pair_field_program,
)
from phaneron_tpu.ops.formats import get_format, host_split
from phaneron_tpu.ops.geometry import transform_matrix
from phaneron_tpu.ops.pallas_warp import bucket_of
from phaneron_tpu.runtime.frame import RGBA_F32

W, H, NCH = 1920, 1080, 4


def main():
    v210 = get_format("v210")
    unpack = make_unpack_program("v210", W, H, "709", "709", channels=3)
    pair_deint = make_yadif_pair_field_program(H, W, True, channels=3)
    pack_pair = make_interlaced_word_pack_program("v210")
    base = np.asarray(host_split(v210, v210.fill_buf(W, H))[0])

    mref = transform_matrix(W, H, scale_x=0.9, scale_y=0.9, offset_x=0.02)
    layer = LayerSpec(
        RGBA_F32, transition="dissolve", has_transform=True, axis_aligned=True,
        src_b_format=RGBA_F32, warp_bucket=bucket_of(mref), src_opaque=True,
    )
    spec = ChannelSpec(
        W, H, "v210", layers=(layer,) * 4, emit_rgba=False, pallas_stages=True
    )
    prog = make_channel_program(spec)

    words = [
        jax.device_put(np.roll(base, 131 * c + 13 * s + 7, axis=1))
        for c in range(NCH)
        for s in range(8)
    ]
    rng = np.random.default_rng(0)
    frames = [
        jax.device_put(rng.random((3, H, W), dtype=np.float32))
        for _ in range(NCH * 8 * 3)
    ]
    mats = [
        jax.device_put(
            jnp.asarray(
                transform_matrix(
                    W, H, scale_x=0.9, scale_y=0.9,
                    offset_x=0.02 + 0.003 * i + 0.0007 * c,
                )
            )
        )
        for c in range(NCH)
        for i in range(4)
    ]
    fb = frames[0].nbytes  # one 3-channel RGBA f32 frame
    wb = words[0].nbytes  # one v210 word-plane frame

    # -- stage 1: 32 unpacks (8 per channel per period)
    @jax.jit
    def s_unpack(x, *ws):
        bit = jnp.uint32(0)
        for k in range(NCH * 8):
            src = x if k == 0 else ws[k]
            out = unpack([src])
            bit ^= out.reshape(-1)[0].astype(jnp.uint32) & jnp.uint32(1)
        return x ^ bit

    ms, _ = chain_ms(
        lambda x: s_unpack(x, *words), words[0], n_small=2, n_large=8,
        floor_bytes=NCH * 8 * (wb + fb),
    )
    log(f"unpack x{NCH * 8}: {ms:.3f} ms/period ({ms / 2:.3f} /field-tick)")

    # -- stage 2: 32 pair deinterlaces
    @jax.jit
    def s_deint(x, *fs):
        bit = x.reshape(-1)[0].astype(jnp.uint32) & jnp.uint32(1)
        carrier = fs[0] + bit.astype(jnp.float32) * 1e-7
        out_bit = jnp.uint32(0)
        for k in range(NCH * 8):
            prev = carrier if k == 0 else fs[3 * k]
            a, b = pair_deint(prev, fs[3 * k + 1], fs[3 * k + 2])
            out_bit ^= a.reshape(-1)[0].astype(jnp.uint32) & jnp.uint32(1)
            out_bit ^= b.reshape(-1)[0].astype(jnp.uint32) & jnp.uint32(1)
        return x ^ out_bit

    ms, _ = chain_ms(
        lambda x: s_deint(x, *frames), words[0], n_small=2, n_large=8,
        floor_bytes=NCH * 8 * 5 * fb,
    )
    log(f"pair-deint x{NCH * 8}: {ms:.3f} ms/period ({ms / 2:.3f} /field-tick)")

    # -- stage 3: 8 channel-program ticks (2 per channel per period)
    @jax.jit
    def s_tick(x, *flat):
        fs = flat[: NCH * 8 * 2]
        ms_ = flat[NCH * 8 * 2 :]
        bit = x.reshape(-1)[0].astype(jnp.uint32) & jnp.uint32(1)
        out_bit = jnp.uint32(0)
        for c in range(NCH):
            for t in (0, 1):
                layers = []
                for i in range(4):
                    a = fs[(c * 8 + 2 * i) * 2 + t]
                    if c == 0 and t == 0 and i == 0:
                        a = a + bit.astype(jnp.float32) * 1e-7
                    layers.append(
                        {
                            "src": a,
                            "src_b": fs[(c * 8 + 2 * i + 1) * 2 + t],
                            "matrix": ms_[c * 4 + i],
                            "mix": jnp.float32(0.4 + 0.05 * i),
                        }
                    )
                packed = prog({"layers": layers})
                out_bit ^= packed[0].reshape(-1)[0] & jnp.uint32(1)
        return x ^ out_bit

    tick_args = frames[: NCH * 8 * 2] + mats
    ms, _ = chain_ms(
        lambda x: s_tick(x, *tick_args), words[0], n_small=2, n_large=8,
        floor_bytes=NCH * 2 * (8 * fb + wb),
    )
    log(f"channel tick x{NCH * 2}: {ms:.3f} ms/period ({ms / 2:.3f} /field-tick)")

    # -- stage 4: 4 word-pair interleaves
    packed_frames = [
        jax.block_until_ready(
            jax.jit(lambda sw: jnp.stack(jnp.split(sw.reshape(H, -1), 4, 1)))(w)
        )
        for w in words[: 2 * NCH]
    ]

    @jax.jit
    def s_interleave(x, *ps):
        bit = x.reshape(-1)[0] & jnp.uint32(1)
        out_bit = jnp.uint32(0)
        for c in range(NCH):
            a = [ps[2 * c] ^ (bit if c == 0 else jnp.uint32(0))]
            b = [ps[2 * c + 1]]
            pair = pack_pair(a, b)
            out_bit ^= pair[0].reshape(-1)[0] & jnp.uint32(1)
        return x ^ out_bit

    ms, _ = chain_ms(
        lambda x: s_interleave(x, *packed_frames), words[0], n_small=4, n_large=16,
        floor_bytes=NCH * 3 * wb,
    )
    log(f"word interleave x{NCH}: {ms:.3f} ms/period ({ms / 2:.3f} /field-tick)")


if __name__ == "__main__":
    main()
