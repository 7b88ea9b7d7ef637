"""Decompose the interlaced channel tick cost on hardware.

Measures, via the bench's dependent-chain method, each stage of one
interlaced 1080i channel field tick in isolation:
  - 4 v210 unpacks (the per-tick share of the period's 8)
  - 8 yadif ring deinterlaces (dispatching Pallas on TPU)
  - 4 fused dissolve pair warps (on pre-deinterlaced frames)
  - both field-pair forms: the packed-domain word interleave the
    consumers now use, and the RGBA re-encode it replaced
Run on the TPU: python tools/interlace_profile.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import chain_ms
from phaneron_tpu.graph.pipeline import (
    make_interlaced_pack_program,
    make_interlaced_word_pack_program,
    make_unpack_program,
    make_yadif_program,
)
from phaneron_tpu.ops.formats import get_format, host_split
from phaneron_tpu.ops.geometry import transform_matrix
from phaneron_tpu.ops.pallas_warp import bucket_of, make_warp_pair_program

W, H = 1920, 1080


def main():
    v210 = get_format("v210")
    unpack = make_unpack_program("v210", W, H, "709", "709")
    base = np.asarray(host_split(v210, v210.fill_buf(W, H))[0])
    words = [jax.device_put(np.roll(base, 13 * s + 7, axis=1)) for s in range(8)]
    rng = np.random.default_rng(0)
    frames = [
        jax.device_put(rng.random((4, H, W), dtype=np.float32)) for _ in range(24)
    ]
    mat = transform_matrix(W, H, scale_x=0.9, scale_y=0.9, offset_x=0.02)
    mj = jax.device_put(jnp.asarray(mat))
    bucket = bucket_of(mat)
    pair = make_warp_pair_program(H, W, bucket, True, interpret=False)
    pack_pair = make_interlaced_pack_program("v210", W, H, "709")

    # -- 4 unpacks
    @jax.jit
    def unpacks4(x, *ws):
        bit = jnp.uint32(0)
        for s in range(4):
            src = x if s == 0 else ws[s]
            out = unpack([src])
            bit ^= out.reshape(-1)[0].astype(jnp.uint32) & jnp.uint32(1)
        return x ^ bit

    step = lambda x: unpacks4(x, *words[:4])
    ms, _ = chain_ms(step, words[0], n_small=8, n_large=40)
    print(f"4 unpacks: {ms:.3f} ms")

    # -- 8 yadifs (make_yadif_program dispatches the Pallas ring
    # kernel on TPU, the XLA formulation off-geometry)
    yad = make_yadif_program(True, False)

    @jax.jit
    def yadifs8(x, *fr):
        bit = x[0, 0, 0]
        for s in range(8):
            p, c, n = fr[3 * s : 3 * s + 3]
            out = yad(p + bit * 1e-30, c, n, jnp.int32(0))
            bit = out[0, 0, 0]
        return x + bit * 1e-30

    step = lambda x: yadifs8(x, *frames)
    ms, _ = chain_ms(step, frames[0], n_small=4, n_large=20)
    print(f"8 yadifs: {ms:.3f} ms  ({ms/8:.3f} each)")

    # -- 4 pair warps
    @jax.jit
    def pairs4(x, *fr):
        bit = x[0, 0, 0]
        for s in range(4):
            a, b = fr[2 * s : 2 * s + 2]
            out = pair(a + bit * 1e-30, b, mj, mj, jnp.float32(0.42))
            bit = out[0, 0, 0]
        return x + bit * 1e-30

    step = lambda x: pairs4(x, *frames[:8])
    ms, _ = chain_ms(step, frames[0], n_small=4, n_large=20)
    print(f"4 pair warps: {ms:.3f} ms  ({ms/4:.3f} each)")

    # -- field-pair, RGBA re-encode form (the replaced consumer path)
    @jax.jit
    def fp(x, a):
        out = pack_pair(x, a)
        return x + out[0].reshape(-1)[0].astype(jnp.float32) * 1e-30

    step = lambda x: fp(x, frames[1])
    ms, _ = chain_ms(step, frames[0], n_small=8, n_large=40)
    print(f"field-pair RGBA re-encode: {ms:.3f} ms")

    # -- field-pair, packed-domain word interleave (the consumer path);
    # operates on the channel's packed output form (H, words)
    from phaneron_tpu.ops.pallas_kernels import planes_to_words

    word_pair = make_interlaced_word_pack_program("v210")
    wfrm = [jax.block_until_ready(jax.jit(planes_to_words)(w_)) for w_ in words[:2]]

    @jax.jit
    def fw(x, a):
        out = word_pair([x], [a])
        return x ^ (out[0].reshape(-1)[0] & jnp.uint32(1))

    step = lambda x: fw(x, wfrm[1])
    ms, _ = chain_ms(step, wfrm[0], n_small=8, n_large=40)
    print(f"field-pair word interleave: {ms:.3f} ms")


if __name__ == "__main__":
    main()
