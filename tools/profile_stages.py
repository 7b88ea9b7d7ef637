"""Per-stage TPU profiling: where does a composite frame's time go?

Dependent-chain timing (see bench.py chain_ms) for each stage of the
channel frame path at 1080p and UHD, plus Pallas-vs-XLA warp
comparisons per scale bucket and the rotation (gather) warp cost.

Usage: python tools/profile_stages.py [hd|uhd|warp|rot|all]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import chain_ms, log
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.ops.geometry import transform_matrix, warp_affine, warp_axis_aligned


def stage(name, step, x0, floor_bytes=0, n_small=8, n_large=64):
    t0 = time.perf_counter()
    jax.block_until_ready(step(x0))
    compile_s = time.perf_counter() - t0
    ms, _ = chain_ms(step, x0, n_small=n_small, n_large=n_large, floor_bytes=floor_bytes)
    log(f"  {name:44s} {ms:8.3f} ms/frame  (compile {compile_s:.1f}s)")
    return ms


def profile_warps(w, h):
    from phaneron_tpu.ops.pallas_warp import BUCKET_BOUNDS, bucket_of, make_warp_program

    log(f"--- warps at {w}x{h}")
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.random((4, h, w), dtype=np.float32))
    fbytes = src.nbytes
    for scale, label in ((1.25, "zoom 1.25x (bucket0)"), (0.6, "shrink 0.6 (bucket1)"), (0.3, "shrink 0.3 (bucket2)")):
        m = transform_matrix(w, h, scale_x=scale, scale_y=scale, offset_x=0.01)
        b = bucket_of(m)
        mj = jax.device_put(jnp.asarray(m))
        warp_p = make_warp_program(h, w, b)
        ms_p = stage(f"pallas warp {label}", lambda x: warp_p(x, mj), src, floor_bytes=2 * fbytes)
        xw = jax.jit(warp_axis_aligned)
        ms_x = stage(f"XLA gather warp {label}", lambda x: xw(x, mj), src, floor_bytes=2 * fbytes)
        log(f"    speedup {ms_x / ms_p:.2f}x")
        # compiled-vs-oracle correctness on the real chip
        a = np.asarray(warp_p(src, mj))
        bref = np.asarray(xw(src, mj))
        log(f"    max|pallas-xla| = {np.abs(a - bref).max():.2e}")


def profile_rotation(w, h):
    log(f"--- rotation (non-axis-aligned gather) at {w}x{h}")
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.random((4, h, w), dtype=np.float32))
    m = jax.device_put(jnp.asarray(transform_matrix(w, h, rotate=0.05, scale_x=0.9, scale_y=0.9)))
    wa = jax.jit(warp_affine)
    stage("warp_affine rotation", lambda x: wa(x, m), src, floor_bytes=2 * src.nbytes, n_small=4, n_large=16)


def profile_channel(w, h, name):
    from phaneron_tpu.graph.pipeline import ChannelSpec, LayerSpec, make_channel_program
    from phaneron_tpu.ops.pallas_kernels import (
        make_v210_pack_rgba,
        make_v210_unpack_rgba,
    )
    from phaneron_tpu.ops.pallas_warp import bucket_of

    log(f"--- channel stages at {name} {w}x{h}")
    v210 = get_format("v210")
    words = jax.device_put(np.asarray(v210.fill_buf(w, h)[0]))
    rgba_bytes = 4 * h * w * 4

    unpack = make_v210_unpack_rgba(w, h)
    pack = make_v210_pack_rgba(w, h)
    # jit the whole chain: the stage builders return plain Python
    # wrappers whose per-op EAGER dispatch pays a tunnel round trip
    # each — measuring them unjitted reports ~30 ms of RTT, not kernels
    roundtrip = jax.jit(lambda x: unpack(pack(x)[0]))
    rgba = jax.jit(unpack)(words)
    stage("pallas v210 pack+unpack (jit chain)", roundtrip, rgba,
          floor_bytes=2 * (words.nbytes * 2 + rgba_bytes * 2), n_small=4, n_large=32)

    m = transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02)
    mj = jax.device_put(jnp.asarray(m))

    # full 4-layer dissolve+DVE channel program, pallas stages ON
    layer = LayerSpec(
        "v210", transition="dissolve", has_transform=True, axis_aligned=True,
        src_b_format="v210", warp_bucket=bucket_of(m),
    )
    for pallas, tag in ((True, "pallas"), (False, "xla")):
        lyr = layer if pallas else layer._replace(warp_bucket=-1)
        spec = ChannelSpec(w, h, "v210", layers=(lyr,) * 4, pallas_stages=pallas)
        prog = make_channel_program(spec)

        def step(x, prog=prog):
            lp = {"src": [x], "src_b": [x], "matrix": mj, "mix": jnp.float32(0.5)}
            return prog({"layers": [dict(lp) for _ in range(4)]})[0]

        stage(f"4-layer dissolve+DVE ({tag})", step, words, n_small=4, n_large=24)

    # single layer with DVE only
    layer1 = LayerSpec("v210", has_transform=True, axis_aligned=True, warp_bucket=bucket_of(m))
    spec1 = ChannelSpec(w, h, "v210", layers=(layer1,), pallas_stages=True)
    prog1 = make_channel_program(spec1)
    stage("1-layer DVE (pallas)", lambda x: prog1({"layers": [{"src": [x], "matrix": mj}]})[0], words)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    dev = jax.devices()[0]
    log(f"device: {dev}")
    if what in ("warp", "all"):
        profile_warps(1920, 1080)
        profile_warps(3840, 2160)
    if what in ("rot", "all"):
        profile_rotation(1920, 1080)
    if what in ("hd", "all"):
        profile_channel(1920, 1080, "HD")
    if what in ("uhd", "all"):
        profile_channel(3840, 2160, "UHD")


if __name__ == "__main__":
    main()
