"""Decompose the UHD 4-layer composite: which stage carries the time?

python tools/composite_ablate.py [uhd|hd]
"""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from bench import chain_ms, log
from phaneron_tpu.graph.pipeline import ChannelSpec, LayerSpec, make_channel_program
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.ops.geometry import transform_matrix
from phaneron_tpu.ops.pallas_warp import bucket_of


def measure(name, spec, params_fn, src, n_small=4, n_large=16):
    prog = make_channel_program(spec)
    step = lambda x: prog(params_fn(x))[0]
    ms, _ = chain_ms(step, src, n_small=n_small, n_large=n_large)
    log(f"  {name:46s} {ms:8.3f} ms/frame")
    return ms


def main():
    geo = sys.argv[1] if len(sys.argv) > 1 else "uhd"
    w, h = (3840, 2160) if geo == "uhd" else (1920, 1080)
    v210 = get_format("v210")
    src = jax.device_put(np.asarray(v210.fill_buf(w, h)[0]))
    m = transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02)
    mj = jax.device_put(jnp.asarray(m))
    b = bucket_of(m)
    log(f"=== {w}x{h}")

    plain = LayerSpec("v210")
    dve = LayerSpec("v210", has_transform=True, axis_aligned=True, warp_bucket=b)
    diss = LayerSpec("v210", transition="dissolve", src_b_format="v210")
    full = LayerSpec("v210", transition="dissolve", src_b_format="v210",
                     has_transform=True, axis_aligned=True, warp_bucket=b)

    def p_plain(x):
        return {"layers": [{"src": [x]} for _ in range(4)]}

    def p_dve(x):
        return {"layers": [{"src": [x], "matrix": mj} for _ in range(4)]}

    def p_diss(x):
        return {"layers": [{"src": [x], "src_b": [x], "mix": jnp.float32(0.5)} for _ in range(4)]}

    def p_full(x):
        return {"layers": [
            {"src": [x], "src_b": [x], "matrix": mj, "mix": jnp.float32(0.5)}
            for _ in range(4)]}

    sp = lambda layer: ChannelSpec(w, h, "v210", layers=(layer,) * 4, pallas_stages=True)
    measure("1-layer passthrough (monolithic)", ChannelSpec(w, h, "v210", layers=(plain,), pallas_stages=True), lambda x: {"layers": [{"src": [x]}]}, src)
    measure("4-layer plain (4 unpack+combine+pack)", sp(plain), p_plain, src)
    measure("4-layer DVE (4 unpack+4 warp+combine+pack)", sp(dve), p_dve, src)
    measure("4-layer dissolve (8 unpack+mix+combine+pack)", sp(diss), p_diss, src)
    measure("4-layer DVE+dissolve (8 unpack+8 warp+...)", sp(full), p_full, src)


main()
