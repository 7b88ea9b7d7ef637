"""Benchmark: fused unpack->composite->pack channel programs on the
default device (the real TPU chip under the driver).

Prints ONE JSON line: the UHD v210 single-layer round-trip — the
BASELINE.json north-star metric (>=50 fps per UHD channel per chip).
Secondary measurements (1080p 4-layer composite, p99 latencies, transfer
costs) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_uhd_program():
    from phaneron_tpu.graph.pipeline import ChannelSpec, LayerSpec, make_channel_program
    from phaneron_tpu.ops.formats import get_format

    w, h = 3840, 2160
    spec = ChannelSpec(w, h, "v210", layers=(LayerSpec("v210"),))
    prog = make_channel_program(spec)
    planes = [jax.device_put(np.asarray(p)) for p in get_format("v210").fill_buf(w, h)]
    return prog, {"layers": [{"src": planes}]}


def make_hd_composite_program():
    import jax.numpy as jnp

    from phaneron_tpu.graph.pipeline import ChannelSpec, LayerSpec, make_channel_program
    from phaneron_tpu.ops.formats import get_format
    from phaneron_tpu.ops.geometry import transform_matrix

    w, h = 1920, 1080
    layer = LayerSpec(
        "v210", transition="dissolve", has_transform=True, axis_aligned=True,
        src_b_format="v210",
    )
    spec = ChannelSpec(w, h, "v210", layers=(layer,) * 4)
    prog = make_channel_program(spec)
    v210 = get_format("v210")
    planes = [jax.device_put(np.asarray(p)) for p in v210.fill_buf(w, h)]
    mat = jax.device_put(
        jnp.asarray(transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02))
    )
    lp = {"src": planes, "src_b": planes, "matrix": mat, "mix": jnp.float32(0.5)}
    return prog, {"layers": [dict(lp) for _ in range(4)]}


def measure(prog, params, warmup=3, min_iters=20, budget_s=10.0):
    for _ in range(warmup):
        jax.block_until_ready(prog(params))

    # synchronous per-frame latency
    lat = []
    t_end = time.perf_counter() + budget_s / 2
    while len(lat) < min_iters or (time.perf_counter() < t_end and len(lat) < 200):
        t0 = time.perf_counter()
        jax.block_until_ready(prog(params))
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3

    # pipelined throughput: keep the device queue fed
    n = max(min_iters, min(200, int((budget_s / 2) / max(np.median(lat), 1e-4))))
    t0 = time.perf_counter()
    outs = None
    for _ in range(n):
        outs = prog(params)
    jax.block_until_ready(outs)
    fps = n / (time.perf_counter() - t0)
    return fps, float(np.percentile(lat_ms, 50)), float(np.percentile(lat_ms, 99))


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    prog, params = make_uhd_program()
    t0 = time.perf_counter()
    jax.block_until_ready(prog(params))
    log(f"UHD compile+first-run: {time.perf_counter()-t0:.1f}s")
    uhd_fps, uhd_p50, uhd_p99 = measure(prog, params)
    log(f"UHD v210 1-layer roundtrip: {uhd_fps:.1f} fps, p50 {uhd_p50:.2f} ms, p99 {uhd_p99:.2f} ms")

    hd_prog, hd_params = make_hd_composite_program()
    hd_fps, hd_p50, hd_p99 = measure(hd_prog, hd_params)
    log(f"1080p 4-layer dissolve+DVE composite: {hd_fps:.1f} fps, p50 {hd_p50:.2f} ms, p99 {hd_p99:.2f} ms")

    print(
        json.dumps(
            {
                "metric": "uhd_v210_unpack_composite_pack_fps_per_chip",
                "value": round(uhd_fps, 2),
                "unit": "fps",
                "vs_baseline": round(uhd_fps / 50.0, 3),
                "extra": {
                    "uhd_p99_ms": round(uhd_p99, 3),
                    "hd_4layer_fps": round(hd_fps, 2),
                    "hd_4layer_p99_ms": round(hd_p99, 3),
                    "device": str(dev),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
