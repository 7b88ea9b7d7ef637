"""Ablate the Pallas warp kernel: where does block time go?

python tools/warp_ablate.py [1080|uhd] [bucket]
"""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from bench import chain_ms, log
from phaneron_tpu.ops.geometry import transform_matrix
from phaneron_tpu.ops.pallas_warp import make_warp_program


def main():
    geo = sys.argv[1] if len(sys.argv) > 1 else "1080"
    bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    w, h = (3840, 2160) if geo == "uhd" else (1920, 1080)
    scale = {0: 1.25, 1: 0.6, 2: 0.3}[bucket]
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.random((4, h, w), dtype=np.float32))
    m = jax.device_put(
        jnp.asarray(transform_matrix(w, h, scale_x=scale, scale_y=scale, offset_x=0.01))
    )
    log(f"=== {w}x{h} bucket{bucket}")
    for variant in ("dma", "rows", "cols", "full"):
        warp = make_warp_program(h, w, bucket, _variant=variant)
        ms, _ = chain_ms(lambda x: warp(x, m), src, floor_bytes=0)
        log(f"  {variant:6s} {ms:7.3f} ms/frame")
    # column-chunk width A/B (bit-identical outputs; wider chunks
    # amortise the 127-lane window alignment slack)
    for cchunk in (256, 384):
        if w % cchunk:
            continue
        warp = make_warp_program(h, w, bucket, cchunk=cchunk)
        ms, _ = chain_ms(lambda x: warp(x, m), src, floor_bytes=0)
        log(f"  full cchunk={cchunk} {ms:7.3f} ms/frame")


main()
