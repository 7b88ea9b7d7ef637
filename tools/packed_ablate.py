"""Attribute the packed composite kernel's time to its stages.

Builds the UHD 4-layer serving shape (layer_cfg (2,2,2,2), the bench's
0.9-scale bucket) with make_packed_composite_program's _ablate knob and
chain-measures each variant on the real chip:

    full      — the shipped kernel
    nopack    — drop encode+pack            (delta = pack cost)
    nowarp    — drop row/column passes      (delta = warp cost)
    nodecode  — also drop deint/colour/gamma (delta = chunk decode)
    nosplit   — also drop the phase split    (delta = split; rest = DMA+overhead)

python tools/packed_ablate.py [uhd|8k|hd] [n_layers]
"""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from bench import chain_ms, log
from phaneron_tpu.ops.formats import get_format, host_split
from phaneron_tpu.ops.geometry import transform_matrix
from phaneron_tpu.ops.pallas_warp import bucket_of
from phaneron_tpu.ops.pallas_packed_warp import make_packed_composite_program


def main():
    geo = sys.argv[1] if len(sys.argv) > 1 else "uhd"
    w, h = {"uhd": (3840, 2160), "8k": (7680, 4320), "hd": (1920, 1080)}[geo]
    n_layers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    layer_cfg = (2,) * n_layers
    m = transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02)
    bucket = bucket_of(m)
    mats = np.stack(
        [
            transform_matrix(
                w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02 + 0.003 * i
            )
            for i in range(n_layers)
        ]
    )
    mats_j = jax.device_put(jnp.asarray(mats))
    mixes_j = jax.device_put(jnp.asarray([0.4 + 0.05 * i for i in range(n_layers)]))
    v210 = get_format("v210")
    base = np.asarray(host_split(v210, v210.fill_buf(w, h))[0])
    statics = [
        jax.device_put(np.roll(base, 11 * (k + 1), axis=1))
        for k in range(2 * n_layers - 1)
    ]
    x0 = jax.device_put(base)
    log(f"=== {w}x{h} layer_cfg={layer_cfg} bucket={bucket}")

    results = {}
    ladder = (
        "",
        "nopack",
        "nowarp+nopack",
        "nogamma+nowarp+nopack",
        "nodecode+nowarp+nopack",
        "nosplit+nowarp+nopack",
    )
    for ab in ladder:
        # shipped config (pipeline.PACKED_*: cchunk 128, poly gamma,
        # sextet split) so the deltas attribute the kernel we ship
        prog = make_packed_composite_program(
            h, w, bucket, layer_cfg, poly_gamma=True, sextet_split=True,
            _ablate=ab,
        )

        @jax.jit
        def raw_step(x, mats, mixes, *flat):
            out = prog([x] + list(flat), mats, mixes)
            return x ^ (out.reshape(-1)[0] & jnp.uint32(1))

        step = lambda x: raw_step(x, mats_j, mixes_j, *statics)
        ms, _ = chain_ms(step, x0, n_small=8, n_large=32)
        results[ab or "full"] = ms
        log(f"  {ab or 'full':16s} {ms:8.3f} ms/frame")

    f = results["full"]
    log(f"  pack   = {f - results['nopack']:.3f} ms")
    log(f"  warp   = {results['nopack'] - results['nowarp+nopack']:.3f} ms")
    log(
        f"  gamma  = {results['nowarp+nopack'] - results['nogamma+nowarp+nopack']:.3f}"
        " ms (analytic transfer pow alone)"
    )
    log(
        f"  decode = {results['nogamma+nowarp+nopack'] - results['nodecode+nowarp+nopack']:.3f}"
        " ms (deint+colour chunks sans gamma)"
    )
    log(
        f"  split  = {results['nodecode+nowarp+nopack'] - results['nosplit+nowarp+nopack']:.3f} ms"
    )
    log(f"  dma+fx = {results['nosplit+nowarp+nopack']:.3f} ms residual")

    # column-chunk / poly-gamma / sextet-split A/B on the full kernel
    variants = (
        (256, False, False),
        (384, False, False),
        (128, True, False),
        (384, True, False),
        (128, False, True),
        (384, True, True),
    )
    for cchunk, poly, split in variants:
        try:
            prog = make_packed_composite_program(
                h, w, bucket, layer_cfg,
                cchunk=cchunk, poly_gamma=poly, sextet_split=split,
            )

            @jax.jit
            def raw_c(x, mats, mixes, *flat):
                out = prog([x] + list(flat), mats, mixes)
                return x ^ (out.reshape(-1)[0] & jnp.uint32(1))

            step_c = lambda x: raw_c(x, mats_j, mixes_j, *statics)
            ms, _ = chain_ms(step_c, x0, n_small=8, n_large=32)
            log(
                f"  full cchunk={cchunk} poly={int(poly)} "
                f"split={int(split)}: {ms:8.3f} ms/frame"
            )
        except Exception as err:  # VMEM-infeasible variants stay documented
            msg = str(err).split("\n")[0][:140]
            log(
                f"  full cchunk={cchunk} poly={int(poly)} "
                f"split={int(split)}: FAILED ({msg})"
            )


main()
