"""Compiled-on-TPU parity sweep for the packed composite variants.

Interpret-mode tests (tests/test_packed_warp.py) prove the math; this
tool proves the MOSAIC COMPILATIONS — every knob combination of the
packed composite (cchunk x poly_gamma x sextet_split) against the
staged XLA channel program on the real chip, <=1 packed code
(CLAUDE.md: verify compiled on TPU after kernel changes).  Also checks
the host-split unpack routing (make_unpack_program Pallas fast path)
bit-exactly against the XLA decode.

Run on the TPU: python tools/tpu_parity.py [uhd]
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import log
from phaneron_tpu.graph.pipeline import (
    ChannelSpec,
    LayerSpec,
    make_channel_program,
    make_unpack_program,
)
from phaneron_tpu.ops import io as fio
from phaneron_tpu.ops.coeffs import make_loader
from phaneron_tpu.ops.formats import get_format, host_split
from phaneron_tpu.ops.geometry import transform_matrix
from phaneron_tpu.ops.pallas_kernels import planes_to_words
from phaneron_tpu.ops.pallas_packed_warp import make_packed_composite_program
from phaneron_tpu.ops.pallas_warp import bucket_of


def check_composite(w: int, h: int) -> None:
    v210 = get_format("v210")
    rng = np.random.default_rng(42)
    srcs_np = []
    for k in range(4):
        words = np.asarray(v210.fill_buf(w, h)[0]).copy()
        words[:] = rng.integers(0, 2**30, size=words.shape, dtype=np.uint32)
        srcs_np.append(np.asarray(host_split(v210, [words])[0]))
    srcs = [jax.device_put(s.astype(np.uint32)) for s in srcs_np]
    mats = [
        transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02 + 0.01 * i)
        for i in range(2)
    ]
    bucket = bucket_of(*mats)
    mats_j = jnp.stack([jnp.asarray(m) for m in mats])
    mixes_j = jnp.asarray([0.35, 0.6], np.float32)

    layer = LayerSpec(
        "v210", transition="dissolve", has_transform=True, axis_aligned=True,
        src_b_format="v210", warp_bucket=-1,
    )
    base = ChannelSpec(w, h, "v210", layers=(layer,) * 2, pallas_stages=False)
    params = {"layers": [
        {"src": [planes_to_words(srcs[2 * i])],
         "src_b": [planes_to_words(srcs[2 * i + 1])],
         "matrix": jnp.asarray(mats[i]), "mix": jnp.float32([0.35, 0.6][i])}
        for i in range(2)
    ]}
    want = np.asarray(jax.block_until_ready(make_channel_program(base)(params)[0]))
    yw, uw, vw = (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(want)], w, h))

    variants = [
        (128, False, False),
        (256, False, False),
        (384, False, False),
        (128, True, False),
        (128, False, True),
        (384, True, True),
    ]
    for cchunk, poly, split in variants:
        try:
            comp = make_packed_composite_program(
                h, w, bucket, (2, 2), interpret=False,
                cchunk=cchunk, poly_gamma=poly, sextet_split=split,
            )
            got_planes = jax.block_until_ready(comp(srcs, mats_j, mixes_j))
        except Exception as err:
            # a VMEM-infeasible plan is a documented miss, not a parity
            # failure — the router never picks one (_composite_config)
            msg = str(err).split("\n")[0][:120]
            log(
                f"composite {w}x{h} cchunk={cchunk} poly={int(poly)} "
                f"split={int(split)}: INFEASIBLE ({msg})"
            )
            continue
        got = np.asarray(planes_to_words(got_planes))
        yg, ug, vg = (
            np.asarray(q) for q in v210.unpack_codes([jnp.asarray(got)], w, h)
        )
        worst = max(
            np.abs(a.astype(int) - b.astype(int)).max()
            for a, b in ((yg, yw), (ug, uw), (vg, vw))
        )
        status = "OK" if worst <= 1 else "FAIL"
        log(
            f"composite {w}x{h} cchunk={cchunk} poly={int(poly)} "
            f"split={int(split)}: worst code delta {worst} {status}"
        )
        assert worst <= 1, (cchunk, poly, split, worst)


def check_composite_rgb3(w: int, h: int) -> None:
    """Compiled rgb3-source composite (opaque f32 fields in, padded
    internal geometry at HD) vs the staged XLA channel program."""
    from phaneron_tpu.runtime.frame import RGBA_F32

    v210 = get_format("v210")
    rng = np.random.default_rng(13)
    srcs = [
        jax.device_put(rng.random((3, h, w), dtype=np.float32))
        for _ in range(4)
    ]
    mats = [
        transform_matrix(w, h, scale_x=0.9, scale_y=0.9, offset_x=0.02 + 0.01 * i)
        for i in range(2)
    ]
    bucket = bucket_of(*mats)
    layer = LayerSpec(
        RGBA_F32, transition="dissolve", has_transform=True, axis_aligned=True,
        src_b_format=RGBA_F32, warp_bucket=-1,
    )
    base = ChannelSpec(w, h, "v210", layers=(layer,) * 2, pallas_stages=False)
    params = {"layers": [
        {"src": srcs[2 * i], "src_b": srcs[2 * i + 1],
         "matrix": jnp.asarray(mats[i]), "mix": jnp.float32([0.35, 0.6][i])}
        for i in range(2)
    ]}
    want = np.asarray(jax.block_until_ready(make_channel_program(base)(params)[0]))
    comp = make_packed_composite_program(
        h, w, bucket, (2, 2), interpret=False, src_kind="rgb3"
    )
    got_planes = jax.block_until_ready(comp(
        srcs, jnp.stack([jnp.asarray(m) for m in mats]),
        jnp.asarray([0.35, 0.6], np.float32),
    ))
    got = np.asarray(planes_to_words(got_planes))
    worst = max(
        np.abs(a.astype(int) - b.astype(int)).max()
        for a, b in zip(
            (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(got)], w, h)),
            (np.asarray(q) for q in v210.unpack_codes([jnp.asarray(want)], w, h)),
        )
    )
    log(f"composite rgb3 {w}x{h}: worst code delta {worst} "
        f"{'OK' if worst <= 1 else 'FAIL'}")
    assert worst <= 1, worst


def check_yadif_pair(h: int, w: int, channels: int) -> None:
    """Compiled pair kernel vs the single-field ring kernel at both
    parities — bit-equality (the pair's whole contract)."""
    from phaneron_tpu.ops.pallas_yadif import (
        make_yadif_pair_program,
        make_yadif_ring_program,
    )

    rng = np.random.default_rng(29)
    prev, cur, nxt = (
        jax.device_put(rng.random((channels, h, w), dtype=np.float32))
        for _ in range(3)
    )
    single = make_yadif_ring_program(h, w, True, channels=channels)
    pair = make_yadif_pair_program(h, w, True, channels=channels)
    o0, o1 = jax.jit(pair)(prev, cur, nxt)
    ok = True
    for parity, got in ((0, o0), (1, o1)):
        exp = jax.jit(single)(prev, cur, nxt, jnp.int32(parity))
        ok &= bool(jnp.array_equal(got, exp))
    log(f"yadif pair {w}x{h} ch={channels}: bit-equal "
        f"{'OK' if ok else 'FAIL'}")
    assert ok


def check_unpack(w: int, h: int) -> None:
    v210 = get_format("v210")
    rng = np.random.default_rng(7)
    words = np.asarray(v210.fill_buf(w, h)[0]).copy()
    words[:] = rng.integers(0, 2**30, size=words.shape, dtype=np.uint32)
    planes = host_split(v210, [words])
    x = jax.device_put(planes[0])
    got = np.asarray(
        jax.block_until_ready(make_unpack_program("v210", w, h, "709", "709")([x]))
    )
    loader = make_loader(v210.INFO, "709", "709", "analytic")

    @jax.jit
    def xla(words):
        return fio.to_rgba(v210, [words], loader, w, h)

    want = np.asarray(jax.block_until_ready(xla(jax.jit(planes_to_words)(x))))
    d = np.abs(got - want).max()
    log(f"unpack routing {w}x{h}: max abs diff {d:.3e} "
        f"{'OK' if d == 0.0 else 'CHECK'}")
    assert d <= 2e-4, d


def main():
    geo = sys.argv[1] if len(sys.argv) > 1 else "uhd"
    w, h = (3840, 2160) if geo == "uhd" else (768, 64)
    check_unpack(1920, 1080)
    check_unpack(3840, 2160)
    check_composite(w, h)
    # HD: the padded-geometry packed composite (groups 320 -> 384)
    check_composite(1920, 1080)
    # the interlaced default load's composite shape + its deinterlacer
    check_composite_rgb3(1920, 1080)
    check_yadif_pair(1080, 1920, 3)
    log("ALL PARITY CHECKS PASSED (compiled on device)")


main()
