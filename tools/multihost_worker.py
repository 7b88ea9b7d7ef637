"""Worker for the multi-host (DCN) dryrun — run by __graft_entry__.

Two of these processes form a jax.distributed cluster (multi-controller
SPMD), each contributing 4 virtual CPU devices to a global
('host', 'sp') mesh.  Host h serves channel h: frames are sharded
P('host', None, 'sp', None) — channel rows scanline-sharded WITHIN a
host (ICI in production), channels placed ACROSS hosts.  The ROUTE hop
(channel A's warped RGBA consumed by channel B, routeProducer.ts:51-132
semantics) is jnp.roll along the 'host' axis inside the jitted step, so
XLA lowers it to a cross-process collective-permute — the transfer
rides DCN on real multi-host topologies (SURVEY §5.8 host<->host row).

Each process asserts its own addressable output shards bit-equal to the
locally recomputed reference, then process 0 prints the OK line the
parent greps for.
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main() -> None:
    proc = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=proc
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from phaneron_tpu.ops.geometry import transform_matrix, warp_axis_aligned

    assert jax.process_count() == 2
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    assert len(devs) == 8
    mesh = Mesh(np.array(devs).reshape(2, 4), ("host", "sp"))

    h, w = 64, 96
    rng = np.random.default_rng(7)
    frames_np = rng.random((2, 4, h, w), dtype=np.float32)  # (ch, rgba, H, W)
    mats_np = np.stack(
        [
            np.asarray(transform_matrix(w, h, scale_y=1.3, offset_y=0.05)),
            np.asarray(transform_matrix(w, h, scale_x=0.8, offset_x=-0.1)),
        ]
    )

    sharding = NamedSharding(mesh, P("host", None, "sp", None))
    frames = jax.device_put(frames_np, sharding)
    mats = jax.device_put(jnp.asarray(mats_np), NamedSharding(mesh, P()))

    @jax.jit
    def step(x, m):
        # per-channel DVE warp (vertical taps cross sp shard halos)
        warped = jax.vmap(warp_axis_aligned)(x, m)
        # ROUTE: channel h consumes channel h-1's warped frame — the
        # roll over the 'host'-sharded axis is the cross-process hop
        routed = jnp.roll(warped, 1, axis=0)
        return warped * 0.6 + routed * 0.4

    out = step(frames, mats)
    jax.block_until_ready(out)

    # reference: the SAME jitted step, unsharded on this process's
    # first local device (bit-equality vs the distributed run — GSPMD
    # partitioning must not change any element's arithmetic)
    ref = np.asarray(step(jnp.asarray(frames_np), jnp.asarray(mats_np)))

    # the partitioned program forms its elementwise FMAs across the
    # collective boundary differently from the local compile: tolerance
    # is ONE f32 ulp on [0,1] data (2^-23 — far inside the ~2^-17 kernel
    # error class and any packed-code threshold)
    for s in out.addressable_shards:
        want = ref[tuple(s.index)]
        got = np.asarray(s.data)
        assert got.shape == want.shape, (got.shape, want.shape)
        diff = float(np.abs(got - want).max())
        assert diff <= 2.0 ** -23, f"host {proc} shard {s.index}: {diff}"

    if proc == 0:
        print(
            f"dryrun multihost ok: 2 processes x 4 devices, ch-on-host + "
            f"sp-in-host mesh, cross-process ROUTE collective <=1 ulp vs local",
            flush=True,
        )


if __name__ == "__main__":
    main()
