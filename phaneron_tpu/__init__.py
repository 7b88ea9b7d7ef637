"""phaneron_tpu — a TPU-native clustered video server framework.

A from-scratch rebuild of the capability set of Streampunk/phaneron
(a CasparCG-compatible multi-channel broadcast vision mixer) designed
for TPU hardware: all per-pixel math runs as fused JAX/XLA (and Pallas)
programs over HBM-resident frame tensors, channels shard across chips
via jax.sharding meshes, and the control plane (AMCP/OSC/heads) runs on
the host.

Frame convention: a video frame on device is a planar float32 tensor of
shape (4, H, W) in R, G, B, A order, linear light, with premultiplied
alpha for compositing (matching the reference's float RGBA image2d
convention, /root/reference/src/process/*.ts).
"""

__version__ = "0.1.0"
