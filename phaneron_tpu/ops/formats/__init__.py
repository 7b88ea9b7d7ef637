"""Pixel-format pack/unpack library.

Each format module replicates the capability of one reference kernel
pair (read: packed bytes -> linear float RGBA; write: linear float RGBA
-> packed bytes) from /root/reference/src/process/{v210,yuv422p10,
yuv422p8,yuv420p,nv12,rgba8,bgra8}.ts — re-designed as vectorized
XLA-friendly tensor ops rather than per-work-item scalar loops.

Registry maps format name -> module for producer/consumer dispatch.
"""

from __future__ import annotations

from . import bgra8, nv12, rgba8, v210, yuv420p, yuv422p8, yuv422p10

FORMATS = {
    "v210": v210,
    "yuv422p10le": yuv422p10,
    "yuv422p10": yuv422p10,
    "yuv422p": yuv422p8,
    "yuv422p8": yuv422p8,
    "yuv420p": yuv420p,
    "nv12": nv12,
    "rgba8": rgba8,
    "rgba": rgba8,
    "bgra8": bgra8,
    "bgra": bgra8,
}


def get_format(name: str):
    if name not in FORMATS:
        raise KeyError(f"unsupported pixel format '{name}'")
    return FORMATS[name]


def host_split(fmt_mod, planes):
    """Producer-side upload form: formats whose device kernels want a
    host relayout (v210's word-plane deinterleave) expose
    host_split_planes; everything else uploads as-is."""
    fn = getattr(fmt_mod, "host_split_planes", None)
    return fn(planes) if fn is not None else planes
