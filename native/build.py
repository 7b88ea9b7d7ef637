"""Build the native hostio library (g++ -> shared object, no deps).

Invoked lazily by phaneron_tpu.utils.hostio on first use; rebuilds when
the source is newer than the binary."""

from __future__ import annotations

import subprocess
from pathlib import Path

NATIVE_DIR = Path(__file__).parent
SRC = NATIVE_DIR / "hostio.cpp"
OUT = NATIVE_DIR / "build" / "libhostio.so"


def build(force: bool = False) -> Path:
    OUT.parent.mkdir(exist_ok=True)
    if not force and OUT.exists() and OUT.stat().st_mtime >= SRC.stat().st_mtime:
        return OUT
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(SRC),
        "-o",
        str(OUT),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return OUT


if __name__ == "__main__":
    print(build(force=True))
