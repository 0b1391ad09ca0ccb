"""Build the native host-side runtime (libdensity.so).

Invoked automatically on first import of density_tpu.native (and by
tests); idempotent -- rebuilds only when the source is newer than the
shared object.
"""

from __future__ import annotations

import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "libdensity.cpp")
SO = os.path.join(_HERE, "libdensity.so")


def build(force: bool = False) -> str:
    """Compile libdensity.cpp -> libdensity.so. Returns the .so path."""
    if (not force and os.path.exists(SO)
            and os.path.getmtime(SO) >= os.path.getmtime(SRC)):
        return SO
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-fno-exceptions", "-pthread", "-o", SO, SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return SO


if __name__ == "__main__":
    print(build(force=True))
