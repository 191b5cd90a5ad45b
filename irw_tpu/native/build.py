"""Build libirwloader.so from irw_loader.cpp with the system toolchain.

Invoked lazily from irw_tpu.native on first use (and by tests); the build is
a single translation unit, ~1 s.  No pybind11 in the image — the library is
a pure C ABI consumed via ctypes.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "src", "irw_loader.cpp")
LIB = os.path.join(_DIR, "libirwloader.so")


def build(force: bool = False) -> str | None:
    """Compile the shared library if missing/stale; return its path, or
    None when the toolchain or headers are unavailable."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    # -march=native is safe: the library is always (re)built lazily on the
    # machine that loads it (never shipped as a binary artifact).
    cmd = [
        "g++", "-O3", "-march=native", "-fno-math-errno", "-fPIC", "-shared",
        "-pthread", "-std=c++17", SRC, "-ljpeg", "-lpng", "-o", LIB,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        return None
    return LIB


if __name__ == "__main__":
    path = build(force=True)
    print(path or "BUILD FAILED")
