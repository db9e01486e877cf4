"""Build the native runtime components (g++ -shared, no pybind11 needed).

Usage: python -m diner_tpu.native.build   (or imported lazily by ply.py)
"""

from __future__ import annotations

import subprocess
from pathlib import Path

NATIVE_DIR = Path(__file__).resolve().parent
LIB_PATH = NATIVE_DIR / "libdiner_native.so"
SOURCES = [NATIVE_DIR / "ply_writer.cpp", NATIVE_DIR / "png16.cpp"]


def build(force: bool = False) -> Path:
    if LIB_PATH.exists() and not force:
        newest_src = max(s.stat().st_mtime for s in SOURCES)
        if LIB_PATH.stat().st_mtime >= newest_src:
            return LIB_PATH
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-o", str(LIB_PATH)] + [
        str(s) for s in SOURCES] + ["-lz"]
    subprocess.run(cmd, check=True)
    return LIB_PATH


if __name__ == "__main__":
    print(build(force=True))
