"""Binary PLY IO: native C++ writer (ctypes) with a pure-Python fallback.

Behavioral reference: fusibile's storePlyFileBinaryPointCloud
(deps/TransMVSNet/deps/fusibile/main.cpp:843) and test.py's plyfile output
(deps/TransMVSNet/test.py:365-386) — binary little-endian vertex clouds with
x/y/z float32, optional nx/ny/nz float32, optional r/g/b uchar.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB = None


def _native_lib():
    global _LIB
    if _LIB is None:
        from diner_tpu.native.build import build

        lib = ctypes.CDLL(str(build()))
        lib.write_ply_binary.restype = ctypes.c_int
        lib.write_ply_binary.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
    return _LIB


def write_ply(path, points, colors=None, normals=None, use_native: bool = True):
    """points: (N, 3) float; colors: (N, 3) uint8 or [0,1] float; normals:
    (N, 3) float. Writes binary little-endian PLY."""
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    if colors is not None:
        colors = np.asarray(colors)
        if colors.dtype != np.uint8:
            colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
        colors = np.ascontiguousarray(colors)
    if normals is not None:
        normals = np.ascontiguousarray(normals, np.float32)

    if use_native:
        try:
            lib = _native_lib()
            rc = lib.write_ply_binary(
                str(path).encode(), n,
                points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                colors.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                if colors is not None else None,
                normals.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                if normals is not None else None)
            if rc != 0:
                raise IOError(f"native PLY writer failed with code {rc}")
            return Path(path)
        except Exception:
            pass  # fall back to pure python (e.g. no compiler in env)

    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        if normals is not None:
            f.write(b"property float nx\nproperty float ny\nproperty float nz\n")
        if colors is not None:
            f.write(b"property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(b"end_header\n")
        parts = [points]
        if normals is not None:
            parts.append(normals)
        rec = np.dtype([("xyz", np.float32, 3)]
                       + ([("n", np.float32, 3)] if normals is not None else [])
                       + ([("c", np.uint8, 3)] if colors is not None else []))
        arr = np.empty(n, rec)
        arr["xyz"] = points
        if normals is not None:
            arr["n"] = normals
        if colors is not None:
            arr["c"] = colors
        arr.tofile(f)
    return Path(path)


def read_ply(path):
    """Minimal binary-PLY reader for our own outputs (tests/round-trips).

    Returns dict with 'points' and optionally 'normals'/'colors'."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError("not a PLY file")
        fmt = f.readline().strip()
        assert b"binary_little_endian" in fmt, fmt
        n = 0
        props = []
        while True:
            line = f.readline().strip()
            if line.startswith(b"element vertex"):
                n = int(line.split()[-1])
            elif line.startswith(b"property"):
                _, typ, name = line.split()
                props.append((name.decode(),
                              np.float32 if typ == b"float" else np.uint8))
            elif line == b"end_header":
                break
        rec = np.dtype(props)
        data = np.fromfile(f, rec, n)
    out = {"points": np.stack([data["x"], data["y"], data["z"]], -1)}
    if "nx" in data.dtype.names:
        out["normals"] = np.stack([data["nx"], data["ny"], data["nz"]], -1)
    if "red" in data.dtype.names:
        out["colors"] = np.stack([data["red"], data["green"], data["blue"]], -1)
    return out
