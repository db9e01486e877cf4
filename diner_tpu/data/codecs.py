"""On-disk format codecs shared by all datasets.

Behavioral reference (formats must be byte-compatible with the reference's
data trees so a user can point this framework at the same disks):
- uint16 depth PNGs at SCALE_FACTOR=1e-4 m (deps/TransMVSNet/utils.py:17-23
  writer; readers src/data/facescape.py:65-69, multiface.py:101-108).
- PFM depth maps (deps/TransMVSNet/datasets/data_io.py:6-71,
  src/util/io.py PFM reader).
- MVSNet camera text files: extrinsics 4x4, intrinsics 3x3, depth bounds
  (src/data/dtu.py:142-180).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

DEPTH_SCALE_FACTOR = 1e-4  # meters per uint16 unit


_PNG_NATIVE = None  # None = untried, False = unavailable, else ctypes lib


def _png_native():
    """C++ 16-bit grayscale PNG codec (native/png16.cpp): the depth-prior IO
    hot path decodes thousands of these per epoch; a single zlib inflate +
    tight defilter loop beats the generic imaging stack. Falls back to
    imageio when the toolchain/library is unavailable."""
    global _PNG_NATIVE
    if _PNG_NATIVE is None:
        try:
            import ctypes

            from diner_tpu.native.build import build

            lib = ctypes.CDLL(str(build()))
            lib.png16_probe.restype = ctypes.c_int
            lib.png16_probe.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.png16_decode.restype = ctypes.c_int
            lib.png16_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint16)]
            lib.png16_encode.restype = ctypes.c_int64
            lib.png16_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64]
            _PNG_NATIVE = lib
        except Exception:
            _PNG_NATIVE = False
    return _PNG_NATIVE or None


def read_png16(path):
    """Read a grayscale PNG (8/16-bit) -> uint16 (H, W); native fast path."""
    import ctypes

    lib = _png_native()
    buf = Path(path).read_bytes()
    if lib is not None:
        w = ctypes.c_int64()
        h = ctypes.c_int64()
        d = ctypes.c_int64()
        if lib.png16_probe(buf, len(buf), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(d)) == 0:
            out = np.empty((h.value, w.value), np.uint16)
            rc = lib.png16_decode(
                buf, len(buf),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
            if rc == 0:
                return out
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(Path(path))).astype(np.uint16)


def write_png16(path, img_u16):
    """Write uint16 (H, W) as 16-bit grayscale PNG; native fast path."""
    import ctypes

    img = np.ascontiguousarray(np.asarray(img_u16, np.uint16))
    lib = _png_native()
    if lib is not None and img.ndim == 2:
        cap = img.nbytes + 64 * 1024
        out = np.empty(cap, np.uint8)
        n = lib.png16_encode(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            img.shape[0], img.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        if n > 0:
            Path(path).write_bytes(out[:n].tobytes())
            return
    import imageio.v2 as imageio

    imageio.imwrite(Path(path), img)


def write_depth_png(path, depth_m):
    """Write metric depth (H, W) [m] as uint16 PNG (1e-4 m units)."""
    q = np.clip(np.asarray(depth_m, np.float64) / DEPTH_SCALE_FACTOR,
                0, np.iinfo(np.uint16).max)
    write_png16(path, q.astype(np.uint16))


def read_depth_png(path):
    """Read uint16 depth PNG -> float32 meters (0 = invalid)."""
    return read_png16(path).astype(np.float32) * DEPTH_SCALE_FACTOR


def write_pfm(path, data, scale: float = 1.0):
    """Write (H, W) or (H, W, 3) float32 PFM (bottom-up row order, like the
    reference's writers)."""
    data = np.asarray(data, np.float32)
    color = data.ndim == 3 and data.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        endian = data.dtype.byteorder
        if endian == "<" or (endian == "=" and np.little_endian):
            scale = -scale
        f.write(f"{scale}\n".encode())
        np.flipud(data).tofile(f)


def read_pfm(path):
    """Read PFM -> (data float32 (H, W[, 3]), scale)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"not a PFM file: {path}")
        dims = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dims:
            raise ValueError(f"malformed PFM header: {path}")
        width, height = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        fmt = "<f" if scale < 0 else ">f"
        data = np.fromfile(f, fmt)
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)).astype(np.float32), abs(scale)


def read_mvsnet_cam(path):
    """Parse MVSNet cam txt: 'extrinsic' 4x4, 'intrinsic' 3x3, bounds line.

    Returns (extrinsics (4,4), intrinsics (3,3), (depth_min, depth_interval)).
    """
    lines = [ln.strip() for ln in Path(path).read_text().splitlines() if ln.strip()]
    i_ext = lines.index("extrinsic") + 1
    ext = np.array([[float(v) for v in lines[i_ext + r].split()]
                    for r in range(4)], np.float32)
    i_int = lines.index("intrinsic") + 1
    K = np.array([[float(v) for v in lines[i_int + r].split()]
                  for r in range(3)], np.float32)
    bounds = tuple(float(v) for v in lines[i_int + 3].split()[:2])
    return ext, K, bounds


def write_mvsnet_cam(path, extrinsics, intrinsics, depth_min: float,
                     depth_interval: float):
    with open(path, "w") as f:
        f.write("extrinsic\n")
        for row in np.asarray(extrinsics, np.float64):
            f.write(" ".join(f"{v:.8f}" for v in row) + "\n")
        f.write("\nintrinsic\n")
        for row in np.asarray(intrinsics, np.float64):
            f.write(" ".join(f"{v:.8f}" for v in row) + "\n")
        f.write(f"\n{depth_min} {depth_interval}\n")


def write_dmb(path, image):
    """Write Gipuma .dmb (fusibile input format): int32 header
    [type=1, height, width, channels] + float32 data, column-major per channel.

    Behavioral reference: deps/TransMVSNet/gipuma.py:34-55 in
    malteprinzler/diner.
    """
    import struct

    image = np.asarray(image, np.float32)
    if image.ndim == 2:
        image = image[..., None]
    h, w, c = image.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<iiii", 1, h, w, c))
        np.transpose(image, (2, 0, 1)).astype(np.float32).tofile(f)


def read_dmb(path):
    """Read Gipuma .dmb -> (H, W) or (H, W, C) float32
    (deps/TransMVSNet/gipuma.py:20-31)."""
    import struct

    with open(path, "rb") as f:
        _, h, w, c = struct.unpack("<iiii", f.read(16))
        data = np.fromfile(f, np.float32)
    arr = data.reshape((w, h, c), order="F")
    return np.transpose(arr, (1, 0, 2)).squeeze()


def fake_gipuma_normals(depth):
    """Camera-facing unit normals where depth > 0 (gipuma.py:90-108):
    (1,1,1)/sqrt(3) at valid pixels, zeros elsewhere."""
    depth = np.asarray(depth)
    n = np.ones((*depth.shape, 3), np.float32) / 1.732050808
    return n * (depth > 0)[..., None]


def write_gipuma_cam(path, extrinsics, intrinsics):
    """Write the fusibile camera file: a 3x4 projection matrix P = K @ [R|t]
    (deps/TransMVSNet/gipuma.py:67-87 mvsnet_to_gipuma_cam)."""
    K = np.asarray(intrinsics, np.float64)
    ext = np.asarray(extrinsics, np.float64)
    P = K @ ext[:3, :4]
    with open(path, "w") as f:
        for row in P:
            f.write(" ".join(f"{v:.8f}" for v in row) + "\n")
        f.write("\n")


def nearest_resize(img, h, w):
    """Integer nearest resize by index striding (floor convention shared by
    the DTU and MultiFace loaders)."""
    import numpy as np

    ys = (np.arange(h) * (img.shape[0] / h)).astype(np.int64)
    xs = (np.arange(w) * (img.shape[1] / w)).astype(np.int64)
    return img[ys][:, xs]
