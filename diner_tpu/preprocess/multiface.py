"""MultiFace preprocessing: GT depth + foreground masks from tracked meshes,
and the dataset download manifest logic.

Behavioral reference: deps/multiface/process_dataset.py:50-110 (pyrender depth
+ mask render per frame/camera — here via the software rasterizer) and
deps/multiface/download_dataset.py (manifest-driven download with md5 checks
and up to MAX_TRY=50 retries) in malteprinzler/diner.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np

from diner_tpu.data.codecs import write_depth_png
from diner_tpu.preprocess.rasterizer import render_depth

MAX_TRY = 50


def render_frame(vertices, faces, krt_entry, H: int, W: int,
                 mm_to_m: bool = True):
    """Render (depth [m], mask) for one camera from a tracked mesh.

    krt_entry: dict with 'intrin' (3, 3) and 'extrin' (3, 4) as parsed by
    diner_tpu.data.multiface.load_krt (MultiFace KRT, millimeter world).
    """
    ext = np.eye(4, dtype=np.float64)
    ext[:3, :4] = np.asarray(krt_entry["extrin"], np.float64)
    depth, mask = render_depth(vertices, faces, np.asarray(krt_entry["intrin"]),
                               ext, H, W)
    if mm_to_m:
        depth = depth / 1000.0
    return depth.astype(np.float32), mask


def write_frame_outputs(depth_m, mask, depth_path, mask_path):
    """uint16 depth PNG (1e-4 m) + 8-bit mask PNG, the layout the MultiFace
    dataset loader reads (src/data/multiface.py depths/ masks/ trees)."""
    import imageio.v2 as imageio

    Path(depth_path).parent.mkdir(parents=True, exist_ok=True)
    Path(mask_path).parent.mkdir(parents=True, exist_ok=True)
    write_depth_png(depth_path, depth_m)
    imageio.imwrite(Path(mask_path), (np.asarray(mask) * 255).astype(np.uint8))


def md5sum(path, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def verify_or_download(entries, dest_root, fetch=None, max_try: int = MAX_TRY):
    """Manifest-driven download/verify.

    entries: [(relative_path, url, md5)]; fetch: callable(url, out_path) or
    None (verify-only — this environment has no egress). Returns the list of
    entries that are still missing/corrupt after max_try attempts.
    """
    dest_root = Path(dest_root)
    failed = []
    for rel, url, md5 in entries:
        out = dest_root / rel
        ok = out.exists() and (md5 is None or md5sum(out) == md5)
        tries = 0
        while not ok and fetch is not None and tries < max_try:
            tries += 1
            out.parent.mkdir(parents=True, exist_ok=True)
            try:
                fetch(url, out)
                ok = md5 is None or md5sum(out) == md5
            except Exception:
                ok = False
        if not ok:
            failed.append((rel, url, md5))
    return failed
