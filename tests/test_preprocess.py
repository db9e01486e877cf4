"""Preprocessing tools: rasterizer golden geometry, crop math, MVS dataset."""

import numpy as np

from diner_tpu.preprocess import render_depth, silhouette_square_crop
from diner_tpu.preprocess.facescape import crop_intrinsics, composite_rgba


def test_rasterizer_quad_plane():
    """Two triangles forming a fronto-parallel quad at z=2 -> depth 2."""
    verts = np.array([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]], float)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    H = W = 32
    K = np.array([[8.0, 0, 16], [0, 8.0, 16], [0, 0, 1]])
    depth, mask = render_depth(verts, faces, K, np.eye(4), H, W)
    # quad projects to +-8 px around center
    assert mask[16, 16]
    np.testing.assert_allclose(depth[12:20, 12:20], 2.0, rtol=1e-6)
    assert not mask[2, 2]
    assert depth[2, 2] == 0.0


def test_rasterizer_occlusion():
    """Nearer triangle wins the z-buffer."""
    verts = np.array([
        [-1, -1, 2], [1, -1, 2], [0, 1, 2],      # far triangle
        [-1, -1, 1.5], [1, -1, 1.5], [0, 1, 1.5],  # near triangle
    ], float)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    K = np.array([[8.0, 0, 16], [0, 8.0, 16], [0, 0, 1]])
    depth, mask = render_depth(verts, faces, K, np.eye(4), 32, 32)
    np.testing.assert_allclose(depth[mask].min(), 1.5, rtol=1e-6)
    assert (np.abs(depth[mask] - 1.5) < 1e-5).all()  # near plane hides far


def test_rasterizer_extrinsics():
    """Camera translated back by 1 sees the plane 1 unit farther."""
    verts = np.array([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]], float)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    ext = np.eye(4)
    ext[2, 3] = 1.0  # world->cam: +1 on z
    K = np.array([[8.0, 0, 16], [0, 8.0, 16], [0, 0, 1]])
    depth, mask = render_depth(verts, faces, K, ext, 32, 32)
    np.testing.assert_allclose(depth[16, 16], 3.0, rtol=1e-6)


def test_silhouette_crop_and_intrinsics():
    mask = np.zeros((64, 80), bool)
    mask[20:40, 30:50] = True
    top, left, side = silhouette_square_crop(mask, crop_out=32, margin=0.1)
    assert side >= 20
    assert top <= 20 and top + side >= 40
    assert left <= 30 and left + side >= 50
    K = np.array([[100.0, 0, 40], [0, 100.0, 32], [0, 0, 1]])
    K2 = crop_intrinsics(K, top, left, side, 32)
    # a point at the crop's top-left corner maps to pixel (0, 0)
    np.testing.assert_allclose(K2[0, 2], (40 - left) * 32 / side, rtol=1e-6)


def test_composite_rgba():
    img = np.full((4, 4, 3), 0.2, np.float32)
    mask = np.zeros((4, 4))
    mask[1, 1] = 1
    rgba = composite_rgba(img, mask, bg=1.0)
    assert rgba.shape == (4, 4, 4)
    np.testing.assert_allclose(rgba[1, 1, :3], 0.2)
    np.testing.assert_allclose(rgba[0, 0, :3], 1.0)
    assert rgba[1, 1, 3] == 1 and rgba[0, 0, 3] == 0


def test_mvs_corner_metas():
    from diner_tpu.mvs.datasets import corner_view_metas

    train = corner_view_metas("train")
    assert len(train) == 36  # 9 per corner x 4 corners
    val = corner_view_metas("val")
    assert len(val) == 4
    # first target: tl[0]=10 with sources (bl, tr, br)[0] = (30, 6, 35)
    assert val[0] == (10, [30, 6, 35])
    # sources never contain the target
    for t, s in train:
        assert t not in s and len(s) == 3
