"""Geometry golden-value tests: rays, projection, normals, slerp."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from diner_tpu.geometry import (
    gen_rays, to_homogeneous, invert_pose, transform_points, project_points,
    camera_center, ray_closest_points, depth2normal, PoseSlerp,
)


def _lookat_extrinsics(eye, target=(0, 0, 0), up=(0, -1, 0)):
    """OpenCV world->cam extrinsics looking from eye at target."""
    eye = np.asarray(eye, np.float32)
    z = np.asarray(target, np.float32) - eye
    z /= np.linalg.norm(z)
    x = np.cross(np.asarray(up, np.float32), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)
    t = -R @ eye
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = R
    ext[:3, 3] = t
    return ext


def test_gen_rays_identity_cam():
    """Identity extrinsics: origins 0, center pixel looks down +z."""
    H, W = 8, 10
    K = np.array([[[10.0, 0, W / 2], [0, 10.0, H / 2], [0, 0, 1]]], np.float32)
    ext = np.eye(4, dtype=np.float32)[None]
    rays = np.asarray(gen_rays(jnp.asarray(ext), jnp.asarray(K), W, H, 0.5, 2.0))
    assert rays.shape == (1, H, W, 8)
    np.testing.assert_allclose(rays[..., :3], 0.0)
    np.testing.assert_allclose(np.linalg.norm(rays[..., 3:6], axis=-1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(rays[0, :, :, 6], 0.5)
    np.testing.assert_allclose(rays[0, :, :, 7], 2.0)
    # Pixel whose center is the principal point maps to direction (0,0,1):
    # center of pixel (y=H/2, x=W/2) is (W/2+0.5, H/2+0.5) != c, so check the
    # ray through c directly: pixel (x=W/2-0.5) has center exactly at cx.
    d = rays[0, H // 2, W // 2, 3:6]
    expected = np.array([0.5 / 10.0, 0.5 / 10.0, 1.0])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(d, expected, rtol=1e-5)


def test_gen_rays_origin_is_camera_center():
    ext = _lookat_extrinsics([1.0, 2.0, 3.0])[None]
    K = np.array([[[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]]], np.float32)
    rays = np.asarray(gen_rays(jnp.asarray(ext), jnp.asarray(K), 64, 48, 1.0, 2.0))
    np.testing.assert_allclose(rays[0, 0, 0, :3], [1, 2, 3], rtol=1e-5)
    c = np.asarray(camera_center(jnp.asarray(ext)))
    np.testing.assert_allclose(c[0], [1, 2, 3], rtol=1e-5)


def test_project_roundtrip():
    """Points along a ray project back to the generating pixel."""
    ext = _lookat_extrinsics([0.5, -0.3, 2.0])[None]
    W, H = 20, 16
    K = np.array([[[25.0, 0, 10.0], [0, 25.0, 8.0], [0, 0, 1]]], np.float32)
    rays = np.asarray(gen_rays(jnp.asarray(ext), jnp.asarray(K), W, H, 1.0, 3.0))
    px, py = 7, 11
    pt = rays[0, py, px, :3] + 1.7 * rays[0, py, px, 3:6]

    cam_pt = transform_points(jnp.asarray(ext), jnp.asarray(pt[None, None]))  # (1,1,3)
    focal = jnp.asarray(K[:, [0, 1], [0, 1]])
    c = jnp.asarray(K[:, :2, 2])
    uv = np.asarray(project_points(cam_pt, focal, c, (W, H)))[0, 0]
    # Back to screen coords: (uv+1)/2*size should equal the pixel center.
    np.testing.assert_allclose((uv[0] + 1) / 2 * W, px + 0.5, rtol=1e-4)
    np.testing.assert_allclose((uv[1] + 1) / 2 * H, py + 0.5, rtol=1e-4)


def test_invert_pose_and_homogeneous():
    ext = _lookat_extrinsics([0.2, 0.4, -1.5])
    inv = np.asarray(invert_pose(jnp.asarray(ext[None])))[0]
    np.testing.assert_allclose(inv @ ext, np.eye(4), atol=1e-5)
    h = np.asarray(to_homogeneous(jnp.asarray(ext[None, :3, :])))[0]
    np.testing.assert_allclose(h, ext, atol=0)


def test_ray_closest_points():
    r1 = jnp.asarray(np.array([1, 0, 0, -1, 0, 0], np.float32))
    s = 1 / np.sqrt(2)
    r2 = jnp.asarray(np.array([0, -1, 0, 0, s, s], np.float32))
    x1, x2 = ray_closest_points(r1, r2)
    np.testing.assert_allclose(np.asarray(x1), [0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(x2), [0, -0.5, 0.5], atol=1e-5)


def test_depth2normal_plane():
    """Fronto-parallel plane -> normals (0, 0, -1) (towards camera)."""
    H, W = 16, 16
    K = np.array([[[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]]], np.float32)
    z0 = 2.0
    # Depth along optical axis constant z0 => plane z=z0.
    d = np.full((1, H, W, 1), z0, np.float32)
    n = np.asarray(depth2normal(jnp.asarray(d), jnp.asarray(K)))
    assert n.shape == (1, H, W, 3)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(n[0, 4:-4, 4:-4, 2], -1.0, atol=1e-5)


def test_depth2normal_invalid_handling():
    H, W = 12, 12
    K = np.array([[[15.0, 0, 6], [0, 15.0, 6], [0, 0, 1]]], np.float32)
    d = np.full((1, H, W, 1), 1.5, np.float32)
    d[0, 5, 5] = 0.0  # hole
    n = np.asarray(depth2normal(jnp.asarray(d), jnp.asarray(K)))
    np.testing.assert_allclose(n[0, 5, 5], 0.0)          # invalid -> zero
    # Neighbors of the hole borrow valid normals (unit length, not NaN).
    np.testing.assert_allclose(np.linalg.norm(n[0, 5, 4]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(n[0, 5, 4, 2], -1.0, atol=1e-4)
    assert not np.isnan(n).any()


def test_pose_slerp_endpoints_and_midpoint():
    rot = Rotation.from_euler("y", np.array([[0.0], [90.0]]), degrees=True)
    locs = np.array([[0, 0, 0], [2, 0, 0]], np.float64)
    sl = PoseSlerp(np.array([0.0, 1.0]), rot, locs)
    ext = sl.extrinsics(np.array([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(ext[0, :3, 3], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(ext[2, :3, 3], [2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(ext[1, :3, 3], [1, 0, 0], atol=1e-6)
    mid = Rotation.from_euler("y", 45, degrees=True).as_matrix()
    np.testing.assert_allclose(ext[1, :3, :3], mid, atol=1e-6)


def test_pose_slerp_scalar_query():
    """Scalar query times are part of the documented interface."""
    import numpy as np
    from scipy.spatial.transform import Rotation

    from diner_tpu.geometry.slerp import PoseSlerp

    times = np.array([0.0, 1.0])
    rots = Rotation.from_euler("y", [[0.0], [90.0]], degrees=True)
    locs = np.array([[0.0, 0, 0], [1.0, 0, 0]])
    sl = PoseSlerp(times, rots, locs)
    r, loc = sl(0.5)
    assert loc.shape == (1, 3)
    np.testing.assert_allclose(loc[0], [0.5, 0, 0], atol=1e-6)
    ext = sl.extrinsics(0.25)
    assert ext.shape == (1, 4, 4)
