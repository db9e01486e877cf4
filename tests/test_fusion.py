"""Fusion subsystem: consistency round-trips, consensus fusion, PLY IO."""

import numpy as np
import jax.numpy as jnp

from diner_tpu.fusion import (
    check_geometric_consistency, filter_depths, consensus_fusion,
    write_ply, read_ply,
)
from diner_tpu.fusion.consistency import depths_to_world_points


def _two_view_plane(H=16, W=16, f=16.0, z0=2.0, tx=0.1):
    """Two cameras seeing the plane z = z0 (view 1 shifted by tx)."""
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    e0 = np.eye(4, dtype=np.float32)
    e1 = np.eye(4, dtype=np.float32)
    e1[0, 3] = -tx  # camera at x=+tx -> world->cam translation -tx... (cam at +tx)
    d = np.full((H, W), z0, np.float32)
    return (jnp.asarray(np.stack([d, d])),
            jnp.asarray(np.stack([K, K])),
            jnp.asarray(np.stack([e0, e1])))


def test_consistency_accepts_true_geometry():
    depths, Ks, exts = _two_view_plane()
    mask, dep = check_geometric_consistency(depths[0], Ks[0], exts[0],
                                            depths[1], Ks[1], exts[1])
    m = np.asarray(mask)
    # central pixels (which project inside the other view) must be consistent
    assert m[4:-4, 4:-4].all()
    np.testing.assert_allclose(np.asarray(dep)[4:-4, 4:-4], 2.0, rtol=1e-4)


def test_consistency_rejects_wrong_depth():
    depths, Ks, exts = _two_view_plane()
    wrong = depths.at[0].mul(1.2)  # ref depth off by 20%
    mask, _ = check_geometric_consistency(wrong[0], Ks[0], exts[0],
                                          depths[1], Ks[1], exts[1])
    assert not np.asarray(mask)[4:-4, 4:-4].any()


def test_filter_depths_multi_view():
    H = W = 16
    K = np.array([[16.0, 0, 8], [0, 16.0, 8], [0, 0, 1]], np.float32)
    exts = [np.eye(4, dtype=np.float32) for _ in range(4)]
    for i, tx in enumerate([0.0, 0.05, -0.05, 0.1]):
        exts[i][0, 3] = tx
    depths = jnp.asarray(np.full((4, H, W), 2.0, np.float32))
    conf = jnp.ones((4, H, W)) * 0.9
    avg, final = filter_depths(depths, jnp.asarray(np.stack([K] * 4)),
                               jnp.asarray(np.stack(exts)), conf,
                               conf_thresh=0.5, thres_view=3)
    assert np.asarray(final)[:, 6:-6, 6:-6].all()
    np.testing.assert_allclose(np.asarray(avg)[:, 6:-6, 6:-6], 2.0, rtol=1e-4)
    # low confidence kills acceptance
    _, final2 = filter_depths(depths, jnp.asarray(np.stack([K] * 4)),
                              jnp.asarray(np.stack(exts)), conf * 0.1)
    assert not np.asarray(final2).any()


def test_consensus_fusion_plane():
    H = W = 16
    K = np.array([[16.0, 0, 8], [0, 16.0, 8], [0, 0, 1]], np.float32)
    exts = [np.eye(4, dtype=np.float32) for _ in range(4)]
    for i, tx in enumerate([0.0, 0.05, -0.05, 0.1]):
        exts[i][0, 3] = tx
    depths = jnp.asarray(np.full((4, H, W), 2.0, np.float32))
    colors = jnp.ones((4, H, W, 3)) * 0.5
    out = consensus_fusion(depths, jnp.asarray(np.stack([K] * 4)),
                           jnp.asarray(np.stack(exts)), colors=colors,
                           depth_thresh=0.01, num_consistent=3)
    keep = np.asarray(out["keep"])
    pts = np.asarray(out["points"])[keep]
    assert keep.sum() > 100
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-3)  # plane at z=2
    cols = np.asarray(out["colors"])[keep]
    np.testing.assert_allclose(cols, 0.5, atol=1e-5)


def test_consensus_disparity_mode_matches_fusibile():
    """Golden divergence case for the two depth-agreement formulations.

    Two fronto-parallel cameras, baseline b=0.5, f=100; ref plane at z=1.0,
    source plane at 1.02. Pure-translation rig => the ref point's src-frame
    depth z stays 1.0, the src sample d_s is 1.02. Hand-computed accepts:
      relative:  |1.0-1.02|/1.02            = 0.019608
      fusibile:  f*b*|1/1.0 - 1/1.02|       = 0.980392  (fusibile.cu:51-54,
                 disparityDepthConversion with ref fx and ||C_r - C_s||)
    So relative mode at thresh 0.01 rejects while disparity mode at thresh
    1.0 accepts and at thresh 0.9 rejects — bracketing the hand value."""
    H, W = 8, 128
    f, b = 100.0, 0.5
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    ext0 = np.eye(4, dtype=np.float32)
    ext1 = np.eye(4, dtype=np.float32)
    ext1[0, 3] = -b  # camera center at x=+b
    depths = jnp.asarray(np.stack([np.full((H, W), 1.0, np.float32),
                                   np.full((H, W), 1.02, np.float32)]))
    Ks = jnp.asarray(np.stack([K, K]))
    exts = jnp.asarray(np.stack([ext0, ext1]))

    def keep0(**kw):
        out = consensus_fusion(depths, Ks, exts, num_consistent=1, **kw)
        # only ref-view-0 pixels that project inside view 1 (u shift is
        # f*b/z = 50 px) are meaningful; count accepted ref-0 pixels
        return np.asarray(out["keep"]).reshape(2, H, W)[0]

    rel = keep0(depth_thresh=0.01, depth_mode="relative")
    disp_accept = keep0(depth_thresh=1.0, depth_mode="disparity")
    disp_reject = keep0(depth_thresh=0.9, depth_mode="disparity")
    assert not rel.any()                  # 0.0196 > 0.01
    assert disp_accept[:, 64:-8].all()    # 0.9804 < 1.0, in-bounds pixels
    assert not disp_reject.any()          # 0.9804 > 0.9
    # sanity: modes agree when both thresholds are generous
    assert keep0(depth_thresh=0.05, depth_mode="relative")[:, 64:-8].all()


def test_ply_roundtrip_native_and_python(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.randn(1000, 3).astype(np.float32)
    cols = rng.randint(0, 255, (1000, 3), dtype=np.uint8)
    nrm = rng.randn(1000, 3).astype(np.float32)

    p1 = write_ply(tmp_path / "native.ply", pts, cols, nrm, use_native=True)
    p2 = write_ply(tmp_path / "python.ply", pts, cols, nrm, use_native=False)
    # identical bytes from both writers
    assert p1.read_bytes() == p2.read_bytes()

    back = read_ply(p1)
    np.testing.assert_array_equal(back["points"], pts)
    np.testing.assert_array_equal(back["colors"], cols)
    np.testing.assert_array_equal(back["normals"], nrm)


def test_depths_to_world_points():
    H = W = 8
    K = np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]], np.float32)
    ext = np.eye(4, dtype=np.float32)[None]
    depths = np.full((1, H, W), 2.0, np.float32)
    colors = np.ones((1, H, W, 3), np.float32)
    mask = np.zeros((1, H, W), bool)
    mask[0, 4, 4] = True
    pts, cols = depths_to_world_points(depths, K[None], ext, colors, mask)
    assert pts.shape == (1, 3)
    np.testing.assert_allclose(pts[0, 2], 2.0)
    assert cols[0, 0] == 255


def test_filter_depths_dynamic():
    from diner_tpu.fusion.consistency import filter_depths_dynamic

    H = W = 16
    K = np.array([[16.0, 0, 8], [0, 16.0, 8], [0, 0, 1]], np.float32)
    exts = [np.eye(4, dtype=np.float32) for _ in range(4)]
    for i, tx in enumerate([0.0, 0.05, -0.05, 0.1]):
        exts[i][0, 3] = tx
    depths = jnp.asarray(np.full((4, H, W), 2.0, np.float32))
    conf = jnp.ones((4, H, W)) * 0.9
    avg, final = filter_depths_dynamic(depths, jnp.asarray(np.stack([K] * 4)),
                                       jnp.asarray(np.stack(exts)), conf)
    assert np.asarray(final)[:, 6:-6, 6:-6].all()
    np.testing.assert_allclose(np.asarray(avg)[:, 6:-6, 6:-6], 2.0, rtol=1e-3)


def test_consensus_default_normals_pass_on_wide_baseline():
    """With normals=None the normal gate must pass trivially (fusibile's
    fake-normal path stores the identical constant in every view) — a
    camera-frame constant rotated per view would encode the relative view
    angle and empty the cloud on real multi-view rigs."""
    import numpy as np

    from diner_tpu.fusion.consensus import consensus_fusion

    H = W = 8
    f = 10.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

    def lookat(eye):
        eye = np.asarray(eye, np.float64)
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross([0, 0, 1.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R = np.stack([right, up, fwd])
        t = -R @ eye
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3], ext[:3, 3] = R, t
        return ext

    # two views ~60 degrees apart, both looking at the origin from above
    exts = np.stack([lookat([0, -2, 1.0]), lookat([np.sqrt(3), -1, 1.0])])
    Ks = np.stack([K, K])
    # both observe the world plane z=0: per-pixel depth solves
    # world_z(backproject(u, v, depth)) == 0
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    pix = np.stack([gx, gy, np.ones_like(gx)], 0).reshape(3, -1)
    depths = []
    for ext in exts:
        pose = np.linalg.inv(ext)
        dirs = np.linalg.inv(K) @ pix  # cam-space rays at depth 1
        denom = pose[2, :3] @ dirs
        depth = -pose[2, 3] / denom
        depths.append(depth.reshape(H, W).astype(np.float32))
    out = consensus_fusion(np.stack(depths), Ks, exts,
                           depth_thresh=0.05, normal_thresh=0.5,
                           num_consistent=1)
    assert bool(np.asarray(out["keep"]).any()), \
        "wide-baseline pair rejected by the default-normal gate"
