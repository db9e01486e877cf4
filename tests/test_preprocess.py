"""Preprocessing tools: rasterizer golden geometry, crop math, MVS dataset."""

import json

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


def test_color_calibration_recovers_affine():
    from diner_tpu.preprocess.color_calib import (
        fit_affine_color_transform, apply_affine_color_transform)

    rng = np.random.RandomState(0)
    ref = rng.rand(500, 3).astype(np.float32) * 0.8 + 0.1
    A_true = np.array([[1.1, 0.02, 0.0, 0.03],
                       [0.0, 0.9, 0.05, -0.02],
                       [0.01, 0.0, 1.05, 0.01]], np.float32)
    # src = inverse-transformed ref: fitting src->ref should recover A_true
    src = (ref - A_true[:, 3]) @ np.linalg.inv(A_true[:, :3]).T
    A = fit_affine_color_transform(src, ref, l2=1e-8)
    np.testing.assert_allclose(A, A_true, atol=5e-3)
    out = apply_affine_color_transform(src.reshape(20, 25, 3), A)
    np.testing.assert_allclose(out, ref.reshape(20, 25, 3), atol=5e-3)


def test_vertex_visibility_occlusion():
    from diner_tpu.preprocess.color_calib import vertex_visibility

    # two quads: near plane z=1.5 occludes far plane z=2 over half the image
    verts = np.array([
        [-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2],       # far quad
        [-1, -1, 1.5], [0, -1, 1.5], [0, 1, 1.5], [-1, 1, 1.5]  # near left half
    ], float)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]])
    K = np.array([[16.0, 0, 16], [0, 16.0, 16], [0, 0, 1]])
    visible, uv = vertex_visibility(verts, faces, K, np.eye(4), 32, 32)
    assert visible[4:].all()          # near quad fully visible
    assert visible[1] and visible[2]  # far right corners visible
    assert not visible[0] and not visible[3]  # far left corners occluded


def test_multiface_frame_render(tmp_path):
    from diner_tpu.preprocess.multiface import render_frame, write_frame_outputs
    from diner_tpu.data.codecs import read_depth_png

    verts = np.array([[-500, -500, 1000], [500, -500, 1000],
                      [500, 500, 1000], [-500, 500, 1000]], float)  # mm
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    krt = {"intrin": np.array([[16.0, 0, 16], [0, 16.0, 16], [0, 0, 1]]),
           "extrin": np.eye(4)[:3]}
    depth, mask = render_frame(verts, faces, krt, 32, 32)
    assert mask[16, 16]
    np.testing.assert_allclose(depth[16, 16], 1.0, rtol=1e-6)  # 1000 mm -> 1 m
    write_frame_outputs(depth, mask, tmp_path / "d.png", tmp_path / "m.png")
    np.testing.assert_allclose(read_depth_png(tmp_path / "d.png")[16, 16], 1.0,
                               atol=1e-4)


def test_md5_verify(tmp_path):
    from diner_tpu.preprocess.multiface import md5sum, verify_or_download

    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    good = md5sum(p)
    assert verify_or_download([("x.bin", "http://nope", good)], tmp_path) == []
    bad = verify_or_download([("x.bin", "http://nope", "0" * 32)], tmp_path)
    assert len(bad) == 1


def test_multiface_download_pipeline(tmp_path):
    """End-to-end manifest download against a file:// mirror: index parse ->
    category/expression filter -> fetch -> md5 verify -> untar -> resume
    (deps/multiface/download_dataset.py behavior)."""
    import tarfile

    from diner_tpu.preprocess.multiface import (
        download_entity, main, md5sum, parse_download_config, select_files)

    entity = "5067077"
    mirror = tmp_path / "mirror" / entity
    mirror.mkdir(parents=True)
    exp = "SEN_test_sentence"
    # one wanted tar, one wrong-expression tar, one excluded-category tar
    payload = mirror / "payload"
    payload.mkdir()
    (payload / "img.bin").write_bytes(b"image-bytes")
    tar_names = [f"--images--{exp}--cam1.tar",
                 "--images--SEN_other--cam1.tar",
                 f"--unwrapped_uv--{exp}--cam1.tar"]
    for t in tar_names:
        with tarfile.open(mirror / t, "w") as tf:
            tf.add(payload / "img.bin", arcname=f"{entity}{t[:-4]}/img.bin")
    (mirror / "metadata.tar").write_bytes(b"")  # metadata bypasses exp filter
    with tarfile.open(mirror / "metadata.tar", "w") as tf:
        tf.add(payload / "img.bin", arcname="metadata/meta.bin")
    chk_lines = [f"{md5sum(mirror / t)}  {t}"
                 for t in tar_names + ["metadata.tar"]]
    (mirror / "CHECKSUM").write_text("\n".join(chk_lines))
    names = tar_names + ["metadata.tar", "CHECKSUM", "index.html"]
    (mirror / "index.html").write_text(
        "<html>" + "".join(f'<a href="{n}">{n}</a>' for n in names) + "</html>")

    cfg_path = tmp_path / "download_dataset.json"
    cfg_path.write_text(json.dumps({
        "entity": [entity], "image": True, "mesh": True, "texture": False,
        "metadata": True, "audio": False, "expression": [exp]}))
    cfg = parse_download_config(cfg_path)
    kept = select_files(names, cfg)
    assert f"--images--{exp}--cam1.tar" in kept
    assert "--images--SEN_other--cam1.tar" not in kept  # expression filter
    assert f"--unwrapped_uv--{exp}--cam1.tar" not in kept  # texture off
    assert "metadata.tar" in kept and "CHECKSUM" in kept

    dest = tmp_path / "dest"
    root = (tmp_path / "mirror").as_uri() + "/"
    main(["--dest", str(dest), "--download-config", str(cfg_path),
          "--root", root])
    # untarred payloads present, tars consumed, markers left for resume
    assert (dest / f"{entity}--images--{exp}--cam1" / "img.bin").exists()
    assert (dest / "metadata" / "meta.bin").exists()
    assert not list(dest.glob("*.tar"))
    assert list(dest.glob("*.tar.unzip"))
    # resume: second run re-fetches nothing and keeps everything
    got, failed = download_entity(dest, entity, cfg, root=root)
    assert failed == [] and got == []


def test_visualize_helpers(tmp_path):
    from diner_tpu.data import SyntheticSphereDataset
    from diner_tpu.utils.visualize import save_sample_grid, save_camera_rig

    ds = SyntheticSphereDataset(n_scenes=1, n_views=2, H=16, W=16)
    s = ds[0]
    p1 = save_sample_grid(s, tmp_path / "grid.png")
    p2 = save_camera_rig(s["src_extrinsics"], tmp_path / "rig.png")
    assert p1.exists() and p2.exists()


def test_facescape_pipeline_roundtrip(tmp_path):
    """process_view + write_view produce files the FaceScape loader can read."""
    from diner_tpu.preprocess.facescape_pipeline import (
        process_view, write_view, write_cameras, apply_similarity)
    from diner_tpu.data.codecs import read_depth_png

    rng = np.random.RandomState(0)
    H = W = 64
    img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    dist = np.zeros(5)
    ext = np.eye(4)

    # quad at z=1.5m (already metric)
    verts_mm = np.array([[-300, -300, 1500], [300, -300, 1500],
                         [300, 300, 1500], [-300, 300, 1500]], float)
    verts = apply_similarity(verts_mm, 1e-3, np.eye(3), np.zeros(3))
    faces = np.array([[0, 1, 2], [0, 2, 3]])

    rgba, depth, K2 = process_view(img, K, dist, ext, verts, faces,
                                   crop_out=32)
    assert rgba.shape == (32, 32, 4)
    assert depth.shape == (32, 32)
    np.testing.assert_allclose(depth[depth > 0], 1.5, rtol=1e-5)
    assert rgba[..., 3].max() == 1.0

    vdir = write_view(tmp_path, 3, rgba, depth)
    assert (vdir / "rgba.png").exists()
    np.testing.assert_allclose(
        read_depth_png(vdir / "depth.png")[16, 16], 1.5, atol=1e-4)
    p = write_cameras(tmp_path, {3: {"extrinsics": ext, "intrinsics": K2}})
    import json as _json
    cams = _json.loads(p.read_text())
    assert "3" in cams and len(cams["3"]["extrinsics"]) == 3


def test_general_eval_mvs_dataset(tmp_path):
    """Standard MVSNet eval layout: pair.txt + cams + images."""
    import imageio.v2 as imageio
    from diner_tpu.mvs.datasets import GeneralEvalMVSDataset

    scan = tmp_path / "scan9"
    (scan / "images").mkdir(parents=True)
    (scan / "cams").mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        imageio.imwrite(scan / "images" / f"{i:08d}.jpg",
                        rng.randint(0, 255, (32, 64, 3), dtype=np.uint8))
        ext = np.eye(4)
        ext[0, 3] = i * 0.1
        el = "\n".join(" ".join(str(v) for v in r) for r in ext)
        K = np.array([[40.0, 0, 20], [0, 40.0, 16], [0, 0, 1]])
        kl = "\n".join(" ".join(str(v) for v in r) for r in K)
        (scan / "cams" / f"{i:08d}_cam.txt").write_text(
            f"extrinsic\n{el}\n\nintrinsic\n{kl}\n\n425.0 2.5\n")
    # pair.txt: 4 refs, each listing (count, [id score]*)
    pair = ["4"]
    for i in range(4):
        srcs = [j for j in range(4) if j != i][:2]
        pair.append(str(i))
        pair.append(f"{len(srcs)} " + " ".join(f"{s} 100.0" for s in srcs))
    (scan / "pair.txt").write_text("\n".join(pair) + "\n")

    ds = GeneralEvalMVSDataset(tmp_path, ["scan9"], nviews=3, ndepths=8)
    assert len(ds) == 4
    s = ds[0]
    assert s["imgs"].shape == (3, 32, 64, 3)
    # scale_mvs_input (general_eval.py:96-113): oversize inputs are capped
    # to (max_h, max_w), snapped down to /32, and K rescaled
    big = np.zeros((1200, 1600, 3), np.float32)
    Kfull = np.array([[2892.33, 0, 800.0], [0, 2892.33, 600.0], [0, 0, 1]],
                     np.float32)
    img2, K2 = GeneralEvalMVSDataset.scale_mvs_input(big, Kfull, 1152, 864)
    assert img2.shape[:2] == (864, 1152)
    assert img2.shape[0] % 32 == 0 and img2.shape[1] % 32 == 0
    np.testing.assert_allclose(K2[0, 0], 2892.33 * 1152 / 1600, rtol=1e-6)
    np.testing.assert_allclose(K2[1, 2], 600.0 * 864 / 1200, rtol=1e-6)
    # non-/32 sizes snap DOWN even under the cap
    odd = np.zeros((100, 130, 3), np.float32)
    img3, K3 = GeneralEvalMVSDataset.scale_mvs_input(odd, Kfull.copy(),
                                                     1152, 864)
    assert img3.shape[:2] == (96, 128)
    assert s["proj_matrices"]["stage1"].shape == (3, 2, 4, 4)
    assert s["depth_values"].shape == (8,)
    np.testing.assert_allclose(s["depth_values"][0], 425.0)
    # interval scale applied
    np.testing.assert_allclose(s["depth_values"][1] - s["depth_values"][0],
                               2.5 * 1.06, rtol=1e-5)
    # eval cam files store FULL-res K; stage1 must carry K/4
    # (general_eval.py:71) and stage3 recovers full res
    np.testing.assert_allclose(s["proj_matrices"]["stage1"][0, 1, 0, 0],
                               40.0 / 4.0)
    np.testing.assert_allclose(s["proj_matrices"]["stage3"][0, 1, 0, 0], 40.0)


def test_reproject_depth_to_csv(tmp_path):
    """Plane at depth 2 with identity pose -> all world z == 2, xy spans the
    frustum footprint."""
    from diner_tpu.utils.visualize import reproject_depth_to_csv

    H = W = 8
    K = np.array([[10.0, 0, W / 2], [0, 10.0, H / 2], [0, 0, 1]])
    depth = np.full((H, W), 2.0)
    depth[0, 0] = 0.0  # hole must be skipped
    path = reproject_depth_to_csv(depth, K, np.eye(4), tmp_path / "pc.csv")
    pts = np.loadtxt(path, delimiter=",", skiprows=1)
    assert pts.shape == (H * W - 1, 3)
    np.testing.assert_allclose(pts[:, 2], 2.0)
    assert abs(pts[:, 0]).max() < 2.0 * (W / 2 + 0.5) / 10.0


def test_color_calibrate_pose_dir(tmp_path):
    """Two views of a quad, one with an affine color cast: calibration pulls
    both toward the cross-view mean (calibrate_colors.py behavior)."""
    import imageio.v2 as imageio
    import json

    from diner_tpu.preprocess.color_calib import calibrate_pose_dir
    from diner_tpu.preprocess.rasterizer import render_depth

    H = W = 48
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    # dense grid mesh: enough vertices for the >=16-point affine fit
    n = 9
    gy, gx = np.mgrid[0:n, 0:n].astype(np.float32) / (n - 1)
    verts = np.stack([gx * 0.8 - 0.4, gy * 0.8 - 0.4,
                      np.ones_like(gx)], axis=-1).reshape(-1, 3)
    faces = []
    for r in range(n - 1):
        for c in range(n - 1):
            a = r * n + c
            faces += [[a, a + 1, a + n + 1], [a, a + n + 1, a + n]]
    faces = np.asarray(faces, np.int32)

    # world-position-dependent texture so the affine fit is well-posed
    def texture(xy):
        u = (xy[..., 0] + 0.4) / 0.8
        v = (xy[..., 1] + 0.4) / 0.8
        return np.stack([0.2 + 0.6 * u, 0.5 * np.ones_like(u),
                         0.2 + 0.6 * v], axis=-1)

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32) + 0.5
    pose = tmp_path / "pose"
    cams = {}
    for i, cast in enumerate([(1.0, 0.0), (0.7, 0.1)]):  # scale, offset
        ext = np.eye(4, dtype=np.float32)
        ext[0, 3] = 0.02 * i  # slightly different viewpoint
        depth, mask = render_depth(verts, faces, K, ext[:3], H, W)
        # backproject pixel centers at the rendered depth -> world xy
        wx = (xs - K[0, 2]) / K[0, 0] * depth - ext[0, 3]
        wy = (ys - K[1, 2]) / K[1, 1] * depth
        rgb = np.ones((H, W, 3), np.float32)
        tex = texture(np.stack([wx, wy], axis=-1))
        rgb[mask] = np.clip(tex[mask] * cast[0] + cast[1], 0, 1)
        rgba = np.concatenate([rgb, mask[..., None].astype(np.float32)], -1)
        vdir = pose / f"view_{i:05d}"
        vdir.mkdir(parents=True)
        imageio.imwrite(vdir / "rgba.png", (rgba * 255).astype(np.uint8))
        cams[str(i)] = {"extrinsics": ext[:3].tolist(),
                        "intrinsics": K.tolist()}
    (pose / "cameras.json").write_text(json.dumps(cams))

    transforms = calibrate_pose_dir(pose, verts, faces)
    assert set(transforms) == {"0", "1"}

    c0 = np.asarray(imageio.imread(pose / "view_00000" / "rgba_colorcalib.png"),
                    np.float32)[..., :3] / 255.0
    c1 = np.asarray(imageio.imread(pose / "view_00001" / "rgba_colorcalib.png"),
                    np.float32)[..., :3] / 255.0
    r0 = np.asarray(imageio.imread(pose / "view_00000" / "rgba.png"),
                    np.float32)[..., :3] / 255.0
    r1 = np.asarray(imageio.imread(pose / "view_00001" / "rgba.png"),
                    np.float32)[..., :3] / 255.0
    # compare on an eroded shared-foreground region (avoid edge/background)
    _, m0 = render_depth(verts, faces, K, np.eye(4, dtype=np.float32)[:3], H, W)
    interior = m0.copy()
    for sh in (1, -1):
        interior &= np.roll(m0, sh, 0) & np.roll(m0, sh, 1) \
            & np.roll(np.roll(m0, sh, 0), sh, 1)
    before = np.abs(r0[interior] - r1[interior]).mean()
    after = np.abs(c0[interior] - c1[interior]).mean()
    assert after < before * 0.35, (after, before)


def test_extract_tar_rejects_traversal_and_links(tmp_path):
    """extract_tar must reject sibling-prefix traversal (a startswith check
    would accept '<dest>-evil/') and link members (a symlink out of dest plus
    a file through it escapes name-only checks)."""
    import io
    import tarfile

    import pytest

    from diner_tpu.preprocess.multiface import extract_tar

    dest = tmp_path / "MULTIFACE"
    dest.mkdir()

    def make_tar(path, add):
        with tarfile.open(path, "w") as tf:
            add(tf)

    # sibling-prefix traversal: ../MULTIFACE-evil/x resolves OUTSIDE dest but
    # str-startswith(str(dest)) accepts it
    evil = tmp_path / "evil.tar"

    def add_evil(tf):
        data = b"pwned"
        info = tarfile.TarInfo("../MULTIFACE-evil/x")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))

    make_tar(evil, add_evil)
    with pytest.raises(ValueError, match="unsafe tar member"):
        extract_tar(evil, dest)
    assert not (tmp_path / "MULTIFACE-evil").exists()

    # symlink member
    link = tmp_path / "link.tar"

    def add_link(tf):
        info = tarfile.TarInfo("out")
        info.type = tarfile.SYMTYPE
        info.linkname = "../../etc"
        tf.addfile(info)

    make_tar(link, add_link)
    with pytest.raises(ValueError, match="link tar member"):
        extract_tar(link, dest)

    # a benign tar still extracts and drops the .unzip marker
    good = tmp_path / "good.tar"

    def add_good(tf):
        data = b"ok"
        info = tarfile.TarInfo("sub/file.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))

    make_tar(good, add_good)
    extract_tar(good, dest)
    assert (dest / "sub" / "file.txt").read_bytes() == b"ok"
    assert (tmp_path / "good.tar.unzip").exists()
