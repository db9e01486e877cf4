"""Dataset loaders against synthetic on-disk fixtures (format parity)."""

import json

import numpy as np
import pytest

from diner_tpu.data.codecs import (
    read_pfm, write_pfm, read_depth_png, write_depth_png,
    read_mvsnet_cam, write_mvsnet_cam, DEPTH_SCALE_FACTOR,
)
from diner_tpu.data.contract import validate_sample
from diner_tpu.data.dtu import DTUDataset
from diner_tpu.data.multiface import gamma_correct, load_krt


def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    d = rng.rand(13, 17).astype(np.float32) * 5
    write_pfm(tmp_path / "x.pfm", d)
    back, scale = read_pfm(tmp_path / "x.pfm")
    np.testing.assert_array_equal(back, d)
    rgb = rng.rand(7, 9, 3).astype(np.float32)
    write_pfm(tmp_path / "c.pfm", rgb)
    back, _ = read_pfm(tmp_path / "c.pfm")
    np.testing.assert_array_equal(back, rgb)


def test_depth_png_roundtrip(tmp_path):
    d = np.array([[0.0, 0.1234], [1.5, 6.5]], np.float32)
    write_depth_png(tmp_path / "d.png", d)
    back = read_depth_png(tmp_path / "d.png")
    np.testing.assert_allclose(back, d, atol=DEPTH_SCALE_FACTOR)
    assert back[0, 0] == 0.0  # invalid stays invalid


def test_mvsnet_cam_roundtrip(tmp_path):
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 3] = [1, 2, 3]
    K = np.array([[100.0, 0, 50], [0, 110.0, 40], [0, 0, 1]], np.float32)
    write_mvsnet_cam(tmp_path / "c_cam.txt", ext, K, 425.0, 2.5)
    e2, k2, (dmin, dint) = read_mvsnet_cam(tmp_path / "c_cam.txt")
    np.testing.assert_allclose(e2, ext, rtol=1e-6)
    np.testing.assert_allclose(k2, K, rtol=1e-6)
    assert (dmin, dint) == (425.0, 2.5)


def _make_fake_dtu(root, n_scans=1, all_cams=False):
    """Tiny DTU-layout tree with the real file naming: 49 cam files,
    512x640 rectified images (-> 256x320 at downsample 0.5) for the cams the
    first sample touches, TransMVSNet uint16 depth/conf at 512x640.

    all_cams=True additionally writes (constant-color, cheap) target images
    for every cam x light so ANY meta index is loadable — needed by tests
    that exercise the deterministic Random(0) eval subset."""
    import imageio.v2 as imageio

    cam_dir = root / "Cameras" / "train"
    cam_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    K = np.array([[360.0, 0, 80.0], [0, 360.0, 64.0], [0, 0, 1]])
    for i in range(49):
        ext = np.eye(4)
        ext[:3, 3] = rng.randn(3) * 100
        ext_lines = "\n".join(" ".join(str(v) for v in row) for row in ext)
        k_lines = "\n".join(" ".join(str(v) for v in row) for row in K)
        (cam_dir / f"{i:08d}_cam.txt").write_text(
            f"extrinsic\n{ext_lines}\n\nintrinsic\n{k_lines}\n\n425.0 2.5\n")
    scans = [f"scan{i+1}" for i in range(n_scans)]
    needed_cams = [0, 30, 10, 6, 35]
    for scan in scans:
        img_dir = root / "Rectified" / f"{scan}_train"
        img_dir.mkdir(parents=True)
        d_dir = root / "Depths" / scan
        d_dir.mkdir(parents=True)
        for cam in needed_cams:
            imageio.imwrite(img_dir / f"rect_{cam + 1:03d}_0_r5000.png",
                            rng.randint(0, 255, (512, 640, 3), dtype=np.uint8))
        if all_cams:
            for cam in range(49):
                for light in range(7):
                    p = img_dir / f"rect_{cam + 1:03d}_{light}_r5000.png"
                    if not p.exists():
                        imageio.imwrite(p, np.full(
                            (512, 640, 3), 40 + 3 * cam + light,
                            dtype=np.uint8))
        for cam_id in needed_cams[1:]:
            d = rng.rand(512, 640) * 900 + 400  # mm
            # write exactly what TransMVSNet's write_prediction writes:
            # uint16 of (depth * training-scale) / 1e-4
            imageio.imwrite(d_dir / f"depth_map_{cam_id:04d}_TransMVSNet.png",
                            (d * (0.7 / 872.0) / 1e-4).astype(np.uint16))
            imageio.imwrite(d_dir / f"depth_map_{cam_id:04d}_TransMVSNet_conf.png",
                            (np.full((512, 640), 0.9) * (0.7 / 872.0) / 1e-4
                             ).astype(np.uint16))
    split_dir = root / "splits"
    split_dir.mkdir()
    (split_dir / "dtu_train_all.txt").write_text("\n".join(scans) + "\n")
    (split_dir / "dtu_val_all.txt").write_text("\n".join(scans) + "\n")
    return split_dir


@pytest.fixture(scope="module")
def fake_dtu(tmp_path_factory):
    root = tmp_path_factory.mktemp("dtu")
    split_dir = _make_fake_dtu(root)
    return root, split_dir


def test_dtu_dataset_contract(fake_dtu):
    root, split_dir = fake_dtu
    ds = DTUDataset(root, stage="train", split_dir=split_dir)
    assert len(ds) == 1 * 49 * 7
    s = ds[0]
    validate_sample(s)
    H, W = s["target_rgb"].shape[:2]
    assert (H, W) == (256, 320)  # 512x640 * 0.5
    assert s["src_rgbs"].shape[0] == 4
    # znear/zfar constants
    np.testing.assert_allclose(ds.znear, 400 * 0.7 / 872)
    np.testing.assert_allclose(ds.zfar, 1500 * 0.7 / 872)
    # depth values: written as mm*sf, read back /sf then *sf -> original mm*sf
    assert s["src_depths"].max() <= 1500 * 0.7 / 872 * 1.01
    assert s["src_depths"].min() >= 0
    # conf2std applied
    assert s["src_depth_stds"].min() < 3.3e-2
    ds.check_depth_existence()  # must not raise


def test_dtu_cam_sweep(fake_dtu):
    root, split_dir = fake_dtu
    ds = DTUDataset(root, stage="val", split_dir=split_dir)
    exts = ds.get_cam_sweep_extrinsics(5)
    assert exts.shape == (5, 4, 4)
    # valid rigid transforms
    for e in exts:
        np.testing.assert_allclose(e[:3, :3] @ e[:3, :3].T, np.eye(3), atol=1e-4)


def test_gamma_correct_golden():
    """Matches the reference formula at a hand-computed point."""
    img = np.full((2, 2, 3), 0.5, np.float32)
    out = gamma_correct(img, dim=-1)
    scale = np.array([1.4, 1.1, 1.6]) / 1.1
    x = 0.5 * scale
    expect = np.clip((1 / (1 - 3 / 255) * 0.95 * np.clip(x - 3 / 255, 0, 2))
                     ** 0.5 - 15 / 255, 0, 2)
    np.testing.assert_allclose(out[0, 0], expect, rtol=1e-6)


def test_load_krt(tmp_path):
    content = (
        "cam001\n"
        "100 0 50\n0 100 40\n0 0 1\n"
        "0 0 0 0 0\n"
        "1 0 0 10\n0 1 0 20\n0 0 1 30\n"
        "\n"
        "cam002\n"
        "200 0 60\n0 200 50\n0 0 1\n"
        "0 0 0 0 0\n"
        "1 0 0 -5\n0 1 0 -6\n0 0 1 -7\n"
        "\n")
    (tmp_path / "KRT").write_text(content)
    krt = load_krt(tmp_path / "KRT")
    assert set(krt) == {"cam001", "cam002"}
    np.testing.assert_allclose(krt["cam001"]["intrin"][0, 0], 100)
    np.testing.assert_allclose(krt["cam002"]["extrin"][:, 3], [-5, -6, -7])


def test_synthetic_dataset_contract():
    from diner_tpu.data import SyntheticSphereDataset

    ds = SyntheticSphereDataset(n_scenes=2, n_views=3, H=32, W=40)
    s = ds[1]
    validate_sample(s)
    assert s["src_depths"][s["src_depths"] > 0].min() >= ds.znear * 0.5


def test_dmb_roundtrip(tmp_path):
    from diner_tpu.data.codecs import write_dmb, read_dmb, fake_gipuma_normals

    rng = np.random.RandomState(0)
    d = rng.rand(7, 9).astype(np.float32)
    write_dmb(tmp_path / "d.dmb", d)
    np.testing.assert_array_equal(read_dmb(tmp_path / "d.dmb"), d)
    img3 = rng.rand(5, 6, 3).astype(np.float32)
    write_dmb(tmp_path / "n.dmb", img3)
    np.testing.assert_array_equal(read_dmb(tmp_path / "n.dmb"), img3)
    n = fake_gipuma_normals(np.array([[0.0, 2.0]]))
    assert n[0, 0].sum() == 0
    np.testing.assert_allclose(np.linalg.norm(n[0, 1]), 1.0, rtol=1e-6)


def test_gipuma_cam_writer(tmp_path):
    from diner_tpu.data.codecs import write_gipuma_cam

    K = np.array([[100.0, 0, 50], [0, 110.0, 40], [0, 0, 1]])
    ext = np.eye(4)
    ext[:3, 3] = [1, 2, 3]
    write_gipuma_cam(tmp_path / "cam.txt", ext, K)
    P = np.loadtxt(tmp_path / "cam.txt")
    np.testing.assert_allclose(P, K @ ext[:3, :4], rtol=1e-6)


def test_batch_loader_io_retry():
    from diner_tpu.data.loader import BatchLoader

    class Flaky:
        def __init__(self):
            self.fails = {1: 2}  # index 1 fails twice then succeeds

        def __len__(self):
            return 4

        def __getitem__(self, i):
            if self.fails.get(i, 0) > 0:
                self.fails[i] -= 1
                raise OSError("transient")
            return {"x": np.full((2, 2), i, np.float32)}

    loader = BatchLoader(Flaky(), batch_size=2, shuffle=False,
                         shard_across_processes=False, num_threads=1)
    batches = list(loader)
    assert len(batches) == 2
    vals = sorted(float(b["x"][i, 0, 0]) for b in batches for i in range(2))
    assert vals == [0.0, 1.0, 2.0, 3.0]  # the flaky sample recovered


def test_native_png16_codec(tmp_path):
    """C++ PNG16 codec: round-trip, imageio cross-compat both directions,
    and all filter types decode (imageio/PIL picks adaptive filters)."""
    import imageio.v2 as imageio

    from diner_tpu.data.codecs import read_png16, write_png16, _png_native

    assert _png_native() is not None, "native codec failed to build"
    rng = np.random.RandomState(0)
    # smooth + noisy mix so the PIL encoder exercises Sub/Up/Avg/Paeth rows
    gy, gx = np.mgrid[0:37, 0:53]
    img = (1000 * np.sin(gx / 9.0) * np.cos(gy / 7.0) + 5000
           + rng.randint(0, 300, (37, 53))).astype(np.uint16)

    # native write -> native read
    write_png16(tmp_path / "a.png", img)
    np.testing.assert_array_equal(read_png16(tmp_path / "a.png"), img)
    # native write -> imageio read
    np.testing.assert_array_equal(
        np.asarray(imageio.imread(tmp_path / "a.png")), img)
    # imageio write -> native read
    imageio.imwrite(tmp_path / "b.png", img)
    np.testing.assert_array_equal(read_png16(tmp_path / "b.png"), img)
    # 8-bit grayscale widens without scaling
    img8 = rng.randint(0, 255, (11, 13)).astype(np.uint8)
    imageio.imwrite(tmp_path / "c.png", img8)
    np.testing.assert_array_equal(read_png16(tmp_path / "c.png"),
                                  img8.astype(np.uint16))


def test_loader_propagates_dataset_errors():
    """A dataset exception surfaces in the consumer instead of silently
    truncating the epoch."""
    from diner_tpu.data.loader import BatchLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise ValueError("corrupt sample")
            return {"x": np.zeros(2, np.float32)}

    loader = BatchLoader(Bad(), batch_size=2, shuffle=False,
                         shard_across_processes=False, arrays_only=False)
    with pytest.raises(ValueError, match="corrupt sample"):
        list(loader)


def test_loader_releases_producer_on_abandon():
    """Closing the iterator mid-epoch unblocks the producer thread."""
    import threading
    import time as _time

    from diner_tpu.data.loader import BatchLoader

    class Slow:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.zeros(2, np.float32)}

    loader = BatchLoader(Slow(), batch_size=2, shuffle=False, prefetch=1,
                         shard_across_processes=False, arrays_only=False)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # abandon the epoch
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_bld_dataset_rejects_missing_listfile(tmp_path):
    from diner_tpu.mvs.datasets import BlendedMVSDataset

    with pytest.raises(FileNotFoundError):
        BlendedMVSDataset(tmp_path, tmp_path / "no_such_list.txt")
