"""MultiFace dataset against a synthetic on-disk tree."""

import json

import numpy as np
import pytest

from diner_tpu.data.contract import validate_sample
from diner_tpu.data.multiface import MultiFaceDataset


def _make_fake_multiface(root, meta_dir, n_cams=8, H=128, W=160):
    """One subject/sequence/frame with a KRT rig on a circle (mm units)."""
    import imageio.v2 as imageio

    subj = "m--20180227--0000--0000000--GHS"
    seq = "SEN_test"
    rng = np.random.RandomState(0)
    krt_lines = []
    centers = []
    for i in range(n_cams):
        a = 2 * np.pi * i / n_cams
        eye = 1000.0 * np.array([np.sin(a), 0.0, -np.cos(a)])  # mm
        centers.append(eye)
        z = -eye / np.linalg.norm(eye)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        t = -R @ eye
        K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
        krt_lines.append(f"40000{i}")
        for r in K:
            krt_lines.append(" ".join(str(v) for v in r))
        krt_lines.append("0 0 0 0 0")
        for r in np.concatenate([R, t[:, None]], axis=1):
            krt_lines.append(" ".join(str(v) for v in r))
        krt_lines.append("")
    (root / subj).mkdir(parents=True)
    (root / subj / "KRT").write_text("\n".join(krt_lines) + "\n")

    for i in range(n_cams):
        cam = f"40000{i}"
        img_dir = root / subj / "images" / seq / cam
        img_dir.mkdir(parents=True)
        imageio.imwrite(img_dir / "000001.png",
                        rng.randint(0, 255, (H, W, 3), dtype=np.uint8))
        m_dir = root / subj / "masks" / seq / cam
        m_dir.mkdir(parents=True)
        imageio.imwrite(m_dir / "000001.png",
                        np.full((H, W), 255, np.uint8))
        d_dir = root / subj / "depths" / seq / cam
        d_dir.mkdir(parents=True)
        imageio.imwrite(d_dir / "000001.png",
                        (np.full((H, W), 1.0) / 1e-4).astype(np.uint16))

    split = {"val": {"subjects": [subj], "sequences": [seq],
                     "ref_centers": [c.tolist() for c in
                                     [centers[0], centers[2], centers[4],
                                      centers[6]]]},
             "train": {"subjects": [], "sequences": [], "ref_centers": []}}
    meta_dir.mkdir(parents=True, exist_ok=True)
    cfg = meta_dir / "tiny_subset.json"
    cfg.write_text(json.dumps(split))
    return root, cfg


@pytest.fixture(scope="module")
def fake_multiface(tmp_path_factory):
    root = tmp_path_factory.mktemp("mf")
    meta_dir = tmp_path_factory.mktemp("mf_meta")
    return _make_fake_multiface(root, meta_dir) + (meta_dir,)


def test_multiface_contract(fake_multiface):
    root, cfg, meta_dir = fake_multiface
    ds = MultiFaceDataset(root, stage="val", downsample=4, split_config=cfg,
                          meta_dir=meta_dir)
    assert len(ds) > 0
    s = ds[0]
    validate_sample(s)
    # downsample 4 with /32 alignment: 128/4 -> 32, 160/4 -> 40 -> 32
    assert s["target_rgb"].shape[0] % 32 == 0
    assert s["target_rgb"].shape[1] % 32 == 0
    # extrinsics converted mm -> m (cameras at 1 m radius)
    c = -s["src_extrinsics"][0, :3, :3].T @ s["src_extrinsics"][0, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(c), 1.0, rtol=1e-4)
    # constant sigma 1e-3 where depth > 0 (no conf files)
    assert np.allclose(s["src_depth_stds"][s["src_depths"] > 0], 1e-3)
    # gamma correction applied -> values differ from raw/255 but stay in [0,1]
    assert 0 <= s["target_rgb"].min() and s["target_rgb"].max() <= 1


def test_multiface_cam_sweep(fake_multiface):
    root, cfg, meta_dir = fake_multiface
    ds = MultiFaceDataset(root, stage="val", downsample=4, split_config=cfg,
                          meta_dir=meta_dir)
    exts = ds.get_cam_sweep_extrinsics(6, scan_idx=0)
    assert exts.shape == (6, 4, 4)
    for e in exts:
        np.testing.assert_allclose(e[:3, :3] @ e[:3, :3].T, np.eye(3),
                                   atol=1e-5)
