"""FaceScape dataset against a synthetic on-disk tree: meta generation,
frustum filtering, sample contract, MVS adapter."""

import json

import numpy as np
import pytest

from diner_tpu.data.contract import validate_sample
from diner_tpu.data.facescape import FacescapeDataset


def _lookat_ext(eye):
    eye = np.asarray(eye, np.float64)
    z = -eye / np.linalg.norm(eye)  # look at origin
    up = np.array([0.0, 0.0, -1.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    ext = np.eye(4)
    ext[:3, :3] = np.stack([x, y, z])
    ext[:3, 3] = -ext[:3, :3] @ eye
    return ext


def _make_fake_facescape(root, n_views=12):
    """One subject, one expression, cameras on a sphere around the origin.

    FaceScape convention: camera directions from centers toward origin;
    'frontal' is -y (facescape.py:123)."""
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    scan = root / "001" / "01"
    scan.mkdir(parents=True)
    cam_dict = {}
    az = np.linspace(-np.pi / 3, np.pi / 3, n_views)
    for i, a in enumerate(az):
        el = 0.2 * np.sin(3 * a)
        eye = 1.6 * np.array([np.sin(a) * np.cos(el), -np.cos(a) * np.cos(el),
                              np.sin(el)])
        ext = _lookat_ext(eye)
        K = [[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1.0]]
        cam_dict[str(i)] = {"extrinsics": ext[:3].tolist(), "intrinsics": K}
        vdir = scan / f"view_{i:05d}"
        vdir.mkdir()
        rgba = rng.randint(0, 255, (32, 32, 4), dtype=np.uint8)
        rgba[..., 3] = 255
        imageio.imwrite(vdir / "rgba_colorcalib.png", rgba)
        depth_m = rng.rand(32, 32) * 0.4 + 1.4  # ~head distance
        imageio.imwrite(vdir / "depth_TransMVSNet.png",
                        (depth_m / 1e-4).astype(np.uint16))
        # GT mesh-rendered depth (MVS training target, facescape.py:18)
        imageio.imwrite(vdir / "depth.png",
                        (depth_m / 1e-4).astype(np.uint16))
        imageio.imwrite(vdir / "depth_TransMVSNet_conf.png",
                        (0.9 / 1e-4 * np.ones((32, 32))).astype(np.uint16))
        (scan / "3dlmks.npy").write_bytes(b"")
    (scan / "cameras.json").write_text(json.dumps(cam_dict))
    return root


@pytest.fixture(scope="module")
def fake_facescape(tmp_path_factory):
    root = tmp_path_factory.mktemp("facescape")
    meta_dir = tmp_path_factory.mktemp("fs_meta")
    _make_fake_facescape(root)
    return root, meta_dir


def test_meta_generation_and_sample(fake_facescape):
    root, meta_dir = fake_facescape
    ds = FacescapeDataset(root, stage="val", meta_dir=meta_dir,
                          val_subjects=["001"], range_hor=45, range_vert=30,
                          slide_range=0)
    assert len(ds) > 0
    meta = ds.metas[0]
    assert len(meta["ref_ids"]) == 4
    # targets are never the primary reference views
    prim = {r[0] for r in meta["ref_ids"]}
    for m in ds.metas:
        assert m["target_id"] not in {r[0] for r in m["ref_ids"]}

    s = ds[0]
    validate_sample(s)
    assert s["target_rgb"].shape == (32, 32, 3)
    assert s["src_depths"].max() <= ds.zfar
    # conf2std applied: sigma = -1.582e-2*0.9 + 1.649e-2
    expect_std = -1.582e-2 * 0.9 + 1.649e-2
    np.testing.assert_allclose(s["src_depth_stds"][0, 0, 0, 0], expect_std,
                               rtol=1e-3)
    # metas are cached to disk and reload identically
    ds2 = FacescapeDataset(root, stage="val", meta_dir=meta_dir,
                           val_subjects=["001"], range_hor=45, range_vert=30,
                           slide_range=0)
    assert ds2.metas == ds.metas


def test_facescape_cam_sweep(fake_facescape):
    root, meta_dir = fake_facescape
    ds = FacescapeDataset(root, stage="val", meta_dir=meta_dir,
                          val_subjects=["001"], slide_range=0)
    exts = ds.get_cam_sweep_extrinsics(4, scan_idx=0)
    assert exts.shape == (4, 4, 4)
    for e in exts:
        np.testing.assert_allclose(e[:3, :3] @ e[:3, :3].T, np.eye(3),
                                   atol=1e-5)
        # camera at radius 1.8 from origin
        c = -e[:3, :3].T @ e[:3, 3]
        np.testing.assert_allclose(np.linalg.norm(c), 1.8, rtol=1e-5)


def test_facescape_mvs_adapter(fake_facescape):
    root, meta_dir = fake_facescape
    from diner_tpu.mvs.datasets import FacescapeMVSDataset

    ds = FacescapeMVSDataset(root, stage="val", ndepths=16, meta_dir=meta_dir,
                             val_subjects=["001"], slide_range=0)
    # leave-one-out over UNIQUE camera quadruples (reference facescape.py:
    # 62-79 dedups runs sharing scan_path+ref_ids): the fake tree's many
    # targets share one quadruple, so the adapter must NOT multiply by them
    uniq = {(m["scan_path"], tuple(tuple(r) for r in m["ref_ids"]))
            for m in ds.base.metas}
    assert len(ds) == 4 * len(uniq)
    assert len(ds.base.metas) > len(uniq)  # the dedup actually collapsed
    s = ds[0]
    assert s["imgs"].shape[0] == 4
    assert s["proj_matrices"]["stage1"].shape == (4, 2, 4, 4)
    dv = s["depth_values"]
    np.testing.assert_allclose([dv[0], dv[-1]], [1.0, 2.5])
    # stage scaling: stage3 intrinsics = 4x stage1
    np.testing.assert_allclose(s["proj_matrices"]["stage3"][:, 1, 0, 0],
                               4 * s["proj_matrices"]["stage1"][:, 1, 0, 0])


def test_facescape_check_depth_existence(fake_facescape):
    root, meta_dir = fake_facescape
    ds = FacescapeDataset(root, stage="val", meta_dir=meta_dir,
                          val_subjects=["001"], range_hor=45, range_vert=30,
                          slide_range=0)
    ds.check_depth_existence()  # all present -> no raise
    # point at a nonexistent depth filename -> must raise with the paths
    ds.DEPTH_FNAME = "depth_missing.png"
    with pytest.raises(FileNotFoundError):
        ds.check_depth_existence()


def test_mvs_write_facescape_cli(fake_facescape, tmp_path):
    """`mvs write --dataset facescape` writes depth/conf priors next to the
    GT depth files (write_to_facescape.sh contract, metric scale 1.0).

    The writer mutates the dataset tree (it overwrites depth_TransMVSNet.png
    with untrained-net predictions), so run it on a private copy — otherwise
    later tests regenerate metas from depths that fail the zfar/frontal
    filters and see an empty dataset."""
    import json
    import shutil

    from diner_tpu.cli.mvs import main

    shared_root, shared_meta = fake_facescape
    root = tmp_path / "facescape"
    shutil.copytree(shared_root, root)
    meta_dir = tmp_path / "meta"
    shutil.copytree(shared_meta, meta_dir)
    kwargs = json.dumps({"meta_dir": str(meta_dir), "val_subjects": ["001"],
                         "slide_range": 0})
    # --dcn-impl window drives the gather-free stencil DCN through the full
    # CLI (the default gather path stays covered by the data-parallel and
    # chain tests)
    main(["write", "--dataset", "facescape", "--datapath", str(root),
          "--listfile", "unused", "--dataset-kwargs", kwargs,
          "--ndepths", "8,8,8", "--numdepth", "16",
          "--cr_base_chs", "4,4,4", "--base_channels", "4",
          "--dcn-impl", "window"])
    written = list(root.rglob("*_TransMVSNet.png"))
    assert written, "no depth priors written"
    assert list(root.rglob("*_TransMVSNet_conf.png"))


def test_mvs_write_facescape_data_parallel(fake_facescape, tmp_path):
    """`mvs write --data-parallel` on the virtual 8-device mesh: a batch of
    samples sharded over the data axis, one cascade per device (the
    reference's 8-GPU condor sharding, transmvsnet_train_dtu.sub)."""
    import json
    import shutil

    from diner_tpu.cli.mvs import main

    shared_root, shared_meta = fake_facescape
    root = tmp_path / "facescape"
    shutil.copytree(shared_root, root)
    kwargs = json.dumps({"meta_dir": str(tmp_path / "meta"),
                         "val_subjects": ["001"], "slide_range": 0})
    (tmp_path / "meta").mkdir()
    main(["write", "--dataset", "facescape", "--datapath", str(root),
          "--listfile", "unused", "--dataset-kwargs", kwargs,
          "--ndepths", "8,8,8", "--numdepth", "16",
          "--cr_base_chs", "4,4,4", "--base_channels", "4",
          "--data-parallel"])
    assert list(root.rglob("*_TransMVSNet.png"))
    assert list(root.rglob("*_TransMVSNet_conf.png"))


def test_mvs_train_facescape_cli(fake_facescape, tmp_path):
    """`mvs train --dataset facescape` runs: the adapter supplies GT
    depth/mask pyramids from depth.png (reference facescape.py:159-162)."""
    import json

    from diner_tpu.cli.mvs import main

    root, meta_dir = fake_facescape
    kwargs = json.dumps({"meta_dir": str(tmp_path / "meta"), "val_subjects": [],
                         "slide_range": 0})
    (tmp_path / "meta").mkdir()
    main(["train", "--dataset", "facescape", "--datapath", str(root),
          "--listfile", "unused", "--dataset-kwargs", kwargs,
          "--logdir", str(tmp_path / "tr"),
          "--ndepths", "8,8,8", "--numdepth", "16",
          "--cr_base_chs", "4,4,4", "--base_channels", "4",
          "--max-steps", "2", "--batch-size", "1", "--log-every", "1"])
    assert any((tmp_path / "tr" / "ckpts").iterdir())


def test_mvs_write_then_diner_train_chain(fake_facescape, tmp_path):
    """The reference's end-to-end workflow on ONE tree: the MVS writer
    produces the depth/conf priors (write_to_facescape.sh), then DINER
    trains consuming exactly those priors (train.py, configs/
    train_facescape.yaml). Metas for both stages are generated and cached
    BEFORE the write — view selection happens once per dataset in the
    reference too — so the chained DINER stage reloads them and reads the
    freshly written (untrained-net) priors instead of re-filtering on them.
    """
    import json
    import shutil

    import imageio.v2 as imageio
    import yaml

    from diner_tpu.cli.mvs import main as mvs_main
    from diner_tpu.cli.train import main as train_main

    shared_root, _ = fake_facescape
    root = tmp_path / "facescape"
    shutil.copytree(shared_root, root)
    meta_dir = tmp_path / "meta"
    meta_dir.mkdir()

    common = dict(meta_dir=meta_dir, range_hor=45, range_vert=30,
                  slide_range=0)
    # cache metas for both stage variants on the pristine tree
    ds_val = FacescapeDataset(root, stage="val", val_subjects=["001"],
                              **common)
    FacescapeDataset(root, stage="train", val_subjects=[], **common)
    assert len(ds_val) > 0
    probe = (root / "001" / "01" / ds_val.int_to_viewdir(
        int(ds_val[0]["src_view_ids"][0])) / ds_val.DEPTH_FNAME)
    original = probe.read_bytes()

    kwargs = json.dumps({"meta_dir": str(meta_dir), "val_subjects": ["001"],
                         "slide_range": 0})
    mvs_main(["write", "--dataset", "facescape", "--datapath", str(root),
              "--listfile", "unused", "--dataset-kwargs", kwargs,
              "--ndepths", "8,8,8", "--numdepth", "16",
              "--cr_base_chs", "4,4,4", "--base_channels", "4"])
    assert probe.read_bytes() != original, "writer did not refresh the prior"

    # the DINER dataset (cached metas) now serves the freshly written priors
    ds_after = FacescapeDataset(root, stage="val", val_subjects=["001"],
                                **common)
    s = ds_after[0]
    sid = int(s["src_view_ids"][0])
    written = imageio.imread(
        root / "001" / "01" / ds_after.int_to_viewdir(sid)
        / ds_after.DEPTH_FNAME).astype(np.float32) * 1e-4
    np.testing.assert_allclose(s["src_depths"][0, ..., 0], written, atol=1e-6)

    # train DINER on the same tree via the CLI
    fs_kwargs = dict(root=str(root), meta_dir=str(meta_dir), slide_range=0,
                     range_hor=45, range_vert=30)
    conf = {
        "logger": {"kwargs": {"save_dir": str(tmp_path / "diner")}},
        "data": {
            "train": {"dataset": {"module": "FacescapeDataset",
                                  "kwargs": {**fs_kwargs, "val_subjects": []}},
                      "dataloader": {"kwargs": {"batch_size": 1,
                                                "shuffle": True,
                                                "num_workers": 1}}},
            "val": {"dataset": {"module": "FacescapeDataset",
                                "kwargs": {**fs_kwargs,
                                           "val_subjects": ["001"]}},
                    "dataloader": {"kwargs": {"batch_size": 1,
                                              "shuffle": False}}}},
        "nerf": {"kwargs": {
            "encoder_conf": {"kwargs": {"num_layers": 2, "norm": "group",
                                        "image_padding": 4, "padding_pe": 2}},
            "poscode_conf": {"kwargs": {"num_freqs": 2, "freq_factor": 6.28,
                                        "include_input": True}},
            "mlp_fine_conf": {"kwargs": {"n_blocks": 2, "d_hidden": 16,
                                         "combine_layer": 1}}}},
        "renderer": {"kwargs": {"n_samples": 4, "n_depth_candidates": 16,
                                "n_gaussian": 2, "white_bkgd": True}},
        "optimizer": {"kwargs": {"lr": 1e-3, "ray_batch_size": 16,
                                 "n_samples_score_eval": 1}},
        "trainer": {"kwargs": {"max_steps": 2, "val_check_interval": 2}},
        "checkpointing": {"kwargs": {"every_n_train_steps": 2}},
    }
    cfg_path = tmp_path / "chain.yaml"
    cfg_path.write_text(yaml.safe_dump(conf))
    run_dir = tmp_path / "diner" / "run"
    train_main([str(cfg_path), "--run-dir", str(run_dir)])
    assert any((run_dir / "ckpts").iterdir())
    metrics = [json.loads(ln) for ln in
               (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert any("total" in m and np.isfinite(m["total"]) for m in metrics)


def test_random_ref_views_excludes_target_and_is_reproducible(fake_facescape):
    """random_ref_views must never leak the target view into the sources
    (ref rows hold the top-4 cams per corner, which can include the target),
    and draws must be reproducible for a given seed regardless of the
    loader's thread scheduling (per-(seed, idx, visit) RandomState)."""
    root, meta_dir = fake_facescape

    def collect(seed):
        ds = FacescapeDataset(root, stage="val", meta_dir=meta_dir,
                              val_subjects=["001"], range_hor=45,
                              range_vert=30, slide_range=0,
                              random_ref_views=True, seed=seed)
        out = []
        for i in range(len(ds)):
            s = ds[i]
            assert s["target_view_id"] not in set(s["src_view_ids"].tolist())
            out.append(tuple(s["src_view_ids"].tolist()))
        return out

    a = collect(seed=0)
    b = collect(seed=0)
    assert a == b  # same seed -> same draws, fresh instance
    # different visits to the same idx redraw (augmentation still works)
    ds = FacescapeDataset(root, stage="val", meta_dir=meta_dir,
                          val_subjects=["001"], range_hor=45, range_vert=30,
                          slide_range=0, random_ref_views=True, seed=0)
    draws = {tuple(ds[0]["src_view_ids"].tolist()) for _ in range(8)}
    assert len(draws) >= 1  # and never the target in any of them


def test_meta_cache_name_tracks_generation_params(fake_facescape):
    """Changing slide_step / depth_fname / val_subjects must change the meta
    cache file, or stale metas are silently reused."""
    root, meta_dir = fake_facescape
    mk = lambda **kw: FacescapeDataset(root, stage="val", meta_dir=meta_dir,
                                       val_subjects=["001"], range_hor=45,
                                       range_vert=30, slide_range=0, **kw)
    base = mk()._meta_path()
    assert mk(slide_step=5.0)._meta_path() != base
    assert mk(depth_fname="depth_GT.png")._meta_path() != base
