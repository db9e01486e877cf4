"""MVS eval + fuse CLI: the test.py-equivalent pipeline on synthetic fixtures.

scan dir (images/cams/pair.txt) -> `mvs eval` (depth/conf/cam/image writing,
test.py:136-218 contract) -> `mvs fuse` normal/dynamic/consensus
(test.py:388-444, gipuma.py equivalents) -> a readable PLY.
"""

import numpy as np
import pytest
from pathlib import Path

from diner_tpu.data.codecs import read_pfm, write_pfm, write_mvsnet_cam, \
    read_mvsnet_cam
from diner_tpu.fusion.ply import read_ply

H, W, V = 32, 32, 4
DEPTH = 2.0


def _cams():
    exts = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    for v in range(V):
        exts[v, 0, 3] = 0.08 * (v - 1.5)  # small x-baselines
    K = np.zeros((V, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 40.0
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1.0
    return exts, K


@pytest.fixture()
def scan_dir(tmp_path):
    from PIL import Image

    scan = tmp_path / "data" / "scan9"
    (scan / "images").mkdir(parents=True)
    (scan / "cams").mkdir()
    rng = np.random.RandomState(0)
    exts, K = _cams()
    for v in range(V):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(scan / "images" / f"{v:08d}.png")
        write_mvsnet_cam(scan / "cams" / f"{v:08d}_cam.txt", exts[v], K[v],
                         1.0, 2.0 / 32)
    lines = [str(V)]
    for v in range(V):
        srcs = [s for s in range(V) if s != v]
        lines.append(str(v))
        lines.append(f"{len(srcs)} " + " ".join(f"{s} 100.0" for s in srcs))
    (scan / "pair.txt").write_text("\n".join(lines) + "\n")
    return tmp_path


def test_mvs_eval_writes_scene_depth(scan_dir):
    from diner_tpu.cli.mvs import main

    out = scan_dir / "out"
    main(["eval", "--datapath", str(scan_dir / "data"),
          "--testlist", "scan9", "--outdir", str(out),
          "--ndepths", "8,8,8", "--depth_inter_r", "4,2,1",
          "--numdepth", "32", "--num_view", "4",
          "--cr_base_chs", "4,4,4", "--base_channels", "4",
          "--img_ext", ".png"])

    for v in range(V):
        d, _ = read_pfm(out / "scan9" / "depth_est" / f"{v:08d}.pfm")
        c, _ = read_pfm(out / "scan9" / "confidence" / f"{v:08d}.pfm")
        assert d.shape == (H, W) and c.shape == (H, W)
        assert np.isfinite(d).all() and (c >= 0).all() and (c <= 1.001).all()
        ext, K, _ = read_mvsnet_cam(out / "scan9" / "cams" / f"{v:08d}_cam.txt")
        assert ext.shape == (4, 4) and K.shape == (3, 3)
        assert (out / "scan9" / "images" / f"{v:08d}.png").exists()


@pytest.fixture()
def fused_inputs(scan_dir):
    """Doctored eval outputs: exact plane depths + full confidence, so the
    fusion math (not the random-weight net) is what's under test."""
    from PIL import Image

    out = scan_dir / "out"
    exts, K = _cams()
    for v in range(V):
        sd = out / "scan9"
        for sub in ("depth_est", "confidence", "cams", "images"):
            (sd / sub).mkdir(parents=True, exist_ok=True)
        write_pfm(sd / "depth_est" / f"{v:08d}.pfm",
                  np.full((H, W), DEPTH, np.float32))
        write_pfm(sd / "confidence" / f"{v:08d}.pfm",
                  np.full((H, W), 0.9, np.float32))
        write_mvsnet_cam(sd / "cams" / f"{v:08d}_cam.txt", exts[v], K[v],
                         1.0, 2.0 / 32)
        img = np.full((H, W, 3), 100 + 10 * v, np.uint8)
        Image.fromarray(img).save(sd / "images" / f"{v:08d}.png")
    return scan_dir


@pytest.mark.parametrize("method", ["normal", "dynamic", "consensus"])
def test_mvs_fuse_plane_to_ply(fused_inputs, method):
    from diner_tpu.cli.mvs import main

    out = fused_inputs / "out"
    main(["fuse", "--datapath", str(fused_inputs / "data"),
          "--testlist", "scan9", "--outdir", str(out), "--method", method,
          "--conf", "0.5"])
    ply = out / "mvsnet009_l3.ply"
    assert ply.exists()
    out_ply = read_ply(ply)
    pts, cols = out_ply["points"], out_ply.get("colors")
    assert len(pts) > 100, f"{method}: too few fused points"
    # consistent plane at z=2: world points must sit on it
    assert np.abs(pts[:, 2] - DEPTH).max() < 1e-3
    assert cols is not None and len(cols) == len(pts)


def _bld_fixture(tmp_path, n_views=4, H=32, W=32, ndepths=16):
    """Synthetic bld_train layout: blended_images/cams(+pair)/rendered_depth_maps."""
    from PIL import Image
    from diner_tpu.data.codecs import write_pfm

    scan = tmp_path / "bld" / "sceneA"
    (scan / "blended_images").mkdir(parents=True)
    (scan / "cams").mkdir()
    (scan / "rendered_depth_maps").mkdir()
    rng = np.random.RandomState(1)
    exts, K = _cams()
    for v in range(n_views):
        Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(
            scan / "blended_images" / f"{v:08d}.jpg")
        # bld cam files carry FULL-res intrinsics and a depth_max in the
        # bounds row (bld_train.py:61-69)
        K_full = K[v].copy()
        K_full[:2] *= 4.0
        lines = ["extrinsic"]
        lines += [" ".join(f"{x:.6f}" for x in row) for row in exts[v]]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{x:.6f}" for x in row) for row in K_full]
        lines += ["", "1.0 0.1 16 3.0"]  # dmin interval ndepth dmax
        (scan / "cams" / f"{v:08d}_cam.txt").write_text("\n".join(lines) + "\n")
        write_pfm(scan / "rendered_depth_maps" / f"{v:08d}.pfm",
                  np.full((H, W), DEPTH, np.float32))
    pair = [str(n_views)]
    for v in range(n_views):
        srcs = [s for s in range(n_views) if s != v]
        pair += [str(v), f"{len(srcs)} " + " ".join(f"{s} 10.0" for s in srcs)]
    (scan / "cams" / "pair.txt").write_text("\n".join(pair) + "\n")
    listfile = tmp_path / "bld_list.txt"
    listfile.write_text("sceneA\n")
    return tmp_path / "bld", listfile


def test_blendedmvs_dataset_contract(tmp_path):
    from diner_tpu.mvs.datasets import BlendedMVSDataset

    root, listfile = _bld_fixture(tmp_path)
    ds = BlendedMVSDataset(root, listfile, ndepths=16)
    assert len(ds) == 4
    s = ds[0]
    assert s["imgs"].shape == (4, 32, 32, 3)
    # full-res K divided by 4 -> stage1
    np.testing.assert_allclose(s["proj_matrices"]["stage1"][0, 1, 0, 0], 40.0,
                               rtol=1e-5)
    np.testing.assert_allclose(s["proj_matrices"]["stage3"][0, 1, 0, 0], 160.0,
                               rtol=1e-5)
    # depth_interval from bounds: (3.0 - 1.0) / 16
    np.testing.assert_allclose(float(s["depth_interval"]), 0.125)
    assert s["depth_values"].shape == (16,)
    np.testing.assert_allclose(s["depth_values"][0], 1.0)
    # plane at z=2 inside [1.0, 1.0 + 0.125*15]: mask fully on
    assert s["mask"]["stage3"].mean() == 1.0
    assert s["depth"]["stage1"].shape == (8, 8)


def test_tnt_eval_dataset_contract(tmp_path):
    from PIL import Image
    from diner_tpu.mvs.datasets import TnTEvalDataset

    scan = tmp_path / "tnt" / "Family"
    (scan / "images").mkdir(parents=True)
    (scan / "cams_1").mkdir()
    rng = np.random.RandomState(2)
    exts, K = _cams()
    H2, W2 = 64, 96  # already multiples of 32
    for v in range(3):
        Image.fromarray((rng.rand(H2, W2, 3) * 255).astype(np.uint8)).save(
            scan / "images" / f"{v:08d}.jpg")
        lines = ["extrinsic"]
        lines += [" ".join(f"{x:.6f}" for x in row) for row in exts[v]]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{x:.6f}" for x in row) for row in K[v]]
        lines += ["", "1.0 0.01 192 2.5"]
        (scan / "cams_1" / f"{v:08d}_cam.txt").write_text("\n".join(lines) + "\n")
    pair = ["3"]
    for v in range(3):
        srcs = [s for s in range(3) if s != v]
        pair += [str(v), f"{len(srcs)} " + " ".join(f"{s} 10.0" for s in srcs)]
    (scan / "pair.txt").write_text("\n".join(pair) + "\n")

    ds = TnTEvalDataset(tmp_path / "tnt", ["Family"], nviews=3, ndepths=8,
                        image_sizes={"Family": (W2, H2)})
    assert len(ds) == 3
    s = ds[0]
    assert s["imgs"].shape == (3, H2, W2, 3)
    np.testing.assert_allclose(s["depth_values"][-1],
                               1.0 + (2.5 - 1.0) / 8 * 7, rtol=1e-6)
    k3 = s["proj_matrices"]["stage3"][0, 1]
    k1 = s["proj_matrices"]["stage1"][0, 1]
    for r, c in ((0, 0), (1, 1), (0, 2), (1, 2)):
        np.testing.assert_allclose(k3[r, c] / k1[r, c], 4.0, rtol=1e-6)


def test_mvs_finetune_cli_runs(tmp_path):
    from diner_tpu.cli.mvs import main

    root, listfile = _bld_fixture(tmp_path)
    logdir = tmp_path / "ft"
    main(["finetune", "--datapath", str(root), "--listfile", str(listfile),
          "--logdir", str(logdir), "--ndepths", "8,8,8",
          "--depth_inter_r", "4,2,1", "--numdepth", "16",
          "--cr_base_chs", "4,4,4", "--base_channels", "4",
          "--max-steps", "2", "--batch-size", "1", "--log-every", "1"])
    assert any((logdir / "ckpts").iterdir())


def test_mvs_train_save_every_and_resume(tmp_path):
    """--save-every checkpoints mid-run; --resume restarts from the latest
    step (including optimizer state) instead of step 0."""
    from diner_tpu.cli.mvs import main

    root, listfile = _bld_fixture(tmp_path)
    logdir = tmp_path / "tr"
    common = ["finetune", "--datapath", str(root), "--listfile", str(listfile),
              "--logdir", str(logdir), "--ndepths", "8,8,8",
              "--depth_inter_r", "4,2,1", "--numdepth", "16",
              "--cr_base_chs", "4,4,4", "--base_channels", "4",
              "--batch-size", "1", "--log-every", "1"]
    main(common + ["--max-steps", "2", "--save-every", "1"])
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(str((logdir / "ckpts").resolve())) as mgr:
        steps = set(mgr.all_steps())
    assert 1 in steps and 2 in steps

    # resume: runs only steps 2..3 and writes the step-3 checkpoint
    main(common + ["--max-steps", "3", "--resume"])
    with ocp.CheckpointManager(str((logdir / "ckpts").resolve())) as mgr:
        assert mgr.latest_step() == 3

    # write/eval-style restore must tolerate the opt_state-bearing layout
    from diner_tpu.cli.mvs import _restore_params_stats

    restored = _restore_params_stats(logdir / "ckpts", None)
    assert set(restored) == {"params", "batch_stats"}


def test_export_torch_cli_mvs(tmp_path):
    """orbax MVS ckpt -> `export_torch mvs` -> reference-layout torch .ckpt
    that port_transmvsnet loads back to the identical tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from diner_tpu.cli.export_torch import main as export_main
    from diner_tpu.mvs.net import TransMVSNet
    from diner_tpu.mvs.torch_port import port_transmvsnet
    from diner_tpu.train.ckpt_io import orbax_save

    rng = np.random.RandomState(0)
    net = TransMVSNet(ndepths=(8, 8, 8), depth_intervals_ratio=(4, 2, 1),
                      cr_base_chs=(4, 4, 4), base_channels=4)
    B, V, H, W = 1, 3, 32, 32
    imgs = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    projs = {}
    for si, scale in enumerate((4, 2, 1)):
        K4 = np.eye(4, dtype=np.float32)
        K4[0, 0] = K4[1, 1] = 50.0 / scale
        K4[0, 2], K4[1, 2] = W / (2 * scale), H / (2 * scale)
        projs[f"stage{si + 1}"] = jnp.asarray(
            np.stack([np.stack([np.eye(4, dtype=np.float32), K4])] * V)[None])
    dvals = jnp.asarray(np.linspace(1.0, 2.0, 32, dtype=np.float32)[None])
    variables = net.init(jax.random.PRNGKey(0), imgs, projs, dvals)

    ckpt_dir = tmp_path / "ckpts"
    orbax_save(ckpt_dir, 12, {"params": variables["params"],
                              "batch_stats": variables["batch_stats"],
                              "step": np.asarray(12)})
    out = tmp_path / "transmvsnet.ckpt"
    export_main(["mvs", "--ckpt", str(ckpt_dir), "--out", str(out)])

    raw = torch.load(out, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 12
    back = port_transmvsnet({k: v.numpy() for k, v in raw["model"].items()})
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


def test_torch_ckpt_flag_ports_reference_checkpoint(tmp_path):
    """--torch-ckpt must load a reference-layout {'epoch', 'model', ...}
    torch checkpoint, port it, and pass the structural gate."""
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from diner_tpu.cli.mvs import _maybe_port_torch_ckpt
    from diner_tpu.mvs.net import TransMVSNet
    from diner_tpu.mvs.torch_port import export_transmvsnet

    rng = np.random.RandomState(0)
    net = TransMVSNet(ndepths=(8, 8, 8), depth_intervals_ratio=(4, 2, 1),
                      cr_base_chs=(4, 4, 4), base_channels=4)
    B, V, H, W = 1, 3, 32, 32
    imgs = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    projs = {}
    for si, scale in enumerate((4, 2, 1)):
        K4 = np.eye(4, dtype=np.float32)
        K4[0, 0] = K4[1, 1] = 50.0 / scale
        K4[0, 2], K4[1, 2] = W / (2 * scale), H / (2 * scale)
        projs[f"stage{si + 1}"] = jnp.asarray(
            np.stack([np.stack([np.eye(4, dtype=np.float32), K4])] * V)[None])
    dvals = jnp.asarray(np.linspace(1.0, 2.0, 32, dtype=np.float32)[None])
    variables = net.init(jax.random.PRNGKey(0), imgs, projs, dvals)

    sd = {("module." + k if i % 2 else k): torch.from_numpy(np.asarray(v))
          for i, (k, v) in enumerate(export_transmvsnet(variables).items())}
    ckpt = tmp_path / "model_000015.ckpt"
    torch.save({"epoch": 15, "model": sd}, ckpt)

    args = argparse.Namespace(torch_ckpt=str(ckpt))
    fresh = net.init(jax.random.PRNGKey(1), imgs, projs, dvals)
    ported = _maybe_port_torch_ckpt(
        {"params": fresh["params"], "batch_stats": fresh["batch_stats"]},
        args)
    leaf0 = jax.tree_util.tree_leaves(ported["params"])[0]
    ref0 = jax.tree_util.tree_leaves(variables["params"])[0]
    np.testing.assert_array_equal(np.asarray(leaf0), np.asarray(ref0))
    out = net.apply(ported, imgs, projs, dvals)
    assert np.isfinite(np.asarray(out["depth"])).all()
