"""Eval suite: SSIM vs naive windowed reference, folder evaluation round-trip."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from diner_tpu.eval import psnr, ssim, mse, l1, evaluate_folder
from diner_tpu.eval.predict import create_prediction_folder, deterministic_subset
from diner_tpu.data import SyntheticSphereDataset


def _naive_ssim_2d(a, b, win=7, dr=1.0, K1=0.01, K2=0.03):
    """Direct sliding-window SSIM (valid region only), independent impl."""
    H, W = a.shape
    pad = (win - 1) // 2
    NP = win * win
    vals = []
    for i in range(pad, H - pad):
        for j in range(pad, W - pad):
            wa = a[i - pad:i + pad + 1, j - pad:j + pad + 1].astype(np.float64)
            wb = b[i - pad:i + pad + 1, j - pad:j + pad + 1].astype(np.float64)
            ux, uy = wa.mean(), wb.mean()
            vx = ((wa - ux) ** 2).sum() / (NP - 1)
            vy = ((wb - uy) ** 2).sum() / (NP - 1)
            vxy = ((wa - ux) * (wb - uy)).sum() / (NP - 1)
            C1, C2 = (K1 * dr) ** 2, (K2 * dr) ** 2
            vals.append(((2 * ux * uy + C1) * (2 * vxy + C2)) /
                        ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)))
    return np.mean(vals)


def test_ssim_matches_naive_window():
    rng = np.random.RandomState(0)
    a = rng.rand(16, 18).astype(np.float32)
    b = np.clip(a + rng.randn(16, 18) * 0.1, 0, 1).astype(np.float32)
    np.testing.assert_allclose(ssim(a, b), _naive_ssim_2d(a, b), rtol=1e-6)


def test_metric_basics():
    a = np.random.RandomState(1).rand(12, 12, 3).astype(np.float32)
    assert ssim(a, a) == 1.0
    assert mse(a, a) == 0.0 and l1(a, a) == 0.0
    b = np.clip(a + 0.1, 0, 1)
    assert 0 < ssim(a, b) < 1
    # psnr golden: uniform error e -> 10*log10(1/e^2)
    c = np.clip(a - 0.05, None, 1.0)
    err = mse(a, c)
    np.testing.assert_allclose(psnr(a, c), 10 * np.log10(1 / err), rtol=1e-9)


def test_deterministic_subset_stable():
    assert deterministic_subset(100, 10) == deterministic_subset(100, 10)
    assert deterministic_subset(5, None) == [0, 1, 2, 3, 4]
    assert deterministic_subset(5, 10) == [0, 1, 2, 3, 4]


def test_prediction_folder_and_evaluate(tmp_path):
    ds = SyntheticSphereDataset(n_scenes=3, n_views=2, H=24, W=24)

    def render_fn(batch, seed):
        # "perfect" renderer: return GT + tiny noise, constant depth
        rng = np.random.RandomState(seed)
        rgb = np.clip(batch["target_rgb"] + rng.randn(*batch["target_rgb"].shape
                                                      ) * 0.01, 0, 1)
        depth = np.full(batch["target_rgb"].shape[:3], 2.0, np.float32)
        return rgb, depth

    visdir = create_prediction_folder(render_fn, ds, tmp_path / "vis",
                                      n_samples=2, batch_size=2)
    files = sorted(p.name for p in visdir.iterdir())
    assert len(files) == 8  # 2 samples x 4 files
    assert any(f.endswith("-pred.png") for f in files)

    avg = evaluate_folder(visdir, tmp_path / "report")
    assert set(avg) == {"ssim", "psnr", "l2", "l1"}
    assert avg["psnr"] > 30  # near-perfect prediction
    assert avg["ssim"] > 0.9
    assert (tmp_path / "report" / "average_scores.json").exists()
    detailed = json.loads((tmp_path / "report" / "detailed_report.json").read_text())
    assert len(detailed) == 2
    assert (tmp_path / "report" / "examples.png").exists()


def test_lpips_tower_runs_random_weights():
    from diner_tpu.nn.lpips import LpipsVgg
    m = LpipsVgg()
    x = jnp.zeros((1, 32, 32, 3))
    y = jnp.ones((1, 32, 32, 3)) * 0.5
    variables = m.init(jax.random.PRNGKey(0), x, y)
    d_same = m.apply(variables, x, x)
    d_diff = m.apply(variables, x, y)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    assert float(d_diff[0]) > 0


def test_lpips_port_script_and_cli_flow(tmp_path):
    """Fake (random) lpips + vgg16 checkpoints -> port script -> .npz ->
    evaluate_folder reports an lpips score. The moment real weights exist the
    same path produces the reference metric."""
    import torch

    from scripts.port_lpips import main as port_main, _VGG16_CONV_SHAPES, _LIN_CH
    from diner_tpu.nn.lpips import load_lpips_npz, make_lpips_fn
    from diner_tpu.eval.suite import evaluate_folder
    from PIL import Image

    rng = np.random.RandomState(0)
    vgg_sd = {}
    for idx, (o, i) in _VGG16_CONV_SHAPES.items():
        vgg_sd[f"features.{idx}.weight"] = torch.as_tensor(
            rng.randn(o, i, 3, 3).astype(np.float32) * 0.05)
        vgg_sd[f"features.{idx}.bias"] = torch.zeros(o)
    lpips_sd = {f"lin{li}.model.1.weight": torch.as_tensor(
        np.abs(rng.randn(1, ch, 1, 1).astype(np.float32)))
        for li, ch in enumerate(_LIN_CH)}
    lp, vp = tmp_path / "vgg.pth", tmp_path / "vgg16.pth"
    torch.save(lpips_sd, lp)
    torch.save(vgg_sd, vp)

    out_npz = tmp_path / "lpips_vgg.npz"
    port_main(["--lpips-ckpt", str(lp), "--vgg16", str(vp),
               "--out", str(out_npz)])
    assert out_npz.exists()

    lpips_fn = make_lpips_fn(load_lpips_npz(out_npz))
    # folder with one pred/gt pair
    vis = tmp_path / "vis"
    vis.mkdir()
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    img2 = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255).astype(np.uint8)
    Image.fromarray(img2).save(vis / "000000-pred.png")
    Image.fromarray(img).save(vis / "000000-gt.png")
    scores = evaluate_folder(vis, tmp_path / "scored", lpips_fn=lpips_fn)
    assert "lpips" in scores and np.isfinite(scores["lpips"])
    assert scores["lpips"] > 0


def test_eval_folder_cli(tmp_path):
    """score + compare subcommands on a synthetic prediction folder
    (evaluate_prediction_folder.py contract)."""
    import imageio.v2 as imageio

    from diner_tpu.cli.eval_folder import main

    rng = np.random.RandomState(0)
    for run in ("runA", "runB"):
        vis = tmp_path / run / "visualizations"
        vis.mkdir(parents=True)
        for i in range(3):
            gt = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
            noise = rng.randint(-12, 12, gt.shape)
            pred = np.clip(gt.astype(int) + noise, 0, 255).astype(np.uint8)
            imageio.imwrite(vis / f"{i:04d}-gt.png", gt)
            imageio.imwrite(vis / f"{i:04d}-pred.png", pred)
        rc = main(["score", str(tmp_path / run)])
        assert rc == 0
        assert (tmp_path / run / "detailed_report.json").exists()

    rc = main(["compare", str(tmp_path / "cmp"),
               f"A={tmp_path/'runA'}", f"B={tmp_path/'runB'}",
               "--n-examples", "1"])
    assert rc == 0
    assert any((tmp_path / "cmp").iterdir())
