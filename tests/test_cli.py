"""End-to-end CLI tests: train -> checkpoint -> render_eval restore -> scores."""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_run(tmp_path_factory):
    """Train the tiny synthetic config for a few steps; returns the run dir."""
    logdir = tmp_path_factory.mktemp("run")
    from diner_tpu.cli.train import main

    main(["configs/train_synthetic.yaml", "--logdir", str(logdir),
          "--max-steps", "6"])
    runs = sorted(logdir.iterdir())
    assert runs, "no run dir created"
    return runs[-1]


def test_train_cli_artifacts(synth_run):
    assert (synth_run / "config.yaml").exists()
    metrics = [json.loads(ln) for ln in
               (synth_run / "metrics.jsonl").read_text().splitlines()]
    assert any("total" in m for m in metrics)
    assert np.isfinite([m["total"] for m in metrics if "total" in m]).all()
    ckpts = synth_run / "ckpts"
    assert any(ckpts.iterdir())


def test_render_eval_cli_restores_and_scores(synth_run, tmp_path, capsys):
    from diner_tpu.cli.render_eval import main

    out = tmp_path / "eval"
    main(["--config", "configs/train_synthetic.yaml",
          "--ckpt", str(synth_run / "ckpts"),
          "--out", str(out), "--n", "1"])
    assert (out / "average_scores.json").exists()
    scores = json.loads((out / "average_scores.json").read_text())
    assert {"psnr", "ssim", "l1", "l2"} <= set(scores)
    assert np.isfinite(list(scores.values())).all()
    vis = list((out / "visualizations").iterdir())
    assert len(vis) == 4  # 1 sample x 4 files


def test_cam_sweep_on_synthetic(tmp_path):
    """Sweep rendering through the synthetic dataset's sweep extrinsics."""
    from diner_tpu.data import SyntheticSphereDataset
    from diner_tpu.eval.sweep import create_cam_sweep

    class SweepDS(SyntheticSphereDataset):
        def get_cam_sweep_extrinsics(self, nframes, scan_idx):
            K, exts = self._cameras(scan_idx)
            return np.stack([exts[0]] * nframes)

    ds = SweepDS(n_scenes=1, n_views=2, H=16, W=16)

    def render_fn(batch, target_ext, seed):
        H, W = batch["target_rgb"].shape[1:3]
        rng = np.random.RandomState(seed)
        return (rng.rand(1, H, W, 3).astype(np.float32),
                np.full((1, H, W), 2.0, np.float32))

    out = create_cam_sweep(render_fn, ds, tmp_path, nframes=3, n_cam_sweeps=1)
    files = sorted(p.name for p in out.iterdir())
    assert any(f.endswith(".mp4") for f in files)
    assert any(f.endswith("-ref_imgs.jpg") for f in files)


def test_compare_evaluations(tmp_path):
    from PIL import Image
    from diner_tpu.eval.compare import compare_evaluations
    from diner_tpu.eval.suite import (REPORT_DETAIL_FILENAME,
                                      EXAMPLE_PLOT_FILENAME, N_EXAMPLE_PLOTS)

    rng = np.random.RandomState(0)
    dirs = []
    for m in range(2):
        d = tmp_path / f"model{m}"
        (d / "vis").mkdir(parents=True)
        rows = []
        for i in range(6):
            pred = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            gt = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            Image.fromarray(pred).save(d / "vis" / f"s{i}-pred.png")
            Image.fromarray(gt).save(d / "vis" / f"s{i}-gt.png")
            rows.append({"path": str(d / "vis" / f"s{i}-pred.png"),
                         "psnr": 20 + m + rng.rand(), "ssim": 0.8,
                         "l1": 0.05 - 0.01 * m + 0.001 * i, "l2": 0.01})
        (d / REPORT_DETAIL_FILENAME).write_text(json.dumps(rows))
        strip = (rng.rand(N_EXAMPLE_PLOTS * 20, 60, 3) * 255).astype(np.uint8)
        Image.fromarray(strip).save(d / EXAMPLE_PLOT_FILENAME)
        dirs.append(d)
    out = compare_evaluations(dirs, ["a", "b"], tmp_path / "cmp")
    assert (out / "metric_violins.png").exists()
    for i in range(N_EXAMPLE_PLOTS):
        assert (out / f"examples_{i}.png").exists()
    assert (out / "diff_psnr_0.png").exists()
    assert (out / "diff_l1_0.png").exists()


def test_train_resume(tmp_path):
    """Checkpoint resume: a second run continues from the saved step."""
    import json
    from diner_tpu.cli.train import main

    logdir = tmp_path / "r"
    main(["configs/train_synthetic.yaml", "--logdir", str(logdir),
          "--max-steps", "4"])
    run = sorted(logdir.iterdir())[-1]
    # second invocation resumes in the same run dir
    from diner_tpu.cli.build import build_dataset, build_loader, build_diner
    from diner_tpu.core.config import load_config
    from diner_tpu.train.loop import train as train_loop

    conf = load_config("configs/train_synthetic.yaml")
    train_set = build_dataset(conf["data"]["train"], stage="train")
    loader = build_loader(conf["data"]["train"], train_set, True)
    model = build_diner(conf, znear=train_set.znear, zfar=train_set.zfar)
    state = train_loop(model, loader, run, max_steps=6, ckpt_every=0,
                       log_every=1, resume=True)
    metrics = [json.loads(l) for l in (run / "metrics.jsonl").read_text().splitlines()]
    steps = [m["step"] for m in metrics if "total" in m]
    assert 4 in steps and 5 in steps  # resumed past the first run's 0..3
    assert int(state.step) >= 2  # optimizer stepped in the resumed run

    # CLI-level resume: --run-dir reuses the exact dir so --resume finds ckpts
    main(["configs/train_synthetic.yaml", "--run-dir", str(run),
          "--max-steps", "8", "--resume"])
    metrics = [json.loads(l) for l in (run / "metrics.jsonl").read_text().splitlines()]
    steps = [m["step"] for m in metrics if "total" in m]
    assert 7 in steps  # CLI resume continued to the new max step
    assert steps.count(0) == 1  # and did NOT restart from step 0


def test_fast_preset_config_builds_certified_path():
    """The shipped certified-fast preset (configs/evaluate_diner_on_dtu_fast
    .yaml) must wire every certified knob through cli.build — the config IS
    the deliverable of the certification (scripts/certify_fast_path.py)."""
    from diner_tpu.cli.build import build_nerf, build_render_cfg
    from diner_tpu.core.config import load_config

    conf = load_config("configs/evaluate_diner_on_dtu_fast.yaml")
    nerf = build_nerf(conf["nerf"])
    assert nerf.compute_dtype == "bfloat16"
    assert nerf.quad_latent is True
    assert nerf.latent_quant == "int8"
    assert nerf.latent_anchors == 0  # NOT certified; must stay off
    assert nerf.image_padding == 64  # the flagship architecture
    cfg = build_render_cfg(conf["renderer"])
    # r5 certified preset (results/certify_pairedbf16_seed{777,1313}_r5
    # .json): A=256 paired-fetched anchors, 32 samples from the
    # reference's 1000 candidates
    assert cfg.n_prior_anchors == 256
    assert cfg.paired_prior_gather is True
    assert cfg.n_samples == 32 and cfg.n_depth_candidates == 1000


def test_render_eval_fast_preset_from_config(synth_run, tmp_path):
    """A config carrying the certified fast-render knobs (n_prior_anchors +
    quad_latent + bf16) drives render_eval end to end: VERDICT r3 missing #2
    (the fast path used to be reachable only from bench code)."""
    import yaml

    from diner_tpu.cli.render_eval import main

    conf = yaml.safe_load(Path("configs/train_synthetic.yaml").read_text())
    conf["nerf"]["kwargs"]["compute_dtype"] = "bfloat16"
    conf["nerf"]["kwargs"]["quad_latent"] = True
    conf["renderer"]["kwargs"]["n_prior_anchors"] = 16
    cfg_path = tmp_path / "fast.yaml"
    cfg_path.write_text(yaml.safe_dump(conf))

    out = tmp_path / "eval_fast"
    main(["--config", str(cfg_path), "--ckpt", str(synth_run / "ckpts"),
          "--out", str(out), "--n", "1"])
    scores = json.loads((out / "average_scores.json").read_text())
    assert np.isfinite(list(scores.values())).all()


def test_render_eval_nsamples_override(synth_run, tmp_path):
    """--nsamples scales n_samples and n_gaussian (create_prediction_folder.py:44-47)."""
    from diner_tpu.cli.render_eval import main

    out = tmp_path / "eval16"
    main(["--config", "configs/train_synthetic.yaml",
          "--ckpt", str(synth_run / "ckpts"),
          "--out", str(out), "--n", "1", "--nsamples", "16"])
    assert (out / "average_scores.json").exists()


def test_render_eval_shard_rays(synth_run, tmp_path):
    """--shard-rays renders over the virtual 8-device mesh."""
    from diner_tpu.cli.render_eval import main

    out = tmp_path / "eval_sharded"
    main(["--config", "configs/train_synthetic.yaml",
          "--ckpt", str(synth_run / "ckpts"),
          "--out", str(out), "--n", "1", "--shard-rays"])
    scores = (out / "average_scores.json")
    assert scores.exists()


def test_render_eval_torch_ckpt_forces_reference_arch(tmp_path):
    """--torch-ckpt on a group-norm/softplus YAML must still evaluate: the CLI
    forces encoder_norm=batch + sigma_activation=relu to match the ported tree
    (VERDICT r1: previously produced a structure mismatch)."""
    import torch
    import yaml

    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    from test_model_port import _fake_lightning_sd

    sd = {k: torch.as_tensor(np.asarray(v))
          for k, v in _fake_lightning_sd().items()}
    ckpt = tmp_path / "fake_lightning.ckpt"
    torch.save({"state_dict": sd}, ckpt)

    conf = {
        "data": {"val": {"dataset": {
            "module": "SyntheticSphereDataset",
            "kwargs": {"n_scenes": 1, "n_views": 2, "H": 32, "W": 32,
                       "seed": 7}}}},
        # deliberately the WRONG norm/activation: the CLI must force them
        "nerf": {"kwargs": {
            "sigma_activation": "softplus",
            "encoder_conf": {"kwargs": {"num_layers": 4, "norm": "group",
                                        "image_padding": 64, "padding_pe": 4}},
            "poscode_conf": {"kwargs": {"num_freqs": 6, "freq_factor": 6.28}},
            "mlp_fine_conf": {"kwargs": {"n_blocks": 5, "d_hidden": 512,
                                         "combine_layer": 3}}}},
        "renderer": {"kwargs": {"n_samples": 6, "n_depth_candidates": 32,
                                "n_gaussian": 2}},
    }
    cfg_path = tmp_path / "eval_ported.yaml"
    cfg_path.write_text(yaml.safe_dump(conf))

    from diner_tpu.cli.render_eval import main

    out = tmp_path / "eval_out"
    main(["--config", str(cfg_path), "--torch-ckpt", str(ckpt),
          "--out", str(out), "--n", "1"])
    scores = json.loads((out / "average_scores.json").read_text())
    assert np.isfinite(list(scores.values())).all()


def test_final_checkpoint_saved_before_final_val(tmp_path):
    """The finished model's checkpoint must survive a crash in the final
    validation (val_fn renders full images — a realistic OOM site)."""
    import pytest

    from diner_tpu.cli.build import build_dataset, build_loader, build_diner
    from diner_tpu.core.config import load_config
    from diner_tpu.train.loop import restore_checkpoint, train as train_loop
    from diner_tpu.train.state import create_train_state

    conf = load_config("configs/train_synthetic.yaml")
    train_set = build_dataset(conf["data"]["train"], stage="train")
    loader = build_loader(conf["data"]["train"], train_set, True)
    model = build_diner(conf, znear=train_set.znear, zfar=train_set.zfar)

    import jax

    def boom(state, step):
        raise RuntimeError("val crashed")

    logdir = tmp_path / "run"
    # val_every > max_steps: only the final-validation call fires, and it
    # crashes — the final checkpoint must already be on disk
    with pytest.raises(RuntimeError, match="val crashed"):
        train_loop(model, loader, logdir, max_steps=2, ckpt_every=0,
                   log_every=1, val_every=5, val_fn=boom)
    it = iter(loader)
    example = next(it)
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    _, step = restore_checkpoint(logdir / "ckpts", state)
    assert step == 2  # the finished model was saved before val_fn ran


def test_resolve_val_every_lightning_semantics():
    """Fractional val_check_interval is a fraction of an epoch (Lightning);
    int() truncation used to silently disable validation for 0.25."""
    from diner_tpu.cli.train import _resolve_val_every

    class L:
        def __len__(self):
            return 40

    assert _resolve_val_every(0.25, L()) == 10
    assert _resolve_val_every(1.0, L()) == 40   # once per epoch
    assert _resolve_val_every(1, L()) == 1      # int = every N steps
    assert _resolve_val_every(500, L()) == 500
    assert _resolve_val_every(None, L()) is None
    assert _resolve_val_every(0, L()) is None
