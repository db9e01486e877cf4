"""Eval entry point: render a prediction folder from a checkpoint and score it.

Behavioral reference: python_scripts/create_prediction_folder.py +
evaluate_prediction_folder.py in malteprinzler/diner: deterministic
Random(0) subsets, optional --nsamples override scaling n_samples and
n_gaussian, znear/zfar overridden from the eval dataset, folder scoring.
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

import jax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    ap.add_argument("--torch-ckpt", default=None,
                    help="reference Lightning .ckpt to port on the fly")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=None, help="eval subset size")
    ap.add_argument("--nsamples", type=int, default=None,
                    help="override renderer n_samples (scales n_gaussian)")
    ap.add_argument("--shard-rays", action="store_true",
                    help="shard the ray axis over all devices (multi-chip)")
    ap.add_argument("--lpips", default=None,
                    help=".npz from scripts/port_lpips.py; adds the lpips "
                         "metric to the score report")
    args = ap.parse_args(argv)

    from diner_tpu.cli.build import build_dataset, build_diner
    from diner_tpu.core.config import load_config
    from diner_tpu.eval.predict import create_prediction_folder
    from diner_tpu.eval.suite import evaluate_folder
    from diner_tpu.train.loop import restore_checkpoint
    from diner_tpu.train.state import create_train_state
    from diner_tpu.data.contract import collate, to_device_batch

    conf = load_config(args.config)
    val_set = build_dataset(conf["data"]["val"], stage="val")
    model = build_diner(conf, znear=val_set.znear, zfar=val_set.zfar)
    if args.nsamples:
        cfg = model.render_cfg
        scale = args.nsamples / cfg.n_samples
        model = dataclasses.replace(
            model, render_cfg=dataclasses.replace(
                cfg, n_samples=args.nsamples,
                n_gaussian=int(cfg.n_gaussian * scale)))

    if args.torch_ckpt:
        # minimum-slice path (SURVEY.md §7.4): eval a ported reference ckpt.
        # The reference stack is BatchNorm + relu-sigma
        # (image_encoder.py:58, nerf_renderer.py:311); force those regardless
        # of what the YAML says, so a ported tree always matches the model.
        from diner_tpu.models.torch_port import port_diner_checkpoint
        from diner_tpu.nn.torch_port import load_torch_state_dict
        from diner_tpu.nn import posenc_dim

        ported, extras = port_diner_checkpoint(load_torch_state_dict(args.torch_ckpt))
        nerf = model.nerf
        forced = {}
        if nerf.encoder_norm != "batch":
            forced["encoder_norm"] = "batch"
        if nerf.sigma_activation != "relu":
            forced["sigma_activation"] = "relu"
        expect_in = 3
        if nerf.image_padding > 0 and nerf.padding_pe >= 0:
            expect_in += posenc_dim(2, nerf.padding_pe, include_input=True)
        got_in = extras["conv1_in_channels"]
        if got_in != expect_in:
            raise SystemExit(
                f"checkpoint conv1 has {got_in} input channels but the config "
                f"implies {expect_in} (3 + border-PE); set padding_pe/"
                f"image_padding to match the training run")
        if forced:
            print(f"--torch-ckpt forces {forced}")
            model = model.clone(nerf=nerf.clone(**forced))

    example = to_device_batch(collate([val_set[0]]))
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    if args.torch_ckpt:
        params = dict(state.params)
        params["nerf"] = ported["params"]
        bs = {"nerf": ported["batch_stats"]}
        state = state.replace(params=params, batch_stats=bs)
        print(f"ported torch checkpoint {args.torch_ckpt} "
              f"(znear={extras['znear']}, zfar={extras['zfar']})")
    elif args.ckpt:
        state, step = restore_checkpoint(args.ckpt, state)
        print(f"restored step {step} from {args.ckpt}")
    else:
        raise SystemExit("need --ckpt or --torch-ckpt")

    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats

    if args.shard_rays and len(jax.devices()) > 1:
        from diner_tpu.geometry import gen_rays
        from diner_tpu.parallel import make_mesh, replicate
        from diner_tpu.renderer.sharded import render_image_sharded
        import jax.numpy as jnp

        mesh = make_mesh(axis_names=("data",))
        variables = replicate(variables, mesh)

        _encode = jax.jit(lambda v, a: model.apply(v, a,
                                                   method="encode_batch"))

        # built ONCE: the sharded program caches per field_fn, so the whole
        # eval loop compiles a single render program (enc/rays are traced)
        def _field(enc, p, d, epi_aux=None):
            return model.apply(variables, enc, p, d, epi_aux, method="field")

        def render_fn(batch, seed):
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if not isinstance(v, list)}
            enc = replicate(_encode(variables, arrays), mesh)
            SB, H, W, _ = arrays["target_rgb"].shape
            rays = gen_rays(arrays["target_extrinsics"],
                            arrays["target_intrinsics"], W, H,
                            jnp.full((SB,), model.znear),
                            jnp.full((SB,), model.zfar))
            return render_image_sharded(
                _field, jax.random.PRNGKey(seed), rays, enc,
                model.render_cfg, mesh)
    else:
        import jax.numpy as jnp

        # one compiled render program — eager model.apply dispatches the
        # whole render op-by-op (minutes per image over a remote-TPU tunnel)
        _render = jax.jit(lambda v, a, r: model.apply(v, a, r,
                                                      method="render_batch"))

        def render_fn(batch, seed):
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if not isinstance(v, list)}
            return _render(variables, arrays, jax.random.PRNGKey(seed))

    out = Path(args.out)
    lpips_fn = None
    if args.lpips:
        from diner_tpu.nn.lpips import load_lpips_npz, make_lpips_fn

        lpips_fn = make_lpips_fn(load_lpips_npz(args.lpips))

    visdir = create_prediction_folder(render_fn, val_set, out / "visualizations",
                                      n_samples=args.n)
    scores = evaluate_folder(visdir, out, lpips_fn=lpips_fn)
    print({k: round(v, 4) for k, v in scores.items()})


if __name__ == "__main__":
    main()
