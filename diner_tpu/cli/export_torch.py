"""Export TPU-trained checkpoints to reference-keyed torch files.

The inverse of the `--torch-ckpt` import paths: a model trained with this
framework can be handed back to the reference's own tooling —
  diner: a Lightning-layout .ckpt whose state_dict DINER.load_from_checkpoint
         consumes (python_scripts/create_prediction_folder.py:41 in
         malteprinzler/diner; requires the config's hparams on the torch
         side — pass --hparams to embed a hyper_parameters dict),
  mvs:   the TransMVSNet {epoch, model} layout train.py:100-104 loads via
         --loadckpt / --resume.

Usage:
  python -m diner_tpu.cli.export_torch diner --ckpt runs/dtu/ckpts \
      --config configs/train_dtu.yaml --znear 0.321 --zfar 1.204 \
      --out diner_dtu.ckpt
  python -m diner_tpu.cli.export_torch mvs --ckpt runs/mvs/ckpts \
      --out transmvsnet.ckpt
"""

from __future__ import annotations

import argparse
import json


def _restore(ckpt_dir):
    from diner_tpu.train.ckpt_io import orbax_restore_latest

    payload, step = orbax_restore_latest(ckpt_dir)
    if payload is None:
        raise SystemExit(f"no checkpoint found under {ckpt_dir}")
    return payload, step


def _save_torch(path, payload):
    import numpy as np
    import torch

    def conv(v):
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, (int, float, str)) or v is None:
            return v  # scalar metadata (epoch/global_step/hparams) stays plain
        return torch.from_numpy(np.ascontiguousarray(np.asarray(v)))

    torch.save(conv(payload), path)


def cmd_diner(args):
    from diner_tpu.models.torch_port import export_diner

    payload, step = _restore(args.ckpt)
    params, stats = payload["params"], payload.get("batch_stats") or {}
    if "nerf" not in params:
        raise SystemExit("checkpoint params have no 'nerf' subtree — is this "
                         "a DINER training checkpoint? (mvs checkpoints "
                         "export via the `mvs` subcommand)")

    num_freqs, freq_factor = 6, 6.28
    if args.config:
        from diner_tpu.core.config import load_config

        conf = load_config(args.config)
        pos_kw = dict(conf.get("nerf", {}).get("kwargs", {})
                      .get("poscode_conf", {}).get("kwargs", {}))
        num_freqs = int(pos_kw.get("num_freqs", num_freqs))
        freq_factor = float(pos_kw.get("freq_factor", freq_factor))

    sd = export_diner(
        {"params": params["nerf"], "batch_stats": stats.get("nerf", {})},
        znear=args.znear, zfar=args.zfar,
        num_freqs=num_freqs, freq_factor=freq_factor,
        vgg_params=params.get("vgg"))
    ckpt = {"state_dict": sd, "global_step": int(step), "epoch": 0}
    if args.hparams:
        ckpt["hyper_parameters"] = json.loads(args.hparams)
    _save_torch(args.out, ckpt)
    print(f"wrote {args.out}: {len(sd)} tensors from step {step}")


def cmd_mvs(args):
    from diner_tpu.mvs.torch_port import export_transmvsnet

    payload, step = _restore(args.ckpt)
    params, stats = payload["params"], payload.get("batch_stats") or {}
    if "feature" not in params:
        raise SystemExit("checkpoint params have no 'feature' subtree — is "
                         "this an MVS training checkpoint?")
    sd = export_transmvsnet({"params": params, "batch_stats": stats})
    # reference checkpoint layout: {"epoch": int, "model": state_dict}
    # (deps/TransMVSNet/train.py:100-104); their keys carry a "module."
    # DDP prefix which load_state_dict strips — emit bare keys (the
    # single-GPU / DataParallel load path).
    _save_torch(args.out, {"epoch": int(step), "model": sd})
    print(f"wrote {args.out}: {len(sd)} tensors from step {step}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("diner", help="orbax DINER ckpt -> Lightning .ckpt")
    d.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    d.add_argument("--out", required=True, help="output .ckpt path")
    d.add_argument("--znear", type=float, required=True,
                   help="scene near bound (the reference stores it as a "
                        "buffer; e.g. DTU 0.321, FaceScape 1.0)")
    d.add_argument("--zfar", type=float, required=True)
    d.add_argument("--config", default=None,
                   help="training YAML (reads poscode num_freqs/freq_factor)")
    d.add_argument("--hparams", default=None,
                   help="JSON dict embedded as hyper_parameters (Lightning "
                        "load_from_checkpoint rebuilds the model from it)")
    d.set_defaults(fn=cmd_diner)

    m = sub.add_parser("mvs", help="orbax TransMVSNet ckpt -> torch .ckpt")
    m.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    m.add_argument("--out", required=True)
    m.set_defaults(fn=cmd_mvs)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
