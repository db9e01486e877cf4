"""Time the REFERENCE PyTorch renderer on a given subset — run with the
reference repo's own environment/python, not this repo's.

Retires the estimated 50k rays/s denominator in bench.py (BASELINE.json
publishes no reference numbers): given a malteprinzler/diner checkout with
its dependencies installed, a Lightning checkpoint, and a config, this loads
the reference DINER via its own code (src/models/diner.py:72-97
predict_imgs_from_batch — the chunked render loop that IS the thing being
compared) and measures wall-clock rays/s over the deterministic eval subset
(python_scripts/create_prediction_folder.py:34-37 subset semantics).

Usage (inside the reference environment):
  python scripts/time_reference_render.py --ref-dir /path/to/diner \
      --config /path/to/diner/configs/evaluate_diner_on_dtu.yaml \
      --ckpt diner_dtu.ckpt --n 8 --out reference_timing.json

The output JSON is consumed by scripts/parity_dtu.sh --ref-timing and
replaces the "(estimated)" label on vs_baseline with a measured figure.
This script only CALLS the reference as a library; no reference code is
reproduced here.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-dir", required=True,
                    help="path to the malteprinzler/diner checkout")
    ap.add_argument("--config", required=True,
                    help="reference eval config (OmegaConf YAML)")
    ap.add_argument("--ckpt", required=True, help="Lightning checkpoint")
    ap.add_argument("--n", type=int, default=8,
                    help="images to render (deterministic Random(0) subset)")
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--device", default=None,
                    help="torch device (default: cuda if available)")
    ap.add_argument("--out", default="reference_timing.json")
    args = ap.parse_args(argv)

    sys.path.insert(0, args.ref_dir)
    import torch
    from omegaconf import OmegaConf

    from src.models.diner import DINER
    from src.util.import_helper import import_obj

    device = args.device or ("cuda" if torch.cuda.is_available() else "cpu")
    conf = OmegaConf.load(args.config)

    dataset_cls = import_obj(conf.data.val.dataset.module)
    dataset = dataset_cls(stage="val", **conf.data.val.dataset.kwargs)
    # same deterministic subset as create_prediction_folder.py:34-37
    idx = sorted(random.Random(0).sample(range(len(dataset)),
                                         min(args.n + args.warmup,
                                             len(dataset))))

    diner = DINER.load_from_checkpoint(args.ckpt, map_location=device)
    diner = diner.to(device).eval()
    diner.znear.fill_(dataset.znear)
    diner.zfar.fill_(dataset.zfar)

    def batch_of(i):
        sample = dataset[i]
        out = {}
        for k, v in sample.items():
            if isinstance(v, torch.Tensor):
                out[k] = v.unsqueeze(0).to(device)
        return out

    with torch.no_grad():
        for i in idx[: args.warmup]:
            diner.predict_imgs_from_batch(batch_of(i))
        if device.startswith("cuda"):
            torch.cuda.synchronize()

        total_rays = 0
        t0 = time.perf_counter()
        for i in idx[args.warmup:]:
            batch = batch_of(i)
            diner.predict_imgs_from_batch(batch)
            h, w = batch["target_rgb"].shape[-2:]
            total_rays += h * w
        if device.startswith("cuda"):
            torch.cuda.synchronize()
        dt = time.perf_counter() - t0

    n_timed = len(idx) - args.warmup
    result = {
        "reference_rays_per_sec": round(total_rays / dt, 1),
        "secs_per_frame": round(dt / max(n_timed, 1), 4),
        "frames": n_timed,
        "total_rays": total_rays,
        "device": device,
        "torch": torch.__version__,
        "ckpt": args.ckpt,
        "config": args.config,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
