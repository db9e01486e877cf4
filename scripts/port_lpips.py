"""Port LPIPS(net="vgg") weights into diner_tpu's .npz format.

The sandbox has no network egress, so the two source files must be supplied
by the user (they are the standard public releases):

  --lpips-ckpt  lpips/weights/v0.1/vgg.pth from pip `lpips==0.1.4`
                (the exact package version the reference pins,
                src/evaluation/eval_suite.py:52)
  --vgg16       torchvision `vgg16-397923af.pth` (the 8-hex filename suffix
                is torchvision's sha256 prefix of the file — verify on
                download)

Usage:
  python scripts/port_lpips.py --lpips-ckpt vgg.pth \
      --vgg16 vgg16-397923af.pth --out lpips_vgg.npz

The script validates the full tensor-shape contract of both checkpoints
(13 VGG16 convs + 5 lin heads with the expected channel counts), records the
sha256 of both source files in the output, and round-trips the result through
LpipsVgg once. Point `render_eval --lpips` (or evaluate_folder) at the .npz
and `lpips` flows into every score report.
"""

from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_VGG16_CONV_SHAPES = {
    0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128),
    10: (256, 128), 12: (256, 256), 14: (256, 256),
    17: (512, 256), 19: (512, 512), 21: (512, 512),
    24: (512, 512), 26: (512, 512), 28: (512, 512),
}
_LIN_CH = (64, 128, 256, 512, 512)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lpips-ckpt", required=True)
    ap.add_argument("--vgg16", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import torch

    from diner_tpu.nn.lpips import (LpipsVgg, port_lpips_vgg, save_lpips_npz)

    lpips_sd = {k: np.asarray(v) for k, v in
                torch.load(args.lpips_ckpt, map_location="cpu",
                           weights_only=False).items()}
    vgg_sd = {k: np.asarray(v) for k, v in
              torch.load(args.vgg16, map_location="cpu",
                         weights_only=False).items()}

    for idx, (o, i) in _VGG16_CONV_SHAPES.items():
        w = vgg_sd[f"features.{idx}.weight"]
        assert w.shape == (o, i, 3, 3), (idx, w.shape)
    for li, ch in enumerate(_LIN_CH):
        for key in (f"lin{li}.model.1.weight", f"lins.{li}.model.1.weight"):
            if key in lpips_sd:
                assert lpips_sd[key].reshape(-1).shape == (ch,), key
                break
        else:
            raise SystemExit(f"lin head {li} missing from {args.lpips_ckpt}")

    variables = port_lpips_vgg(lpips_sd, vgg_sd)

    # round-trip sanity: identical images -> 0, different -> > 0
    import jax.numpy as jnp

    model = LpipsVgg()
    x = jnp.zeros((1, 32, 32, 3))
    y = jnp.ones((1, 32, 32, 3)) * 0.5
    d_same = float(model.apply(variables, x, x)[0])
    d_diff = float(model.apply(variables, x, y)[0])
    assert abs(d_same) < 1e-6 and d_diff > 0, (d_same, d_diff)

    sha = {p: hashlib.sha256(Path(getattr(args, p)).read_bytes()).hexdigest()
           for p in ("lpips_ckpt", "vgg16")}
    variables = dict(variables)
    variables["_source_sha256"] = {k: np.frombuffer(v.encode(), np.uint8)
                                   for k, v in sha.items()}
    save_lpips_npz(variables, args.out)
    print(f"wrote {args.out}")
    for k, v in sha.items():
        print(f"  {k} sha256 {v}")
    print(f"  sanity: d(x,x)={d_same:.2e}, d(x,y)={d_diff:.4f}")


if __name__ == "__main__":
    main()
