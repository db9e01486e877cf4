"""Render a procedural sphere scene end-to-end and write PNGs.

Usage: python examples/render_synthetic.py [outdir]

Runs on CPU or TPU; with random weights the image is structured noise around
the depth-guided samples — swap in a trained checkpoint via
diner_tpu.train.loop.restore_checkpoint for real renders.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from diner_tpu.core.types import RenderConfig
from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
from diner_tpu.models import PixelNeRF
from diner_tpu.models.diner import DINER
from diner_tpu.image_ops import colormap


def main(outdir="outputs/example"):
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=64, W=64)
    batch = {k: jnp.asarray(v)
             for k, v in to_device_batch(collate([ds[0]])).items()}

    nerf = PixelNeRF(encoder_layers=4, encoder_norm="group", image_padding=16,
                     padding_pe=4, n_blocks=5, d_hidden=512, combine_layer=3)
    model = DINER(nerf=nerf,
                  render_cfg=RenderConfig(n_samples=24, n_depth_candidates=256,
                                          n_gaussian=8),
                  znear=ds.znear, zfar=ds.zfar)
    from diner_tpu.utils.jitinit import jit_init

    variables = jit_init(model.init)(jax.random.PRNGKey(0), batch,
                                     jax.random.PRNGKey(0))

    render = jax.jit(lambda v, b, r: model.apply(v, b, r,
                                                 method="render_batch"))
    rgb, depth = render(variables, batch, jax.random.PRNGKey(1))

    import imageio.v2 as imageio

    imageio.imwrite(outdir / "pred.png",
                    (np.clip(np.asarray(rgb[0]), 0, 1) * 255).astype(np.uint8))
    imageio.imwrite(outdir / "depth.png",
                    (colormap(np.asarray(depth[0])[..., None]) * 255
                     ).astype(np.uint8))
    imageio.imwrite(outdir / "gt.png",
                    (np.asarray(batch["target_rgb"][0]) * 255).astype(np.uint8))
    print(f"wrote {outdir}/pred.png, depth.png, gt.png")


if __name__ == "__main__":
    main(*sys.argv[1:])
