"""Port reference DINER (PyTorch Lightning) checkpoints into our flax model.

Behavioral reference: DINER.load_from_checkpoint
(python_scripts/create_prediction_folder.py:41 in malteprinzler/diner) — the
released checkpoints contain the PixelNeRF tree:
  nerf.encoder.model.*   torchvision resnet34 trunk (conv1 widened by the
                         border-PE surgery, image_encoder.py:68-86)
  nerf.mlp_fine.*        ResnetFC (lin_in/lin_out/blocks.N.fc_0/fc_1, lin_z.N)
  vggloss.vgg_net.*      frozen VGG19 slices (when trained with w_vgg > 0)

Requires encoder_norm="batch" on our side (the reference trunk is BatchNorm).
Numeric parity of the ported model is exercised end-to-end by rendering the
reference eval pipeline once a checkpoint file is supplied.
"""

from __future__ import annotations

import numpy as np

from diner_tpu.nn.torch_port import port_resnet_trunk, port_vgg19_features


def _lin(sd, p):
    return {"kernel": np.asarray(sd[f"{p}.weight"]).T,
            "bias": np.asarray(sd[f"{p}.bias"])}


def port_resnetfc(sd, prefix: str, n_blocks: int, combine_layer: int):
    params = {
        "lin_in": _lin(sd, f"{prefix}.lin_in"),
        "lin_out": _lin(sd, f"{prefix}.lin_out"),
    }
    n_lin_z = min(combine_layer, n_blocks)
    for i in range(n_lin_z):
        params[f"lin_z_{i}"] = _lin(sd, f"{prefix}.lin_z.{i}")
    for b in range(n_blocks):
        blk = {
            "Dense_0": _lin(sd, f"{prefix}.blocks.{b}.fc_0"),
            "Dense_1": _lin(sd, f"{prefix}.blocks.{b}.fc_1"),
        }
        if f"{prefix}.blocks.{b}.shortcut.weight" in sd:
            blk["Dense_2"] = {"kernel": np.asarray(
                sd[f"{prefix}.blocks.{b}.shortcut.weight"]).T}
        params[f"block_{b}"] = blk
    return params


def port_diner_checkpoint(state_dict, n_blocks: int = 5,
                          combine_layer: int = 3):
    """Lightning state_dict -> {"params", "batch_stats"} for our DINER
    (params keys: nerf/{encoder/trunk, mlp}, vgg)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    # encoder trunk: strip the "nerf.encoder.model." prefix for the resnet port
    trunk_sd = {k[len("nerf.encoder.model."):]: v for k, v in sd.items()
                if k.startswith("nerf.encoder.model.")}
    conv1_in = trunk_sd["conv1.weight"].shape[1]
    # their conv1 already contains the widened input; pass it through directly
    trunk = port_resnet_trunk(trunk_sd, extra_in_channels=0)
    # overwrite conv1 with the full widened kernel (port_resnet_trunk assumed
    # 3 input channels only when widening itself)
    trunk["params"]["conv1"] = {"kernel": np.transpose(
        trunk_sd["conv1.weight"], (2, 3, 1, 0))}

    # PixelNeRF-level tree; wrap under {"nerf": ...} for the DINER assembly
    params = {
        "encoder": {"trunk": trunk["params"]},
        "mlp": port_resnetfc(sd, "nerf.mlp_fine", n_blocks, combine_layer),
    }
    stats = {"encoder": {"trunk": trunk["batch_stats"]}}

    vgg_params = None
    vgg_sd = {k[len("vggloss.vgg_net."):]: v for k, v in sd.items()
              if k.startswith("vggloss.vgg_net.")}
    if vgg_sd:
        # their slices are sliceN.<idx>.*; rebuild torchvision features.* keys
        remap = {}
        for k, v in vgg_sd.items():
            _, idx, kind = k.split(".")
            remap[f"features.{idx}.{kind}"] = v
        vgg_params = port_vgg19_features(remap)["params"]

    extras = {"conv1_in_channels": conv1_in,
              "vgg_params": vgg_params,
              "znear": float(sd["znear"]) if "znear" in sd else None,
              "zfar": float(sd["zfar"]) if "zfar" in sd else None}
    return {"params": params, "batch_stats": stats}, extras
