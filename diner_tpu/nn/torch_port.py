"""Port torch/torchvision checkpoints into diner_tpu flax parameter trees.

The reference relies on ImageNet-pretrained torchvision resnet34/vgg19 and the
LPIPS-VGG linear heads (SURVEY.md §2.2 item 4). This module converts their
state_dicts (loaded from a user-supplied .pth file — the sandbox has no
torchvision and no network) into our NHWC flax trees. Conv kernels transpose
OIHW -> HWIO; BatchNorm running stats land in the `batch_stats` collection.

All functions take a plain dict[str, np.ndarray]; call
`load_torch_state_dict(path)` to read a .pth with torch (CPU).
"""

from __future__ import annotations

import numpy as np

from diner_tpu.nn.resnet import STAGE_BLOCKS


def load_torch_state_dict(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]  # Lightning layout (DINER checkpoints)
    elif "model" in sd:
        sd = sd["model"]  # TransMVSNet layout ({epoch, model, optimizer})
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}


def _conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _bn(prefix, sd):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
    )


def port_resnet_trunk(sd, backbone: str = "resnet34", num_layers: int = 4,
                      extra_in_channels: int = 0, rng=None):
    """Build {params, batch_stats} for ResNetTrunk from a torchvision resnet sd.

    extra_in_channels: widen conv1's input (border-PE surgery,
    image_encoder.py:68-86); the new slices are kaiming-normal init.
    """
    params, stats = {}, {}

    w = _conv(sd["conv1.weight"])  # (7, 7, 3, 64)
    if extra_in_channels:
        rng = np.random.RandomState(0) if rng is None else rng
        fan_out = 7 * 7 * 64
        extra = rng.randn(7, 7, extra_in_channels, 64).astype(w.dtype) * np.sqrt(2.0 / fan_out)
        w = np.concatenate([w, extra], axis=2)
    params["conv1"] = {"kernel": w}
    p, s = _bn("bn1", sd)
    params["norm1"] = {"BatchNorm_0": p}
    stats["norm1"] = {"BatchNorm_0": s}

    for stage in range(min(num_layers - 1, 4)):
        for blk in range(STAGE_BLOCKS[backbone][stage]):
            t = f"layer{stage + 1}.{blk}"
            f = f"layer{stage + 1}_block{blk}"
            bp, bs = {}, {}
            bp["Conv_0"] = {"kernel": _conv(sd[f"{t}.conv1.weight"])}
            bp["Conv_1"] = {"kernel": _conv(sd[f"{t}.conv2.weight"])}
            p, s = _bn(f"{t}.bn1", sd)
            bp["_Norm_0"] = {"BatchNorm_0": p}
            bs["_Norm_0"] = {"BatchNorm_0": s}
            p, s = _bn(f"{t}.bn2", sd)
            bp["_Norm_1"] = {"BatchNorm_0": p}
            bs["_Norm_1"] = {"BatchNorm_0": s}
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                p, s = _bn(f"{t}.downsample.1", sd)
                bp["downsample_norm"] = {"BatchNorm_0": p}
                bs["downsample_norm"] = {"BatchNorm_0": s}
            params[f] = bp
            stats[f] = bs

    return {"params": params, "batch_stats": stats}


# torchvision vgg19.features conv indices -> our layer names.
_VGG19_IDX = {
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3", 16: "conv3_4",
    19: "conv4_1",
}


def port_vgg19_features(sd):
    """Build params for Vgg19Features from torchvision vgg19 `features.*` keys."""
    params = {}
    for idx, name in _VGG19_IDX.items():
        k = f"features.{idx}.weight"
        if k not in sd:
            continue
        params[name] = {
            "kernel": _conv(sd[k]),
            "bias": sd[f"features.{idx}.bias"],
        }
    return {"params": params}
