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


# ---------------------------------------------------------------------------
# Inverse direction: flax DINER -> reference-keyed Lightning state dict, so a
# TPU-trained model can be evaluated/finetuned with the reference's torch
# tooling (DINER.load_from_checkpoint consumes ckpt["state_dict"],
# python_scripts/create_prediction_folder.py:41). Exact inverse of
# `port_diner_checkpoint` — round-trip tested in tests/test_model_port.py.
# ---------------------------------------------------------------------------

def _inv_conv(k):  # HWIO -> OIHW
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _inv_lin(sd, p, params):
    sd[f"{p}.weight"] = np.asarray(params["kernel"]).T
    if "bias" in params:
        sd[f"{p}.bias"] = np.asarray(params["bias"])


def _inv_bn(sd, p, bn_p, bn_s):
    sd[f"{p}.weight"] = np.asarray(bn_p["scale"])
    sd[f"{p}.bias"] = np.asarray(bn_p["bias"])
    sd[f"{p}.running_mean"] = np.asarray(bn_s["mean"])
    sd[f"{p}.running_var"] = np.asarray(bn_s["var"])
    sd[f"{p}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_resnet_trunk(sd, prefix: str, params, stats):
    """Inverse of `port_resnet_trunk`: flax trunk tree -> torchvision-keyed
    resnet entries under `prefix` (conv1/bn1/layerS.B.*). The trunk must be
    BatchNorm (encoder_norm="batch" — the reference's trunk,
    image_encoder.py:48); GroupNorm trunks have no torch-side equivalent."""
    if "BatchNorm_0" not in params["norm1"]:
        raise ValueError(
            "export requires a BatchNorm trunk (encoder_norm='batch'); "
            "the reference resnet34 trunk is BatchNorm (image_encoder.py:48)")
    sd[f"{prefix}conv1.weight"] = _inv_conv(params["conv1"]["kernel"])
    _inv_bn(sd, f"{prefix}bn1", params["norm1"]["BatchNorm_0"],
            stats["norm1"]["BatchNorm_0"])
    for key in sorted(k for k in params if k.startswith("layer")):
        stage_s, blk_s = key.split("_")  # "layer1", "block0"
        t = f"{prefix}{stage_s}.{int(blk_s[len('block'):])}"
        bp, bs = params[key], stats[key]
        sd[f"{t}.conv1.weight"] = _inv_conv(bp["Conv_0"]["kernel"])
        sd[f"{t}.conv2.weight"] = _inv_conv(bp["Conv_1"]["kernel"])
        _inv_bn(sd, f"{t}.bn1", bp["_Norm_0"]["BatchNorm_0"],
                bs["_Norm_0"]["BatchNorm_0"])
        _inv_bn(sd, f"{t}.bn2", bp["_Norm_1"]["BatchNorm_0"],
                bs["_Norm_1"]["BatchNorm_0"])
        if "downsample_conv" in bp:
            sd[f"{t}.downsample.0.weight"] = _inv_conv(
                bp["downsample_conv"]["kernel"])
            _inv_bn(sd, f"{t}.downsample.1", bp["downsample_norm"]["BatchNorm_0"],
                    bs["downsample_norm"]["BatchNorm_0"])


def export_resnetfc(sd, prefix: str, params):
    """Inverse of `port_resnetfc` (ResnetFC keys, src/models/resnetfc.py)."""
    _inv_lin(sd, f"{prefix}.lin_in", params["lin_in"])
    _inv_lin(sd, f"{prefix}.lin_out", params["lin_out"])
    for key in sorted(k for k in params if k.startswith("lin_z_")):
        _inv_lin(sd, f"{prefix}.lin_z.{key[len('lin_z_'):]}", params[key])
    for key in sorted(k for k in params if k.startswith("block_")):
        b = key[len("block_"):]
        blk = params[key]
        _inv_lin(sd, f"{prefix}.blocks.{b}.fc_0", blk["Dense_0"])
        _inv_lin(sd, f"{prefix}.blocks.{b}.fc_1", blk["Dense_1"])
        if "Dense_2" in blk:
            sd[f"{prefix}.blocks.{b}.shortcut.weight"] = np.asarray(
                blk["Dense_2"]["kernel"]).T


# torchvision vgg19.features conv index -> reference Vgg19 slice number
# (vggloss.py:25-32: slice1=[0:2], slice2=[2:7], slice3=[7:12], slice4=[12:21])
_VGG19_SLICE = {0: 1, 2: 2, 5: 2, 7: 3, 10: 3, 12: 4, 14: 4, 16: 4, 19: 4}
_VGG19_NAME_TO_IDX = {
    "conv1_1": 0, "conv1_2": 2, "conv2_1": 5, "conv2_2": 7,
    "conv3_1": 10, "conv3_2": 12, "conv3_3": 14, "conv3_4": 16,
    "conv4_1": 19,
}


def _posenc_buffers(sd, prefix: str, num_freqs: int, freq_factor: float):
    """Reference PositionalEncoding persistent buffers
    (positional_encoding.py:18-31): _freqs = repeat_interleave(f_k, 2),
    _phases = (0, pi/2, 0, pi/2, ...), both shaped (1, 2F, 1)."""
    freqs = freq_factor * 2.0 ** np.arange(num_freqs, dtype=np.float32)
    sd[f"{prefix}._freqs"] = np.repeat(freqs, 2).reshape(1, -1, 1)
    phases = np.zeros(2 * num_freqs, np.float32)
    phases[1::2] = np.pi * 0.5
    sd[f"{prefix}._phases"] = phases.reshape(1, -1, 1)


def export_diner(variables, znear: float, zfar: float,
                 num_freqs: int = 6, freq_factor: float = 6.28,
                 vgg_params=None):
    """Our flax PixelNeRF variables -> reference-keyed Lightning state dict
    (the exact inverse of `port_diner_checkpoint`).

    variables: {"params": {"encoder": {"trunk": ...}, "mlp": ...},
                "batch_stats": {"encoder": {"trunk": ...}}} — the PixelNeRF
    subtree (what port_diner_checkpoint returns / what a TPU training run
    stores under params["nerf"]).
    vgg_params: optional Vgg19Features params to emit the frozen
    `vggloss.vgg_net.sliceN.*` entries (present in reference checkpoints
    trained with w_vgg > 0)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd = {}
    sd["znear"] = np.asarray(znear, np.float32)
    sd["zfar"] = np.asarray(zfar, np.float32)
    _posenc_buffers(sd, "nerf.poscode", num_freqs, freq_factor)
    _posenc_buffers(sd, "nerf.depthcode", num_freqs, freq_factor)
    export_resnet_trunk(sd, "nerf.encoder.model.", params["encoder"]["trunk"],
                        stats["encoder"]["trunk"])
    export_resnetfc(sd, "nerf.mlp_fine", params["mlp"])
    if vgg_params is not None:
        for name, idx in _VGG19_NAME_TO_IDX.items():
            if name not in vgg_params:
                continue
            p = f"vggloss.vgg_net.slice{_VGG19_SLICE[idx]}.{idx}"
            sd[f"{p}.weight"] = _inv_conv(vgg_params[name]["kernel"])
            sd[f"{p}.bias"] = np.asarray(vgg_params[name]["bias"])
    return sd
