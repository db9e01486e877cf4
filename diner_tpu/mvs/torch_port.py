"""Port reference TransMVSNet torch checkpoints into our flax cascade.

Behavioral reference: the released TransMVSNet checkpoints used by
deps/TransMVSNet/train.py:383-416 (model.load_state_dict) in
malteprinzler/diner. The reference's module tree (models/module.py Conv2d/
Conv3d/Deconv3d wrappers = conv+BN, dcn.py DCN) maps onto our flax modules:

- Conv/BN pairs -> {Conv kernel OIHW->HWIO, BatchNorm scale/bias + stats}.
- DCN: the reference feeds torchvision's deform_conv2d with
  offset = cat(o1, o2) from a 3-way channel chunk; torchvision reads the
  offset interleaved (dy_k = ch 2k, dx_k = ch 2k+1). Our DCNLayer emits
  interleaved offsets from slot-major halves, so the ported
  conv_offset_mask output channels must be permuted:
  ours[k] = theirs[2k] (dy), ours[taps + k] = theirs[2k + 1] (dx),
  mask channels map 1:1.
- ConvTranspose3d: flax ConvTranspose(transpose_kernel=True, padding=(1, 2))
  with kernel IODHW -> DHW,O,I reproduces torch's stride-2/k-3/
  output_padding-1 semantics bit-near
  (tests/test_mvs.py::test_deconv3d_matches_torch).

Port completeness is validated structurally (tree shapes == a fresh init);
end-to-end numeric validation requires the actual checkpoint file (not
shipped in this environment).
"""

from __future__ import annotations

import numpy as np


def _conv2d(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w):  # OIDHW -> DHWIO
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv3d(w):
    """torch ConvTranspose3d weight (I, O, D, H, W) -> flax
    transpose_kernel=True layout (D, H, W, O, I)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _bn(sd, p):
    return ({"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]},
            {"mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"]})


def _convbn(sd, p):
    """Reference Conv2d/Conv3d wrapper: <p>.conv.* + <p>.bn.* -> our
    ConvBnRelu {Conv_0, BatchNorm_0}."""
    w = sd[f"{p}.conv.weight"]
    conv = {"kernel": _conv2d(w) if w.ndim == 4 else _conv3d(w)}
    bnp, bns = _bn(sd, f"{p}.bn")
    return ({"Conv_0": conv, "BatchNorm_0": bnp}, {"BatchNorm_0": bns})


def _dcn(sd, p, taps: int = 9):
    """Reference DCN -> our DCNLayer (with the offset channel permutation)."""
    om_w = sd[f"{p}.conv_offset_mask.weight"]  # (3*taps, C, k, k)
    om_b = sd[f"{p}.conv_offset_mask.bias"]
    perm = np.empty(3 * taps, np.int64)
    for k in range(taps):
        perm[k] = 2 * k          # our dy_k slot <- their interleaved ch 2k
        perm[taps + k] = 2 * k + 1
        perm[2 * taps + k] = 2 * taps + k  # mask channels unchanged
    params = {
        "conv_offset_mask": {"kernel": _conv2d(om_w[perm]),
                             "bias": om_b[perm]},
        "weight": _conv2d(sd[f"{p}.weight"]),
        "bias": sd.get(f"{p}.bias", np.zeros(sd[f"{p}.weight"].shape[0],
                                             np.float32)),
    }
    return params


def port_feature_net(sd, prefix: str = "feature"):
    """FeatureNet (module.py:343-421) -> our FeatureNet params/batch_stats."""
    params, stats = {}, {}

    def put(name, p, s=None):
        params[name] = p
        if s:
            stats[name] = s

    # trunk convs: conv0 (2), conv1 (3), conv2 (3) -> sequential ConvBnRelu_k
    seq = [("conv0.0", "ConvBnRelu_0"), ("conv0.1", "ConvBnRelu_1"),
           ("conv1.0", "ConvBnRelu_2"), ("conv1.1", "ConvBnRelu_3"),
           ("conv1.2", "ConvBnRelu_4"),
           ("conv2.0", "ConvBnRelu_5"), ("conv2.1", "ConvBnRelu_6"),
           ("conv2.2", "ConvBnRelu_7")]
    for theirs, ours in seq:
        p, s = _convbn(sd, f"{prefix}.{theirs}")
        put(ours, p, s)

    # heads: out1/out2/out3 = [conv, DCN, BN, relu, DCN, BN, relu, DCN]
    for head, ours in (("out1", "out1"), ("out2", "out2"), ("out3", "out3")):
        hp, hs = {}, {}
        p, s = _convbn(sd, f"{prefix}.{head}.0")
        hp["ConvBnRelu_0"] = p
        hs["ConvBnRelu_0"] = s
        hp["DCNLayer_0"] = _dcn(sd, f"{prefix}.{head}.1")
        bnp, bns = _bn(sd, f"{prefix}.{head}.2")
        hp["BatchNorm_0"] = bnp
        hs["BatchNorm_0"] = bns
        hp["DCNLayer_1"] = _dcn(sd, f"{prefix}.{head}.4")
        bnp, bns = _bn(sd, f"{prefix}.{head}.5")
        hp["BatchNorm_1"] = bnp
        hs["BatchNorm_1"] = bns
        hp["DCNLayer_2"] = _dcn(sd, f"{prefix}.{head}.7")
        put(ours, hp, hs)

    for lat in ("inner1", "inner2"):
        params[lat] = {"kernel": _conv2d(sd[f"{prefix}.{lat}.weight"]),
                       "bias": sd[f"{prefix}.{lat}.bias"]}
    return params, stats


def port_cost_reg(sd, prefix: str):
    """CostRegNet (module.py:424-455) -> our CostRegNet params/batch_stats."""
    params, stats = {}, {}
    order = [("conv0", "Conv3dBnRelu_0"), ("conv1", "Conv3dBnRelu_1"),
             ("conv2", "Conv3dBnRelu_2"), ("conv3", "Conv3dBnRelu_3"),
             ("conv4", "Conv3dBnRelu_4"), ("conv5", "Conv3dBnRelu_5"),
             ("conv6", "Conv3dBnRelu_6")]
    for theirs, ours in order:
        p, s = _convbn(sd, f"{prefix}.{theirs}")
        params[ours] = p
        stats[ours] = s
    for theirs, ours in (("conv7", "Deconv3dBnRelu_0"),
                         ("conv9", "Deconv3dBnRelu_1"),
                         ("conv11", "Deconv3dBnRelu_2")):
        w = _deconv3d(sd[f"{prefix}.{theirs}.conv.weight"])
        bnp, bns = _bn(sd, f"{prefix}.{theirs}.bn")
        params[ours] = {"ConvTranspose_0": {"kernel": w},
                        "BatchNorm_0": bnp}
        stats[ours] = {"BatchNorm_0": bns}
    params["Conv_0"] = {"kernel": _conv3d(sd[f"{prefix}.prob.weight"])}
    return params, stats


def port_transmvsnet(state_dict):
    """Full checkpoint port. Returns {"params": ..., "batch_stats": ...}
    shaped like TransMVSNet.init."""
    sd = {k.replace("module.", ""): np.asarray(v)
          for k, v in state_dict.items()}
    params, stats = {}, {}
    params["feature"], stats["feature"] = port_feature_net(sd)
    for i in range(3):
        params[f"costreg_{i}"], stats[f"costreg_{i}"] = port_cost_reg(
            sd, f"cost_regularization.{i}")
    # PixelwiseNet: conv0/conv1 = Conv3d+BN wrappers, conv2 plain Conv3d
    pw_p, pw_s = {}, {}
    for theirs, ours in (("pixel_wise_net.conv0", "Conv3dBnRelu_0"),
                         ("pixel_wise_net.conv1", "Conv3dBnRelu_1")):
        p, s = _convbn(sd, f"DepthNet.{theirs}")
        pw_p[ours] = p
        pw_s[ours] = s
    pw_p["Conv_0"] = {"kernel": _conv3d(sd["DepthNet.pixel_wise_net.conv2.weight"]),
                      "bias": sd["DepthNet.pixel_wise_net.conv2.bias"]}
    params["PixelwiseNet_0"] = pw_p
    stats["PixelwiseNet_0"] = pw_s
    params["fmt_with_pathway"], stats["fmt_with_pathway"] = port_fmt(sd)
    return {"params": params, "batch_stats": stats}


def port_fmt(sd, prefix: str = "FMT_with_pathway"):
    """FMT_with_pathway (FMT.py:40-225) -> our FMTWithPathway params."""
    params = {}
    fmt = {}
    n_layers = 8  # ['self', 'cross'] * 4
    for i in range(n_layers):
        lp = f"{prefix}.FMT.layers.{i}"
        att = {}
        for theirs, ours in (("query_projection", "query_projection"),
                             ("key_projection", "key_projection"),
                             ("value_projection", "value_projection"),
                             ("out_projection", "out_projection")):
            att[ours] = {"kernel": sd[f"{lp}.attention.{theirs}.weight"].T,
                         "bias": sd[f"{lp}.attention.{theirs}.bias"]}
        layer = {"attention": att}
        for lin in ("linear1", "linear2"):
            layer[lin] = {"kernel": sd[f"{lp}.{lin}.weight"].T,
                          "bias": sd[f"{lp}.{lin}.bias"]}
        for norm in ("norm1", "norm2"):
            layer[norm] = {"scale": sd[f"{lp}.{norm}.weight"],
                           "bias": sd[f"{lp}.{norm}.bias"]}
        fmt[f"layer_{i}"] = layer
    params["fmt"] = fmt
    for name in ("dim_reduction_1", "dim_reduction_2", "smooth_1", "smooth_2"):
        params[name] = {"kernel": _conv2d(sd[f"{prefix}.{name}.weight"])}
    return params, {}


def deconv3d_matches_torch_reference():
    """Documentation helper: the parity recipe validated in
    tests/test_mvs.py::test_deconv3d_matches_torch."""
    return dict(transpose_kernel=True, padding=[(1, 2)] * 3,
                kernel_layout="DHW,O,I")
