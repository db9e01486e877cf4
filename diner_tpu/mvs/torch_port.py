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
    # flax auto-numbering is CONSTRUCTOR order: in
    # `Conv3dBnRelu(2b)(Conv3dBnRelu(2b, stride=2)(x))` the outer stride-1
    # module gets the LOWER index, so torch's strided conv1/3/5 land on
    # _2/_4/_6 and the stride-1 conv2/4/6 on _1/_3/_5
    # (tests/torch_mvs_reference.py cost_reg_net documents the same order)
    order = [("conv0", "Conv3dBnRelu_0"), ("conv1", "Conv3dBnRelu_2"),
             ("conv2", "Conv3dBnRelu_1"), ("conv3", "Conv3dBnRelu_4"),
             ("conv4", "Conv3dBnRelu_3"), ("conv5", "Conv3dBnRelu_6"),
             ("conv6", "Conv3dBnRelu_5")]
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
    # setup-assigned submodule: flax names it by ATTRIBUTE (net.py
    # `self.pixel_wise_net = PixelwiseNet(...)`), not auto-numbering
    params["pixel_wise_net"] = pw_p
    stats["pixel_wise_net"] = pw_s
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


# -- inverse direction: export our flax weights as a reference-keyed torch
# state dict (serve TPU-trained cascades to torch consumers, and the
# round-trip regression test for the port mapping itself) -----------------

def _inv_conv2d(k):  # HWIO -> OIHW
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _inv_conv3d(k):  # DHWIO -> OIDHW
    return np.transpose(np.asarray(k), (4, 3, 0, 1, 2))


def _inv_deconv3d(k):  # (D, H, W, O, I) -> torch (I, O, D, H, W)
    return np.transpose(np.asarray(k), (4, 3, 0, 1, 2))


def _export_bn(sd, p, bn_p, bn_s):
    sd[f"{p}.weight"] = np.asarray(bn_p["scale"])
    sd[f"{p}.bias"] = np.asarray(bn_p["bias"])
    sd[f"{p}.running_mean"] = np.asarray(bn_s["mean"])
    sd[f"{p}.running_var"] = np.asarray(bn_s["var"])


def _export_convbn(sd, p, params, stats):
    k = np.asarray(params["Conv_0"]["kernel"])
    sd[f"{p}.conv.weight"] = _inv_conv2d(k) if k.ndim == 4 else _inv_conv3d(k)
    _export_bn(sd, f"{p}.bn", params["BatchNorm_0"], stats["BatchNorm_0"])


def _export_dcn(sd, p, params, taps: int = 9):
    perm = np.empty(3 * taps, np.int64)
    for k in range(taps):
        perm[k] = 2 * k
        perm[taps + k] = 2 * k + 1
        perm[2 * taps + k] = 2 * taps + k
    inv = np.argsort(perm)
    sd[f"{p}.conv_offset_mask.weight"] = _inv_conv2d(
        params["conv_offset_mask"]["kernel"])[inv]
    sd[f"{p}.conv_offset_mask.bias"] = np.asarray(
        params["conv_offset_mask"]["bias"])[inv]
    sd[f"{p}.weight"] = _inv_conv2d(params["weight"])
    sd[f"{p}.bias"] = np.asarray(params["bias"])


def export_transmvsnet(variables):
    """Our flax TransMVSNet variables -> reference-keyed torch state dict
    (the exact inverse of `port_transmvsnet`)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd = {}

    f_p, f_s = params["feature"], stats["feature"]
    seq = [("conv0.0", "ConvBnRelu_0"), ("conv0.1", "ConvBnRelu_1"),
           ("conv1.0", "ConvBnRelu_2"), ("conv1.1", "ConvBnRelu_3"),
           ("conv1.2", "ConvBnRelu_4"),
           ("conv2.0", "ConvBnRelu_5"), ("conv2.1", "ConvBnRelu_6"),
           ("conv2.2", "ConvBnRelu_7")]
    for theirs, ours in seq:
        _export_convbn(sd, f"feature.{theirs}", f_p[ours], f_s[ours])
    for head in ("out1", "out2", "out3"):
        hp, hs = f_p[head], f_s[head]
        _export_convbn(sd, f"feature.{head}.0", hp["ConvBnRelu_0"],
                       hs["ConvBnRelu_0"])
        _export_dcn(sd, f"feature.{head}.1", hp["DCNLayer_0"])
        _export_bn(sd, f"feature.{head}.2", hp["BatchNorm_0"],
                   hs["BatchNorm_0"])
        _export_dcn(sd, f"feature.{head}.4", hp["DCNLayer_1"])
        _export_bn(sd, f"feature.{head}.5", hp["BatchNorm_1"],
                   hs["BatchNorm_1"])
        _export_dcn(sd, f"feature.{head}.7", hp["DCNLayer_2"])
    for lat in ("inner1", "inner2"):
        sd[f"feature.{lat}.weight"] = _inv_conv2d(f_p[lat]["kernel"])
        sd[f"feature.{lat}.bias"] = np.asarray(f_p[lat]["bias"])

    for i in range(3):
        cp, cs = params[f"costreg_{i}"], stats[f"costreg_{i}"]
        pre = f"cost_regularization.{i}"
        order = [("conv0", "Conv3dBnRelu_0"), ("conv1", "Conv3dBnRelu_2"),
                 ("conv2", "Conv3dBnRelu_1"), ("conv3", "Conv3dBnRelu_4"),
                 ("conv4", "Conv3dBnRelu_3"), ("conv5", "Conv3dBnRelu_6"),
                 ("conv6", "Conv3dBnRelu_5")]
        for theirs, ours in order:
            _export_convbn(sd, f"{pre}.{theirs}", cp[ours], cs[ours])
        for theirs, ours in (("conv7", "Deconv3dBnRelu_0"),
                             ("conv9", "Deconv3dBnRelu_1"),
                             ("conv11", "Deconv3dBnRelu_2")):
            sd[f"{pre}.{theirs}.conv.weight"] = _inv_deconv3d(
                cp[ours]["ConvTranspose_0"]["kernel"])
            _export_bn(sd, f"{pre}.{theirs}.bn", cp[ours]["BatchNorm_0"],
                       cs[ours]["BatchNorm_0"])
        sd[f"{pre}.prob.weight"] = _inv_conv3d(cp["Conv_0"]["kernel"])

    pw_p, pw_s = params["pixel_wise_net"], stats["pixel_wise_net"]
    for theirs, ours in (("conv0", "Conv3dBnRelu_0"),
                         ("conv1", "Conv3dBnRelu_1")):
        _export_convbn(sd, f"DepthNet.pixel_wise_net.{theirs}",
                       pw_p[ours], pw_s[ours])
    sd["DepthNet.pixel_wise_net.conv2.weight"] = _inv_conv3d(
        pw_p["Conv_0"]["kernel"])
    sd["DepthNet.pixel_wise_net.conv2.bias"] = np.asarray(
        pw_p["Conv_0"]["bias"])

    fmt_p = params["fmt_with_pathway"]
    for i in range(8):
        lp = f"FMT_with_pathway.FMT.layers.{i}"
        layer = fmt_p["fmt"][f"layer_{i}"]
        for proj in ("query_projection", "key_projection",
                     "value_projection", "out_projection"):
            sd[f"{lp}.attention.{proj}.weight"] = np.asarray(
                layer["attention"][proj]["kernel"]).T
            sd[f"{lp}.attention.{proj}.bias"] = np.asarray(
                layer["attention"][proj]["bias"])
        for lin in ("linear1", "linear2"):
            sd[f"{lp}.{lin}.weight"] = np.asarray(layer[lin]["kernel"]).T
            sd[f"{lp}.{lin}.bias"] = np.asarray(layer[lin]["bias"])
        for norm in ("norm1", "norm2"):
            sd[f"{lp}.{norm}.weight"] = np.asarray(layer[norm]["scale"])
            sd[f"{lp}.{norm}.bias"] = np.asarray(layer[norm]["bias"])
    for name in ("dim_reduction_1", "dim_reduction_2",
                 "smooth_1", "smooth_2"):
        sd[f"FMT_with_pathway.{name}.weight"] = _inv_conv2d(
            fmt_p[name]["kernel"])
    return sd


def validate_against_init(ported, init_variables):
    """Raise with a full diff if the ported tree's paths/shapes differ from a
    fresh init — the structural gate the CLI runs before using a ported
    checkpoint. Sown runtime-stat collections ("diagnostics", e.g. the
    window-DCN |k+offset| audit) are not parameters and are excluded."""
    import jax

    def flat(tree):
        # Exclude by flattened-path prefix so the filter is container-type
        # agnostic (plain dict, FrozenDict, any Mapping).
        return {jax.tree_util.keystr(k): np.asarray(v).shape
                for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
                if not jax.tree_util.keystr(k).startswith("['diagnostics']")}

    a, b = flat(ported), flat(init_variables)
    problems = []
    for k in sorted(set(a) | set(b)):
        if k not in a:
            problems.append(f"missing from port: {k} {b[k]}")
        elif k not in b:
            problems.append(f"extra in port: {k} {a[k]}")
        elif a[k] != b[k]:
            problems.append(f"shape mismatch at {k}: port {a[k]} vs init {b[k]}")
    if problems:
        raise ValueError("ported checkpoint does not match the architecture:\n"
                         + "\n".join(problems))
