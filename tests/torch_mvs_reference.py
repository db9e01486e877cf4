"""Independent PyTorch rebuild of the full TransMVSNet cascade for parity
testing.

Mirrors the architecture contract of deps/TransMVSNet/models/TransMVSNet.py:
109-226 (cascade assembly), module.py:343-421 (FeatureNet FPN + DCN heads),
FMT.py (linear-attention transformer + pathway), module.py:424-477
(CostRegNet + WTA) in malteprinzler/diner — written functionally in torch,
consuming the *flax* variable tree of diner_tpu.mvs.net.TransMVSNet directly
(layout conversions inline). This validates the whole-cascade assembly of the
JAX implementation against independent torch math at random weights, the same
way tests/torch_reference.py does for DINER.

Eval-mode only (BatchNorm uses running stats).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

STAGE_SCALES = (4, 2, 1)


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32).copy())


def _k2(k):  # flax HWIO -> torch OIHW
    return t(k).permute(3, 2, 0, 1).contiguous()


def _k3(k):  # flax DHWIO -> torch OIDHW
    return t(k).permute(4, 3, 0, 1, 2).contiguous()


def _kt3(k):  # flax ConvTranspose(transpose_kernel=True) DHW,O,I -> torch IODHW
    return t(k).permute(4, 3, 0, 1, 2).contiguous()


def _nchw(x):
    return t(x).permute(0, 3, 1, 2).contiguous()


def _bn(x, p, s, eps=1e-5):
    dims = (1,) * (x.dim() - 2)
    sh = (1, -1) + dims
    return (x - t(s["mean"]).view(sh)) / torch.sqrt(t(s["var"]).view(sh) + eps) \
        * t(p["scale"]).view(sh) + t(p["bias"]).view(sh)


def conv_bn_relu(x, p, s, stride=1, relu=True):
    k = _k2(p["Conv_0"]["kernel"])
    pad = (k.shape[-1] - 1) // 2
    x = F.conv2d(x, k, stride=stride, padding=pad)
    x = _bn(x, p["BatchNorm_0"], s["BatchNorm_0"])
    return F.relu(x) if relu else x


def conv3d_bn_relu(x, p, s, stride=1):
    k = _k3(p["Conv_0"]["kernel"])
    pad = (k.shape[-1] - 1) // 2
    x = F.conv3d(x, k, stride=stride, padding=pad)
    x = _bn(x, p["BatchNorm_0"], s["BatchNorm_0"])
    return F.relu(x)


def deconv3d_bn_relu(x, p, s):
    k = _kt3(p["ConvTranspose_0"]["kernel"])
    x = F.conv_transpose3d(x, k, stride=2, padding=1, output_padding=1)
    x = _bn(x, p["BatchNorm_0"], s["BatchNorm_0"])
    return F.relu(x)


def dcn(x, p):
    """DCNLayer equivalent: modulated deformable conv v2 written with
    F.grid_sample (torchvision isn't in this image; torchvision's sampling
    semantics — zero padding, bilinear — are reproduced directly, and the
    offset convention o1=dy / o2=dx matches our DCNLayer's interleaving)."""
    om_k = _k2(p["conv_offset_mask"]["kernel"])
    om_b = t(p["conv_offset_mask"]["bias"])
    om = F.conv2d(x, om_k, om_b, padding=(om_k.shape[-1] - 1) // 2)
    o1, o2, m = torch.chunk(om, 3, dim=1)
    mask = torch.sigmoid(m)
    w = _k2(p["weight"])  # (O, C, K, K)
    O, C, K, _ = w.shape
    taps = K * K
    pad = (K - 1) // 2
    N, _, H, W = x.shape

    ky, kx = torch.meshgrid(torch.arange(K, dtype=torch.float32) - pad,
                            torch.arange(K, dtype=torch.float32) - pad,
                            indexing="ij")
    gy, gx = torch.meshgrid(torch.arange(H, dtype=torch.float32),
                            torch.arange(W, dtype=torch.float32),
                            indexing="ij")
    # (N, taps, H, W) sample positions
    sy = gy[None, None] + ky.reshape(1, -1, 1, 1) + o1
    sx = gx[None, None] + kx.reshape(1, -1, 1, 1) + o2
    u = (sx + 0.5) / W * 2.0 - 1.0
    v = (sy + 0.5) / H * 2.0 - 1.0
    grid = torch.stack([u, v], dim=-1).reshape(N, taps * H, W, 2)
    samples = F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)
    samples = samples.reshape(N, C, taps, H, W) * mask.unsqueeze(1)
    out = torch.einsum("nckhw,ock->nohw",
                       samples, w.reshape(O, C, taps))
    return out + t(p["bias"]).reshape(1, -1, 1, 1)


def dcn_head(x, p, s):
    x = conv_bn_relu(x, p["ConvBnRelu_0"], s["ConvBnRelu_0"])
    x = F.relu(_bn(dcn(x, p["DCNLayer_0"]), p["BatchNorm_0"], s["BatchNorm_0"]))
    x = F.relu(_bn(dcn(x, p["DCNLayer_1"]), p["BatchNorm_1"], s["BatchNorm_1"]))
    return dcn(x, p["DCNLayer_2"])


def feature_net(x, p, s):
    """x: (N, 3, H, W) -> dict stage1(/4) stage2(/2) stage3(/1), NCHW."""
    c0 = conv_bn_relu(x, p["ConvBnRelu_0"], s["ConvBnRelu_0"])
    c0 = conv_bn_relu(c0, p["ConvBnRelu_1"], s["ConvBnRelu_1"])
    c1 = conv_bn_relu(c0, p["ConvBnRelu_2"], s["ConvBnRelu_2"], stride=2)
    c1 = conv_bn_relu(c1, p["ConvBnRelu_3"], s["ConvBnRelu_3"])
    c1 = conv_bn_relu(c1, p["ConvBnRelu_4"], s["ConvBnRelu_4"])
    c2 = conv_bn_relu(c1, p["ConvBnRelu_5"], s["ConvBnRelu_5"], stride=2)
    c2 = conv_bn_relu(c2, p["ConvBnRelu_6"], s["ConvBnRelu_6"])
    c2 = conv_bn_relu(c2, p["ConvBnRelu_7"], s["ConvBnRelu_7"])

    out = {"stage1": dcn_head(c2, p["out1"], s["out1"])}
    intra = F.interpolate(c2, scale_factor=2, mode="nearest") \
        + F.conv2d(c1, _k2(p["inner1"]["kernel"]), t(p["inner1"]["bias"]))
    out["stage2"] = dcn_head(intra, p["out2"], s["out2"])
    intra = F.interpolate(intra, scale_factor=2, mode="nearest") \
        + F.conv2d(c0, _k2(p["inner2"]["kernel"]), t(p["inner2"]["bias"]))
    out["stage3"] = dcn_head(intra, p["out3"], s["out3"])
    return out


def _dense(x, p):
    return F.linear(x, t(p["kernel"]).T.contiguous(), t(p["bias"]))


def linear_attention(q, k, v, eps=1e-6):
    q = F.elu(q) + 1
    k = F.elu(k) + 1
    kv = torch.einsum("nshd,nshm->nhmd", k, v)
    z = 1.0 / (torch.einsum("nlhd,nhd->nlh", q, k.sum(dim=1)) + eps)
    return torch.einsum("nlhd,nhmd,nlh->nlhm", q, kv, z)


def attention_layer(p, queries, keys, values, n_heads=8):
    N, L, _ = queries.shape
    S = keys.shape[1]
    q = _dense(queries, p["query_projection"]).reshape(N, L, n_heads, -1)
    k = _dense(keys, p["key_projection"]).reshape(N, S, n_heads, -1)
    v = _dense(values, p["value_projection"]).reshape(N, S, n_heads, -1)
    out = linear_attention(q, k, v).reshape(N, L, -1)
    return _dense(out, p["out_projection"])


def _ln(x, p, eps=1e-6):
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    return (x - mu) / torch.sqrt(var + eps) * t(p["scale"]) + t(p["bias"])


def encoder_layer(p, x, source):
    x = x + attention_layer(p["attention"], x, source, source)
    y = x = _ln(x, p["norm1"])
    y = F.relu(_dense(y, p["linear1"]))
    y = _dense(y, p["linear2"])
    return _ln(x + y, p["norm2"])


def sine_pe_2d(d_model, H, W):
    pe = np.zeros((d_model, H, W), np.float32)
    y = np.arange(1, H + 1, dtype=np.float32)[:, None] * np.ones((1, W), np.float32)
    x = np.arange(1, W + 1, dtype=np.float32)[None] * np.ones((H, 1), np.float32)
    div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32)
                 * (-np.log(10000.0) / (d_model // 2)))[:, None, None]
    pe[0::4] = np.sin(x[None] * div)
    pe[1::4] = np.cos(x[None] * div)
    pe[2::4] = np.sin(y[None] * div)
    pe[3::4] = np.cos(y[None] * div)
    return torch.from_numpy(pe)  # (C, H, W)


def fmt_ref(p, ref):
    """ref: (N, C, H, W) -> list of per-self-layer outputs (N, C, H, W)."""
    N, C, H, W = ref.shape
    x = (ref + sine_pe_2d(C, H, W)).flatten(2).transpose(1, 2)  # (N, HW, C)
    outs = []
    for i in range(8):
        if i % 2 == 0:  # self layers at even slots ("self","cross")*4
            x = encoder_layer(p[f"layer_{i}"], x, x)
            outs.append(x.transpose(1, 2).reshape(N, C, H, W))
    return outs


def fmt_src(p, ref_list, src):
    N, C, H, W = src.shape
    refs = [r.flatten(2).transpose(1, 2) for r in ref_list]
    x = (src + sine_pe_2d(C, H, W)).flatten(2).transpose(1, 2)
    for i in range(8):
        if i % 2 == 0:
            x = encoder_layer(p[f"layer_{i}"], x, x)
        else:
            x = encoder_layer(p[f"layer_{i}"], x, refs[i // 2])
    return x.transpose(1, 2).reshape(N, C, H, W)


def fmt_with_pathway(p, features):
    def up_add(x, y):
        return F.interpolate(x, size=y.shape[-2:], mode="bilinear",
                             align_corners=False) + y

    out, ref_list = [], None
    for i, f in enumerate(features):
        f = dict(f)
        if i == 0:
            ref_list = fmt_ref(p["fmt"], f["stage1"])
            f["stage1"] = ref_list[-1]
        else:
            f["stage1"] = fmt_src(p["fmt"], ref_list, f["stage1"])
        f["stage2"] = F.conv2d(up_add(
            F.conv2d(f["stage1"], _k2(p["dim_reduction_1"]["kernel"])),
            f["stage2"]), _k2(p["smooth_1"]["kernel"]), padding=1)
        f["stage3"] = F.conv2d(up_add(
            F.conv2d(f["stage2"], _k2(p["dim_reduction_2"]["kernel"])),
            f["stage3"]), _k2(p["smooth_2"]["kernel"]), padding=1)
        out.append(f)
    return out


def homo_warping(src_fea, src_proj, ref_proj, depth_values):
    """src_fea: (B, C, H, W); projs: (B, 4, 4); depth_values: (B, D, H, W)
    -> (B, C, D, H, W). module.py:284-322 semantics (align_corners=True,
    invalid z pushed far outside)."""
    B, C, H, W = src_fea.shape
    D = depth_values.shape[1]
    proj = torch.matmul(src_proj, torch.inverse(ref_proj))
    rot, trans = proj[:, :3, :3], proj[:, :3, 3]

    gy, gx = torch.meshgrid(torch.arange(H, dtype=torch.float32),
                            torch.arange(W, dtype=torch.float32), indexing="ij")
    xyz = torch.stack([gx.reshape(-1), gy.reshape(-1),
                       torch.ones(H * W)])  # (3, HW)
    rot_xyz = torch.matmul(rot, xyz)  # (B, 3, HW)
    d = depth_values.reshape(B, 1, D, -1)
    pts = rot_xyz.unsqueeze(2) * d + trans.reshape(B, 3, 1, 1)  # (B, 3, D, HW)
    invalid = pts[:, 2] < 1e-6
    z = torch.where(invalid, torch.ones_like(pts[:, 2]), pts[:, 2])
    u = pts[:, 0] / z / ((W - 1) / 2.0) - 1.0
    v = pts[:, 1] / z / ((H - 1) / 2.0) - 1.0
    u = torch.where(invalid, torch.full_like(u, -99.0), u)
    v = torch.where(invalid, torch.full_like(v, -99.0), v)
    grid = torch.stack([u, v], dim=-1).reshape(B, D * H, W, 2)
    warped = F.grid_sample(src_fea, grid, mode="bilinear",
                           padding_mode="zeros", align_corners=True)
    return warped.reshape(B, C, D, H, W)


def pixelwise_net(p, s, x):
    """x: (B, 1, D, H, W) -> (B, 1, H, W)."""
    x = conv3d_bn_relu(x, p["Conv3dBnRelu_0"], s["Conv3dBnRelu_0"])
    x = conv3d_bn_relu(x, p["Conv3dBnRelu_1"], s["Conv3dBnRelu_1"])
    x = F.conv3d(x, _k3(p["Conv_0"]["kernel"]), t(p["Conv_0"]["bias"]))
    x = torch.sigmoid(x.squeeze(1))  # (B, D, H, W)
    return x.max(dim=1, keepdim=True)[0]


def cost_reg_net(p, s, x):
    # flax auto-numbering is constructor-order: in
    # `Conv3dBnRelu(2b)(Conv3dBnRelu(2b, stride=2)(c0))` the OUTER module
    # gets the lower index — so _1/_3/_5 are the stride-1 outers and
    # _2/_4/_6 the stride-2 inners
    c0 = conv3d_bn_relu(x, p["Conv3dBnRelu_0"], s["Conv3dBnRelu_0"])
    c2 = conv3d_bn_relu(conv3d_bn_relu(c0, p["Conv3dBnRelu_2"],
                                       s["Conv3dBnRelu_2"], stride=2),
                        p["Conv3dBnRelu_1"], s["Conv3dBnRelu_1"])
    c4 = conv3d_bn_relu(conv3d_bn_relu(c2, p["Conv3dBnRelu_4"],
                                       s["Conv3dBnRelu_4"], stride=2),
                        p["Conv3dBnRelu_3"], s["Conv3dBnRelu_3"])
    y = conv3d_bn_relu(conv3d_bn_relu(c4, p["Conv3dBnRelu_6"],
                                      s["Conv3dBnRelu_6"], stride=2),
                       p["Conv3dBnRelu_5"], s["Conv3dBnRelu_5"])
    y = c4 + deconv3d_bn_relu(y, p["Deconv3dBnRelu_0"], s["Deconv3dBnRelu_0"])
    y = c2 + deconv3d_bn_relu(y, p["Deconv3dBnRelu_1"], s["Deconv3dBnRelu_1"])
    y = c0 + deconv3d_bn_relu(y, p["Deconv3dBnRelu_2"], s["Deconv3dBnRelu_2"])
    return F.conv3d(y, _k3(p["Conv_0"]["kernel"]), padding=1)


def depth_range_samples(cur_depth, ndepth, interval_pixel, shape):
    B, H, W = shape
    steps = torch.arange(ndepth, dtype=torch.float32)
    if cur_depth.dim() == 2:
        lo, hi = cur_depth[:, 0], cur_depth[:, -1]
        interval = (hi - lo) / (ndepth - 1)
        d = lo[:, None] + steps[None] * interval[:, None]
        return d[:, :, None, None].expand(B, ndepth, H, W)
    lo = cur_depth - ndepth / 2 * interval_pixel
    hi = cur_depth + ndepth / 2 * interval_pixel
    interval = (hi - lo) / (ndepth - 1)
    return lo.unsqueeze(1) + steps.reshape(1, -1, 1, 1) * interval.unsqueeze(1)


def _fuse_proj(proj):  # (B, 2, 4, 4) [ext, K] -> K-premultiplied 4x4
    out = proj[:, 0].clone()
    out[:, :3, :4] = torch.matmul(proj[:, 1, :3, :3], proj[:, 0, :3, :4])
    return out


def depth_net(stage_idx, features, projs, depth_values, view_weights,
              p, s, cr_key):
    """features: list (B, C, h, w); projs: (B, V, 2, 4, 4);
    depth_values: (B, D, h, w)."""
    ref_f, src_fs = features[0], features[1:]
    ref_proj = _fuse_proj(projs[:, 0])
    sim_sum, w_sum = 0.0, 1e-5
    vw_list = []
    for i, src_f in enumerate(src_fs):
        src_proj = _fuse_proj(projs[:, i + 1])
        warped = homo_warping(src_f, src_proj, ref_proj, depth_values)
        sim = (warped * ref_f.unsqueeze(2)).mean(dim=1, keepdim=True)
        if view_weights is None:
            vw = pixelwise_net(p["pixel_wise_net"], s["pixel_wise_net"], sim)
            vw_list.append(vw)
        else:
            vw = view_weights[:, i:i + 1]
        sim_sum = sim_sum + sim * vw.unsqueeze(2)
        w_sum = w_sum + vw.unsqueeze(2)
    similarity = sim_sum / w_sum

    cost = cost_reg_net(p[cr_key], s[cr_key], similarity).squeeze(1)
    prob_volume = torch.softmax(cost, dim=1)
    idx = prob_volume.argmax(dim=1, keepdim=True)
    depth = torch.gather(depth_values, 1, idx).squeeze(1)
    conf = prob_volume.max(dim=1)[0]
    out = {"depth": depth, "photometric_confidence": conf,
           "prob_volume": prob_volume, "depth_values": depth_values}
    if view_weights is None:
        view_weights = torch.cat(vw_list, dim=1).detach()
    return out, view_weights


def cascade_forward(variables, imgs, proj_matrices, depth_values,
                    ndepths=(8, 8, 8), depth_intervals_ratio=(4, 2, 1)):
    """imgs: (B, V, H, W, 3) NHWC numpy/jax; proj_matrices: dict stage1..3 of
    (B, V, 2, 4, 4); depth_values: (B, D_full). Returns per-stage dicts with
    numpy depth/conf (matching diner_tpu.mvs.net.TransMVSNet.__call__)."""
    p = variables["params"]
    s = variables["batch_stats"]
    imgs = t(imgs)
    B, V, H, W, _ = imgs.shape
    dv = t(depth_values)
    depth_min, depth_max = dv[:, 0], dv[:, -1]
    depth_interval = (depth_max - depth_min) / dv.shape[1]

    feats = [feature_net(imgs[:, v].permute(0, 3, 1, 2).contiguous(),
                         p["feature"], s["feature"]) for v in range(V)]
    feats = fmt_with_pathway(p["fmt_with_pathway"], feats)

    outputs = {}
    depth, view_weights = None, None
    for stage_idx, (nd, ratio) in enumerate(zip(ndepths, depth_intervals_ratio)):
        scale = STAGE_SCALES[stage_idx]
        h, w = H // scale, W // scale
        fs = [f[f"stage{stage_idx + 1}"] for f in feats]
        projs = t(proj_matrices[f"stage{stage_idx + 1}"])

        if depth is None:
            cur = dv
        else:
            cur = F.interpolate(depth.detach().unsqueeze(1), size=(H, W),
                                mode="bilinear", align_corners=False).squeeze(1)
        drs = depth_range_samples(cur, nd, ratio * depth_interval.reshape(-1, 1, 1),
                                  (B, H, W))
        drs = F.interpolate(drs.unsqueeze(1), size=(nd, h, w), mode="trilinear",
                            align_corners=False).squeeze(1)
        if view_weights is not None:
            view_weights = F.interpolate(view_weights, scale_factor=2,
                                         mode="nearest")
        out_stage, view_weights = depth_net(
            stage_idx, fs, projs, drs,
            view_weights if stage_idx else None, p, s,
            f"costreg_{stage_idx}")
        depth = out_stage["depth"]
        outputs[f"stage{stage_idx + 1}"] = {
            k: v.detach().numpy() for k, v in out_stage.items()}
    outputs["depth"] = depth.detach().numpy()
    outputs["photometric_confidence"] = \
        outputs[f"stage{len(ndepths)}"]["photometric_confidence"]
    return outputs
