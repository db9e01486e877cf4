"""Independent PyTorch implementation of the reference DINER forward pass,
used as the parity oracle for the ported flax model.

Behavioral reference (malteprinzler/diner): src/models/image_encoder.py
(SpatialEncoder: replication pad + border PE + resnet34 stages + bilinear
align_corners=True upsample concat), src/models/resnetfc.py (ResnetFC),
src/models/pixelnerf.py:55-145 (encode/forward), src/models/
positional_encoding.py (NeRF PE), src/util/depth2normal.py (central
differences), src/models/nerf_renderer.py:286-365 (composite).

Everything here is a functional re-implementation that consumes the same
Lightning-style state_dict the port consumes (torchvision is not available in
this sandbox, so the resnet34 trunk forward is written out against the
state_dict directly). NOT copied from the reference: forwards are plain
functional torch built from the documented behavior above.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def t(x):
    return torch.as_tensor(np.asarray(x), dtype=torch.float32)


def posenc_torch(x, num_freqs, freq_factor, include_input=True):
    """NeRF PE, freq-major interleaved sin/cos, input first (reference
    positional_encoding.py:33-54)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    freqs = freq_factor * 2.0 ** torch.arange(num_freqs, dtype=x.dtype)
    freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1)
    phases = torch.zeros(2 * num_freqs, dtype=x.dtype)
    phases[1::2] = math.pi * 0.5
    emb = torch.sin(phases.view(1, -1, 1) + x2.unsqueeze(1) * freqs)
    emb = emb.reshape(x2.shape[0], -1)
    if include_input:
        emb = torch.cat([x2, emb], dim=-1)
    return emb.reshape(*shape[:-1], emb.shape[-1])


def _bn(x, sd, p, eps=1e-5):
    return F.batch_norm(x, t(sd[f"{p}.running_mean"]), t(sd[f"{p}.running_var"]),
                        t(sd[f"{p}.weight"]), t(sd[f"{p}.bias"]),
                        training=False, eps=eps)


def _basic_block(x, sd, p, stride):
    out = F.conv2d(x, t(sd[f"{p}.conv1.weight"]), stride=stride, padding=1)
    out = F.relu(_bn(out, sd, f"{p}.bn1"))
    out = _bn(F.conv2d(out, t(sd[f"{p}.conv2.weight"]), padding=1),
              sd, f"{p}.bn2")
    if f"{p}.downsample.0.weight" in sd:
        sc = _bn(F.conv2d(x, t(sd[f"{p}.downsample.0.weight"]), stride=stride),
                 sd, f"{p}.downsample.1")
    else:
        sc = x
    return F.relu(out + sc)


def _layer(x, sd, name, n_blocks, first_stride):
    for b in range(n_blocks):
        x = _basic_block(x, sd, f"{name}.{b}", first_stride if b == 0 else 1)
    return x


def resnet34_stages(x, sd, num_layers=4, use_first_pool=True):
    """conv1..layer3 stage outputs, resnet34 BasicBlock layout."""
    x = F.conv2d(x, t(sd["conv1.weight"]), stride=2, padding=3)
    x = F.relu(_bn(x, sd, "bn1"))
    feats = [x]
    if num_layers > 1:
        if use_first_pool:
            x = F.max_pool2d(x, 3, stride=2, padding=1)
        x = _layer(x, sd, "layer1", 3, 1)
        feats.append(x)
    if num_layers > 2:
        x = _layer(x, sd, "layer2", 4, 2)
        feats.append(x)
    if num_layers > 3:
        x = _layer(x, sd, "layer3", 6, 2)
        feats.append(x)
    return feats


def depth2normal_torch(dmap, K):
    """Central-difference normals on the unprojected point cloud
    (depth2normal.py:7-90; the zero-depth neighbor cleanup is a no-op for the
    strictly positive depth maps used in the parity tests)."""
    N, _, H, W = dmap.shape
    ys = torch.arange(0.5, H, 1.0)
    xs = torch.arange(0.5, W, 1.0)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    rays = torch.stack([gx, gy], dim=-1).reshape(-1, 2).unsqueeze(0).repeat(N, 1, 1)
    rays = (rays - K[:, [0, 1], -1].unsqueeze(-2)) / K[:, [0, 1], [0, 1]].unsqueeze(-2)
    rays = torch.cat([rays, torch.ones_like(rays[..., :1])], dim=-1)
    pts = rays.view(N, H, W, 3) * dmap.view(N, H, W, 1)
    pts = F.pad(pts.permute(0, 3, 1, 2), [1, 1, 1, 1], mode="replicate")
    down, up = pts[:, :, 2:, 1:-1], pts[:, :, :-2, 1:-1]
    right, left = pts[:, :, 1:-1, 2:], pts[:, :, 1:-1, :-2]
    n = torch.cross((down - up).permute(0, 2, 3, 1),
                    (right - left).permute(0, 2, 3, 1), dim=-1)
    n = n / torch.norm(n, dim=-1, keepdim=True)
    n[dmap[:, 0] == 0] = 0
    return n.permute(0, 3, 1, 2)


class TorchReferenceStack:
    """Reference DINER forward at eval time, from a Lightning state_dict."""

    def __init__(self, sd, num_layers=4, image_padding=64, padding_pe=4,
                 num_freqs=6, freq_factor=6.28, n_blocks=5, combine_layer=3,
                 white_bkgd=False):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.trunk_sd = {k[len("nerf.encoder.model."):]: v
                         for k, v in self.sd.items()
                         if k.startswith("nerf.encoder.model.")}
        self.num_layers = num_layers
        self.image_padding = image_padding
        self.feature_padding = image_padding // 2
        self.padding_pe = padding_pe
        self.num_freqs = num_freqs
        self.freq_factor = freq_factor
        self.n_blocks = n_blocks
        self.combine_layer = combine_layer
        self.white_bkgd = white_bkgd

    # ---------------- encoder
    def encode(self, images, depths, depths_std, extrinsics, intrinsics):
        """images (SB,NV,3,H,W) in [0,1]; depths/stds (SB,NV,1,H,W)."""
        SB, NV, C, H, W = images.shape
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 1, 3, 1, 1)
        x = ((images - mean) / std).reshape(SB * NV, C, H, W)

        p = self.image_padding
        x = F.pad(x, [p] * 4, mode="replicate")
        if self.padding_pe >= 0 and p > 0:
            ys = torch.linspace(-1, 1, H + 2 * p)
            xs = torch.linspace(-1, 1, W + 2 * p)
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            grid = torch.stack([gx, gy], dim=-1)
            pe = posenc_torch(grid, self.padding_pe, math.pi, True)
            pe[p:-p, p:-p] = 0
            x = torch.cat([x, pe.permute(2, 0, 1).unsqueeze(0).expand(
                SB * NV, -1, -1, -1)], dim=1)

        feats = resnet34_stages(x, self.trunk_sd, self.num_layers)
        hw = feats[0].shape[-2:]
        feats = [F.interpolate(f, hw, mode="bilinear", align_corners=True)
                 if f.shape[-2:] != hw else f for f in feats]
        self.latent = torch.cat(feats, dim=1).view(SB, NV, -1, *hw)

        self.depths = depths
        self.depths_std = depths_std
        self.normals = depth2normal_torch(
            depths.reshape(SB * NV, 1, H, W),
            intrinsics.reshape(SB * NV, 3, 3)).view(SB, NV, 3, H, W)
        self.poses = extrinsics
        self.focal = intrinsics[:, :, [0, 1], [0, 1]]
        self.c = intrinsics[:, :, :2, -1]
        self.image_shape = torch.tensor([float(W), float(H)])

    def _index(self, maps, uv, mode, padding):
        SB, NV, N, _ = uv.shape
        m = maps.reshape(SB * NV, *maps.shape[-3:])
        u = uv.reshape(SB * NV, N, 1, 2)
        out = F.grid_sample(m, u, align_corners=False, mode=mode,
                            padding_mode=padding)[..., 0]
        return out.view(SB, NV, -1, N)

    def index_latent(self, uv):
        size = torch.tensor([self.latent.shape[-1], self.latent.shape[-2]],
                            dtype=uv.dtype)
        uv = uv * ((size - 2 * self.feature_padding) / size).view(1, 1, 1, 2)
        return self._index(self.latent, uv, "bilinear", "border")

    # ---------------- field
    def field(self, xyz, viewdirs):
        """(SB,B,3) world points/dirs -> (SB,B,4) [sigmoid rgb, relu sigma]."""
        SB, B, _ = xyz.shape
        NV = self.poses.shape[1]
        xyz = xyz.unsqueeze(1).expand(-1, NV, -1, -1)
        rot = self.poses[:, :, :3, :3]
        xyz = torch.matmul(rot, xyz.transpose(-2, -1)).transpose(-2, -1) \
            + self.poses[:, :, :3, -1].unsqueeze(-2)
        z_feature = posenc_torch(xyz, self.num_freqs, self.freq_factor, True)
        dirs = viewdirs.unsqueeze(1).expand(-1, NV, -1, -1)
        dirs = torch.matmul(rot, dirs.transpose(-2, -1)).transpose(-2, -1)
        z_feature = torch.cat([z_feature, dirs], dim=-1)

        uv = xyz[..., :2] / xyz[..., 2:]
        uv = uv * self.focal.unsqueeze(-2) + self.c.unsqueeze(-2)
        uv = uv / self.image_shape * 2 - 1

        latent = self.index_latent(uv).transpose(-1, -2)  # (SB,NV,B,L)
        ref_depth = self._index(self.depths, uv, "nearest", "border")
        depth_dist = ref_depth.squeeze(-2) - xyz[..., -1]
        depth_feature = posenc_torch(depth_dist.unsqueeze(-1),
                                     self.num_freqs, self.freq_factor, True)

        mlp_in = torch.cat([latent, z_feature, depth_feature], dim=-1)
        out = self.resnetfc(mlp_in, combine_dim=1).reshape(SB, B, 4)
        return torch.cat([torch.sigmoid(out[..., :3]),
                          torch.relu(out[..., 3:4])], dim=-1)

    def resnetfc(self, zx, combine_dim):
        sd, pre = self.sd, "nerf.mlp_fine"

        def lin(name, x):
            return F.linear(x, t(sd[f"{pre}.{name}.weight"]),
                            t(sd[f"{pre}.{name}.bias"]))

        d_latent = self.latent.shape[2]
        z, x = zx[..., :d_latent], zx[..., d_latent:]
        x = lin("lin_in", x)
        for b in range(self.n_blocks):
            if b == self.combine_layer:
                x = torch.mean(x, dim=combine_dim)
                z = None
            if z is not None and b < self.combine_layer:
                x = x + lin(f"lin_z.{b}", z)
            dx = lin(f"blocks.{b}.fc_1", F.relu(lin(f"blocks.{b}.fc_0",
                                                    F.relu(x))))
            x = x + dx
        return lin("lin_out", F.relu(x))

    # ---------------- renderer
    def composite(self, rays, z_samp):
        SB, B, K = z_samp.shape
        deltas = torch.cat([z_samp[..., 1:] - z_samp[..., :-1],
                            rays[..., -1:] - z_samp[..., -1:]], dim=-1)
        points = rays[..., None, :3] + z_samp.unsqueeze(-1) * rays[..., None, 3:6]
        dirs = rays[..., None, 3:6].expand(-1, -1, K, -1)
        out = self.field(points.reshape(SB, B * K, 3),
                         dirs.reshape(SB, B * K, 3)).reshape(SB, B, K, 4)
        alphas = 1 - torch.exp(-deltas * torch.relu(out[..., 3]))
        shifted = torch.cat([torch.ones_like(alphas[..., :1]),
                             1 - alphas + 1e-10], dim=-1)
        T = torch.cumprod(shifted, dim=-1)
        weights = alphas * T[..., :-1]
        rgb = torch.sum(weights.unsqueeze(-1) * out[..., :3], dim=-2)
        depth = torch.sum(weights * z_samp, dim=-1)
        if self.white_bkgd:
            rgb = rgb + 1 - weights.sum(-1, keepdim=True)
        return weights, rgb, depth
