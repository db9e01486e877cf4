"""TransMVSNet-equivalent cascade MVS network (flax, NHWC/NDHWC).

Behavioral reference: deps/TransMVSNet/models/TransMVSNet.py:9-226 in
malteprinzler/diner. 3-stage coarse-to-fine: FeatureNet FPN -> FMT linear
attention -> per-stage plane-sweep cost volumes (pairwise correlation
similarity, PixelwiseNet view weights computed at stage 1 and nearest-upsampled
after), 3D-UNet regularization, softmax -> prob volume, winner-take-all depth,
photometric confidence = max prob. Depth hypotheses: full [min, max] range at
stage 1; +-ndepth/2 * interval refinement around the (bilinearly upsampled,
gradient-detached) previous depth at stages 2/3.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from diner_tpu.mvs.feature_net import FeatureNet
from diner_tpu.mvs.fmt import FMTWithPathway
from diner_tpu.mvs.layers import Conv3dBnRelu, Deconv3dBnRelu
from diner_tpu.mvs.ops import homo_warping, depth_range_samples, depth_wta

STAGE_SCALES = (4, 2, 1)


class PixelwiseNet(nn.Module):
    """1x1x1 3D convs + sigmoid + max over depth -> per-pixel view weight."""

    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, D, H, W, 1) similarity -> (B, H, W, 1)."""
        x = Conv3dBnRelu(16, kernel=1, dtype=self.dtype)(x, train)
        x = Conv3dBnRelu(8, kernel=1, dtype=self.dtype)(x, train)
        x = nn.Conv(1, (1, 1, 1), dtype=self.dtype)(x)
        x = nn.sigmoid(x[..., 0])  # (B, D, H, W)
        return jnp.max(x, axis=1)[..., None]  # (B, H, W, 1)


class CostRegNet(nn.Module):
    """3D UNet over (D, H, W) cost volumes (module.py:424-455)."""

    base_channels: int = 8
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        dt = self.dtype
        c0 = Conv3dBnRelu(b, dtype=dt)(x, train)
        c2 = Conv3dBnRelu(2 * b, dtype=dt)(
            Conv3dBnRelu(2 * b, stride=2, dtype=dt)(c0, train), train)
        c4 = Conv3dBnRelu(4 * b, dtype=dt)(
            Conv3dBnRelu(4 * b, stride=2, dtype=dt)(c2, train), train)
        y = Conv3dBnRelu(8 * b, dtype=dt)(
            Conv3dBnRelu(8 * b, stride=2, dtype=dt)(c4, train), train)
        y = c4 + Deconv3dBnRelu(4 * b, dtype=dt)(y, train)
        y = c2 + Deconv3dBnRelu(2 * b, dtype=dt)(y, train)
        y = c0 + Deconv3dBnRelu(b, dtype=dt)(y, train)
        return nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                       dtype=dt)(y)


class TransMVSNet(nn.Module):
    """Full cascade. Input images must have H, W divisible by 32 (3-level
    3D-UNet on the /4 stage) and every ndepth divisible by 8 — the reference's
    DTU shapes (512x640, ndepths 48/32/8) satisfy this."""

    ndepths: Sequence[int] = (48, 32, 8)
    depth_intervals_ratio: Sequence[float] = (4, 2, 1)
    cr_base_chs: Sequence[int] = (8, 8, 8)
    base_channels: int = 8
    # "bfloat16" runs convs/DCN/FMT/cost volumes in bf16 (params stay f32;
    # geometry, softmax and depth regression stay f32) — ~1.3x on the chip
    # with depth deltas well under the hypothesis spacing (PERFORMANCE.md
    # round 3). Default f32 = reference parity.
    compute_dtype: str = "float32"
    # "window" swaps the DCN heads to the gather-free stencil implementation
    # (deform_conv2d_window: exact while |offset| < 1 px, params identical,
    # checkpoints interchangeable). Default "gather" = exact semantics.
    dcn_impl: str = "gather"

    @property
    def _dt(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def setup(self):
        dt = self._dt
        self.feature = FeatureNet(base_channels=self.base_channels, dtype=dt,
                                  dcn_impl=self.dcn_impl)
        self.fmt_with_pathway = FMTWithPathway(
            base_channels=self.base_channels, dtype=dt)
        self.cost_regularization = [
            CostRegNet(base_channels=self.cr_base_chs[i], dtype=dt,
                       name=f"costreg_{i}")
            for i in range(len(self.ndepths))]
        self.pixel_wise_net = PixelwiseNet(dtype=dt)

    def _depth_net(self, stage_idx, features, proj_mats, depth_values,
                   view_weights, train):
        """features: list per view (B, h, w, C); proj_mats: (B, V, 2, 4, 4)
        [extrinsics, intrinsics] stacks; depth_values: (B, D, h, w)."""
        ref_f, src_fs = features[0], features[1:]

        def fuse(proj):  # K @ [R|t] premultiplied 4x4
            out = proj[:, 0]
            krt = jnp.einsum("bij,bjk->bik", proj[:, 1, :3, :3],
                             proj[:, 0, :3, :4])
            return out.at[:, :3, :4].set(krt)

        ref_proj = fuse(proj_mats[:, 0])
        sim_sum = 0.0
        w_sum = 1e-5
        vw_list = []
        for i, src_f in enumerate(src_fs):
            src_proj = fuse(proj_mats[:, i + 1])
            warped = homo_warping(src_f, src_proj, ref_proj, depth_values)
            sim = jnp.mean(warped * ref_f[:, None], axis=-1,
                           keepdims=True)  # (B, D, h, w, 1)
            if view_weights is None:
                vw = self.pixel_wise_net(sim, train)  # (B, h, w, 1)
                vw_list.append(vw)
            else:
                vw = view_weights[..., i:i + 1]
            sim_sum = sim_sum + sim * vw[:, None]
            w_sum = w_sum + vw[:, None]
        similarity = sim_sum / w_sum  # (B, D, h, w, 1)

        cost = self.cost_regularization[stage_idx](similarity, train)[..., 0]
        # prob volume / WTA in f32 regardless of compute dtype
        prob_volume = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
        depth = depth_wta(prob_volume, depth_values)
        conf = jnp.max(prob_volume, axis=1)
        out = {"depth": depth, "photometric_confidence": conf,
               "prob_volume": prob_volume, "depth_values": depth_values}
        if view_weights is None:
            view_weights = jax.lax.stop_gradient(
                jnp.concatenate(vw_list, axis=-1))  # (B, h, w, V-1)
        return out, view_weights

    def __call__(self, imgs, proj_matrices, depth_values, train: bool = False):
        """imgs: (B, V, H, W, 3); proj_matrices: dict stage1..3 of
        (B, V, 2, 4, 4); depth_values: (B, D_full) full-range hypotheses.
        Returns dict with per-stage outputs; 'depth'/'photometric_confidence'
        of the last stage at full resolution."""
        B, V, H, W, _ = imgs.shape
        depth_min = depth_values[:, 0]
        depth_max = depth_values[:, -1]
        depth_interval = (depth_max - depth_min) / depth_values.shape[1]

        if train:
            # per-view calls: BatchNorm batch statistics are computed per
            # view, exactly like the reference's per-view feature() calls
            # (TransMVSNet.py:126-128)
            features = [self.feature(imgs[:, v], train) for v in range(V)]
        else:
            # inference (running BN stats): one batched trunk over B*V
            # images is bit-identical per view and gives XLA one large
            # conv program instead of V copies
            fall = self.feature(imgs.reshape(B * V, H, W, 3), train)
            features = [
                jax.tree.map(
                    lambda a, v=v: a.reshape(B, V, *a.shape[1:])[:, v], fall)
                for v in range(V)]
        features = self.fmt_with_pathway(features)

        outputs = {}
        depth = None
        view_weights = None
        for stage_idx, (nd, ratio) in enumerate(
                zip(self.ndepths, self.depth_intervals_ratio)):
            scale = STAGE_SCALES[stage_idx]
            h, w = H // scale, W // scale
            feats = [f[f"stage{stage_idx + 1}"] for f in features]
            projs = proj_matrices[f"stage{stage_idx + 1}"]

            if depth is None:
                cur = depth_values  # (B, D_full)
            else:
                cur = jax.lax.stop_gradient(depth)
                cur = jax.image.resize(cur, (B, H, W), method="linear")
            drs = depth_range_samples(
                cur, nd, ratio * depth_interval[:, None, None], (B, H, W))
            # trilinear (here: bilinear spatial) resize to stage resolution
            # antialias=False: torch F.interpolate(trilinear) does not
            # prefilter when downscaling (TransMVSNet.py:204 contract)
            drs = jax.image.resize(drs, (B, nd, h, w), method="linear",
                                   antialias=False)

            if view_weights is not None:
                view_weights = jax.image.resize(
                    view_weights, (B, h, w, view_weights.shape[-1]),
                    method="nearest")
            out_stage, view_weights = self._depth_net(
                stage_idx, feats, projs, drs, view_weights if stage_idx else None,
                train)
            depth = out_stage["depth"]
            outputs[f"stage{stage_idx + 1}"] = out_stage
        outputs["depth"] = depth
        outputs["photometric_confidence"] = \
            outputs["stage3" if len(self.ndepths) == 3 else
                    f"stage{len(self.ndepths)}"]["photometric_confidence"]
        return outputs


def window_offset_stats(net, variables, imgs, projs, dvals):
    """Audit the window-DCN exactness domain on a real batch.

    Runs ONE jitted forward with the "diagnostics" collection mutable and
    returns (max_disp, per_layer): the maximum |k + offset| tap displacement
    over every DCN head, and a {layer-path: max} dict. deform_conv2d_window
    is bit-exact while max_disp < margin - 1e-3 (margin 2 for the 3x3
    heads, mvs/ops.py); beyond that, taps clamp to the window edge AND stop
    receiving offset gradient — callers (cli/mvs.py --dcn-impl window)
    should warn or fall back to the gather impl. Works with either impl:
    the sow happens before the implementation split.
    """

    @jax.jit
    def run(variables, imgs, projs, dvals):
        _, diag = net.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            imgs, projs, dvals, mutable=["diagnostics"])
        return diag["diagnostics"]

    diag = run(variables, imgs, projs, dvals)
    flat = jax.tree_util.tree_flatten_with_path(diag)[0]
    per_layer = {}
    for path, leaf in flat:
        name = "/".join(getattr(p, "key", str(p)) for p in path
                        if getattr(p, "key", None) not in
                        (None, "window_disp_max"))
        per_layer[name] = float(jnp.max(leaf))
    return max(per_layer.values()), per_layer
