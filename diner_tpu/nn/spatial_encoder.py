"""Pixel-aligned spatial image encoder (ResNet trunk + border positional encoding).

Behavioral reference: src/models/image_encoder.py:14-291 (SpatialEncoder) in
malteprinzler/diner. The input image is replication-padded by `image_padding`
px; a 2D positional encoding is written into the *padded border only* (zeros
inside) and concatenated as extra channels, so rays projecting slightly
outside a source view still index meaningful features; the stem conv accepts
the extra channels. Stage outputs are upsampled (bilinear, align_corners=True)
to the stem resolution and concatenated (latent_size=512 for num_layers=4).

TPU-first deltas vs the reference: NHWC layout; the encoder is a pure flax
module returning the latent (no mutable caching — callers thread an explicit
SceneEncoding, SURVEY.md §7.3); norm is pluggable ("group" default for
from-scratch training, "batch" for weight-ported parity).

DINER config: image_padding=64, padding_pe=4 (configs/train_dtu.yaml:37-38).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from diner_tpu.nn.posenc import posenc, posenc_dim
from diner_tpu.nn.resnet import ResNetTrunk
from diner_tpu.image_ops import resize_bilinear_align_corners


class SpatialEncoder(nn.Module):
    backbone: str = "resnet34"
    num_layers: int = 4
    norm: str = "group"
    use_first_pool: bool = True
    image_padding: int = 0
    padding_pe: int = -1  # num_freqs of the border PE; <0 disables
    dtype: object = None  # compute dtype for the trunk (params stay f32)

    @property
    def latent_size(self) -> int:
        return [0, 64, 128, 256, 512, 1024][self.num_layers]

    @property
    def feature_padding(self) -> int:
        # Stem stride is 2 for the whole BasicBlock family.
        assert self.image_padding % 2 == 0
        return self.image_padding // 2

    def border_pe(self, H: int, W: int, dtype=jnp.float32):
        """(Hp, Wp, C_pe) border positional encoding (zeros inside the image)."""
        p = self.image_padding
        Hp, Wp = H + 2 * p, W + 2 * p
        ys = jnp.linspace(-1.0, 1.0, Hp, dtype=dtype)
        xs = jnp.linspace(-1.0, 1.0, Wp, dtype=dtype)
        gx, gy = jnp.meshgrid(xs, ys)
        grid = jnp.stack([gx, gy], axis=-1)  # (Hp, Wp, 2) [x, y]
        pe = posenc(grid, num_freqs=self.padding_pe, freq_factor=jnp.pi,
                    include_input=True)
        inside = jnp.zeros((Hp, Wp), bool).at[p:Hp - p, p:Wp - p].set(True)
        return jnp.where(inside[..., None], 0.0, pe)

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        """imgs: (N, H, W, 3), ImageNet-normalized. Returns (N, Hf, Wf, latent)."""
        N, H, W, _ = imgs.shape
        p = self.image_padding
        if p > 0:
            imgs = jnp.pad(imgs, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
        if self.padding_pe >= 0 and p > 0:
            pe = self.border_pe(H, W, imgs.dtype)
            imgs = jnp.concatenate(
                [imgs, jnp.broadcast_to(pe[None], (N, *pe.shape))], axis=-1)

        feats = ResNetTrunk(backbone=self.backbone, num_layers=self.num_layers,
                            norm=self.norm, use_first_pool=self.use_first_pool,
                            dtype=self.dtype, name="trunk")(imgs, train)
        out_hw = feats[0].shape[1:3]
        feats = [f if f.shape[1:3] == out_hw
                 else resize_bilinear_align_corners(f, out_hw) for f in feats]
        return jnp.concatenate(feats, axis=-1)

    def pe_channels(self) -> int:
        if self.padding_pe >= 0 and self.image_padding > 0:
            return posenc_dim(2, self.padding_pe, include_input=True)
        return 0
