"""ResNet trunk (BasicBlock family) for pixel-aligned feature extraction.

Behavioral reference: the torchvision resnet34 trunk used by DINER's
SpatialEncoder (src/models/image_encoder.py:50-56,261-279). This is a fresh
flax implementation of the standard architecture, NHWC, with a pluggable norm:
"batch" reproduces the reference exactly (running stats under the
`batch_stats` collection); "group" (GroupNorm) is the TPU-idiomatic default
when training from scratch — it removes cross-device stat syncing entirely
(SURVEY.md §5.8 BatchNorm note).

Only the stages the encoder consumes are exposed: `__call__` returns the
per-stage feature list [conv1, layer1, layer2, layer3, (layer4)].
"""

from __future__ import annotations

from typing import Sequence

from flax import linen as nn

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# BasicBlock counts per stage for the standard family.
STAGE_BLOCKS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}
STAGE_CHANNELS = (64, 128, 256, 512)


class _Norm(nn.Module):
    kind: str  # "batch" | "group"

    @nn.compact
    def __call__(self, x, train: bool):
        if self.kind == "batch":
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5)(x)
        if self.kind == "group":
            return nn.GroupNorm(num_groups=min(32, x.shape[-1]))(x)
        raise ValueError(f"unknown norm {self.kind!r}")


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    norm: str = "batch"
    dtype: object = None  # compute dtype for convs (params stay f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype)(x)
        y = _Norm(self.norm)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=_conv_init, dtype=self.dtype)(y)
        y = _Norm(self.norm)(y, train)
        if self.stride != 1 or x.shape[-1] != self.channels:
            residual = nn.Conv(self.channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=_conv_init,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = _Norm(self.norm, name="downsample_norm")(residual, train)
        return nn.relu(y + residual)


class ResNetTrunk(nn.Module):
    """First `num_layers` stages of a BasicBlock ResNet, NHWC.

    Returns a list of `num_layers` feature maps:
      [conv1+norm+relu (C=64, /2), layer1 (64, /4), layer2 (128, /8),
       layer3 (256, /16), layer4 (512, /32)][:num_layers]
    (strides relative to the input; layer1 is /4 due to the stem maxpool).
    """

    backbone: str = "resnet34"
    num_layers: int = 4
    norm: str = "batch"
    use_first_pool: bool = True
    dtype: object = None  # compute dtype for convs (params stay f32)

    @property
    def latent_size(self) -> int:
        return [0, 64, 128, 256, 512, 1024][self.num_layers]

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence:
        blocks = STAGE_BLOCKS[self.backbone]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                    name="conv1")(x)
        y = _Norm(self.norm, name="norm1")(y, train)
        y = nn.relu(y)
        feats = [y]

        for stage in range(min(self.num_layers - 1, 4)):
            if stage == 0 and self.use_first_pool:
                y = nn.max_pool(y, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)])
            for blk in range(blocks[stage]):
                stride = 2 if (stage > 0 and blk == 0) else 1
                y = BasicBlock(STAGE_CHANNELS[stage], stride=stride,
                               norm=self.norm, dtype=self.dtype,
                               name=f"layer{stage + 1}_block{blk}")(y, train)
            feats.append(y)
        return feats
