"""FeatureNet: 3-scale FPN with deformable-conv heads ("ARF").

Behavioral reference: deps/TransMVSNet/models/module.py:343-421 (FeatureNet,
base_channels=8): shared conv trunk (/1, /2, /4), top-down pathway with
nearest-upsample + 1x1 lateral adds, and per-stage output heads of
[1x1 or 3x3 conv] + (DCN + BN + ReLU) x2 + DCN. Stage channels [32, 16, 8]
at scales /4, /2, /1.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from diner_tpu.mvs.layers import ConvBnRelu, DCNLayer


class _DCNHead(nn.Module):
    mid: int
    out: int
    first_kernel: int = 3
    dtype: object = None
    dcn_impl: str = "gather"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnRelu(self.mid, kernel=self.first_kernel,
                       dtype=self.dtype)(x, train)
        x = DCNLayer(self.mid, dtype=self.dtype, impl=self.dcn_impl)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = DCNLayer(self.mid, dtype=self.dtype, impl=self.dcn_impl)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        return DCNLayer(self.out, dtype=self.dtype, impl=self.dcn_impl)(x)


def _upsample_nearest2(x):
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, 2 * H, 2 * W, C), method="nearest")


class FeatureNet(nn.Module):
    base_channels: int = 8
    dtype: object = None
    dcn_impl: str = "gather"  # see DCNLayer.impl

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, H, W, 3) -> dict stage1 (/4, 4b ch), stage2 (/2, 2b),
        stage3 (/1, b)."""
        b = self.base_channels
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        c0 = ConvBnRelu(b, dtype=dt)(x, train)
        c0 = ConvBnRelu(b, dtype=dt)(c0, train)
        c1 = ConvBnRelu(2 * b, kernel=5, stride=2, dtype=dt)(c0, train)
        c1 = ConvBnRelu(2 * b, dtype=dt)(c1, train)
        c1 = ConvBnRelu(2 * b, dtype=dt)(c1, train)
        c2 = ConvBnRelu(4 * b, kernel=5, stride=2, dtype=dt)(c1, train)
        c2 = ConvBnRelu(4 * b, dtype=dt)(c2, train)
        c2 = ConvBnRelu(4 * b, dtype=dt)(c2, train)

        out = {}
        intra = c2
        out["stage1"] = _DCNHead(4 * b, 4 * b, first_kernel=1, dtype=dt,
                                 dcn_impl=self.dcn_impl,
                                 name="out1")(intra, train)
        intra = _upsample_nearest2(intra) + nn.Conv(4 * b, (1, 1), dtype=dt,
                                                    name="inner1")(c1)
        out["stage2"] = _DCNHead(4 * b, 2 * b, dtype=dt,
                                 dcn_impl=self.dcn_impl,
                                 name="out2")(intra, train)
        intra = _upsample_nearest2(intra) + nn.Conv(4 * b, (1, 1), dtype=dt,
                                                    name="inner2")(c0)
        out["stage3"] = _DCNHead(4 * b, b, dtype=dt,
                                 dcn_impl=self.dcn_impl,
                                 name="out3")(intra, train)
        return out
