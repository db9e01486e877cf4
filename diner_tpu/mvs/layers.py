"""Shared conv blocks for the MVS nets (NHWC / NDHWC, flax).

Behavioral reference: deps/TransMVSNet/models/module.py:24-110 (Conv2d/Conv3d/
Deconv3d = conv + BN + ReLU) and dcn.py:43-80 (DCN offset+mask branch,
zero-init so the op starts as a plain masked conv at weight 0.5).

SyncBN note: the reference converts BN to NCCL SyncBatchNorm under DDP
(deps/TransMVSNet/train.py:430-435). Here no special layer is needed — the
batch axis is sharded over the mesh and BatchNorm's reductions are over the
full logical array, so GSPMD inserts the cross-device collectives itself:
flax BatchNorm under jit + batch sharding IS synchronized batch norm.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from diner_tpu.mvs.ops import deform_conv2d, deform_conv2d_window

_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ConvBnRelu(nn.Module):
    ch: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        x = nn.Conv(self.ch, (k, k), strides=(self.stride, self.stride),
                    padding=[( (k - 1) // 2,) * 2] * 2, use_bias=False,
                    kernel_init=_kaiming, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class Conv3dBnRelu(nn.Module):
    ch: int
    kernel: int = 3
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        p = (k - 1) // 2
        x = nn.Conv(self.ch, (k, k, k), strides=(self.stride,) * 3,
                    padding=[(p, p)] * 3, use_bias=False,
                    kernel_init=_kaiming, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class Deconv3dBnRelu(nn.Module):
    """Exactly torch ConvTranspose3d(k=3, stride=2, padding=1,
    output_padding=1): transpose_kernel=True with (1, 2) padding reproduces it
    bit-near (validated against torch) — required for checkpoint ports."""

    ch: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.ch, (3, 3, 3), strides=(2, 2, 2),
                             padding=[(1, 2)] * 3, use_bias=False,
                             transpose_kernel=True,
                             kernel_init=_kaiming, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class DCNLayer(nn.Module):
    """Deformable conv v2 with learned offset+mask branch (zero-init).

    impl: "gather" = exact reference semantics (quad-packed row gathers);
    "window" = gather-free stencil (`deform_conv2d_window`), exact while
    |offset| < 1 px for the 3x3 kernel — an opt-in throughput knob on the
    issue-rate-bound gather unit. Parameters are identical either way, so
    checkpoints are interchangeable between the two implementations.
    """

    ch: int
    kernel: int = 3
    dtype: object = None
    impl: str = "gather"

    @nn.compact
    def __call__(self, x):
        if self.impl not in ("gather", "window"):
            raise ValueError(
                f"DCNLayer impl must be 'gather' or 'window', got "
                f"{self.impl!r}")
        k = self.kernel
        taps = k * k
        om = nn.Conv(3 * taps, (k, k), padding=[((k - 1) // 2,) * 2] * 2,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     name="conv_offset_mask", dtype=self.dtype)(x)
        o1, o2, m = jnp.split(om, 3, axis=-1)
        # offsets are SAMPLE COORDINATES: keep them f32 (bf16 would quantize
        # positions to ~2px at 640-wide maps)
        offset = jnp.stack([o1, o2], axis=-1).astype(jnp.float32) \
            .reshape(*x.shape[:3], 2 * taps)
        mask = nn.sigmoid(m)
        weight = self.param("weight", _kaiming, (k, k, x.shape[-1], self.ch))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        dt = self.dtype or jnp.float32
        # window-exactness diagnostic: the window impl is exact only while
        # every tap displacement |k + offset| < margin - 1e-3 (ops.py). Sow
        # the per-layer max so callers can audit trained/loaded weights on a
        # real batch (window_offset_stats); a no-op (dead code under jit)
        # unless the caller makes the "diagnostics" collection mutable.
        pad = (k - 1) // 2
        kyx = jnp.stack(jnp.meshgrid(
            jnp.arange(k, dtype=jnp.float32) - pad,
            jnp.arange(k, dtype=jnp.float32) - pad,
            indexing="ij"), axis=-1).reshape(taps, 2)
        disp = jnp.abs(offset.reshape(*x.shape[:3], taps, 2) + kyx)
        self.sow("diagnostics", "window_disp_max", jnp.max(disp),
                 reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0.0))
        fn = deform_conv2d_window if self.impl == "window" else deform_conv2d
        return fn(x.astype(dt), offset, mask.astype(dt),
                  weight.astype(dt), bias.astype(dt))
