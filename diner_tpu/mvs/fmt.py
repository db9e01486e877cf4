"""Feature Matching Transformer: linear attention between reference and source
features, propagated down the FPN.

Behavioral reference: deps/TransMVSNet/models/FMT.py + position_encoding.py in
malteprinzler/diner. LinearAttention uses the elu(x)+1 feature map — O(N)
memory, two einsums: KV aggregation and a per-query normalizer. The reference
view gets 4 self-attention layers (outputs kept per layer); each source view
alternates self/cross (x4) attending to the matching ref layer output. Stage-1
transformed features propagate to stages 2/3 via 1x1 dim reduction +
bilinear-upsample-add + 3x3 smoothing (FMT.py:178-225).

TPU note: linear attention is two MXU matmuls over the token axis; it shards
over rays/tokens with a single psum if sequence parallelism is ever needed
(SURVEY.md §5.7).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

_xavier = nn.initializers.xavier_uniform()


def sine_position_encoding_2d(d_model: int, H: int, W: int):
    """(H, W, d_model) sinusoidal 2D encoding (position_encoding.py:23-60,
    temp_bug_fix=True variant; positions are 1-indexed via cumsum-of-ones)."""
    pe = jnp.zeros((d_model, H, W))
    y = jnp.arange(1, H + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, W))
    x = jnp.arange(1, W + 1, dtype=jnp.float32)[None] * jnp.ones((H, 1))
    div = jnp.exp(jnp.arange(0, d_model // 2, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / (d_model // 2)))[:, None, None]
    pe = pe.at[0::4].set(jnp.sin(x[None] * div))
    pe = pe.at[1::4].set(jnp.cos(x[None] * div))
    pe = pe.at[2::4].set(jnp.sin(y[None] * div))
    pe = pe.at[3::4].set(jnp.cos(y[None] * div))
    return jnp.transpose(pe, (1, 2, 0))  # (H, W, C)


def linear_attention(q, k, v, eps: float = 1e-6):
    """q, k: (N, L/S, H, D); v: (N, S, H, M) -> (N, L, H, M); elu+1 kernel."""
    q = nn.elu(q) + 1
    k = nn.elu(k) + 1
    kv = jnp.einsum("nshd,nshm->nhmd", k, v)
    z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", q, k.sum(axis=1)) + eps)
    return jnp.einsum("nlhd,nhmd,nlh->nlhm", q, kv, z)


class AttentionLayer(nn.Module):
    d_model: int
    n_heads: int
    dtype: object = None

    @nn.compact
    def __call__(self, queries, keys, values):
        N, L, _ = queries.shape
        S = keys.shape[1]
        H = self.n_heads
        q = nn.Dense(self.d_model, kernel_init=_xavier, dtype=self.dtype,
                     name="query_projection")(queries).reshape(N, L, H, -1)
        k = nn.Dense(self.d_model, kernel_init=_xavier, dtype=self.dtype,
                     name="key_projection")(keys).reshape(N, S, H, -1)
        v = nn.Dense(self.d_model, kernel_init=_xavier, dtype=self.dtype,
                     name="value_projection")(values).reshape(N, S, H, -1)
        out = linear_attention(q, k, v).reshape(N, L, -1)
        return nn.Dense(self.d_model, kernel_init=_xavier, dtype=self.dtype,
                        name="out_projection")(out)


class EncoderLayer(nn.Module):
    d_model: int
    n_heads: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, source):
        x = x + AttentionLayer(self.d_model, self.n_heads, dtype=self.dtype,
                               name="attention")(x, source, source)
        # LayerNorm reductions stay f32 (flax default upcasts internally)
        y = x = nn.LayerNorm(name="norm1", dtype=self.dtype)(x)
        y = nn.relu(nn.Dense(2 * self.d_model, kernel_init=_xavier,
                             dtype=self.dtype, name="linear1")(y))
        y = nn.Dense(self.d_model, kernel_init=_xavier, dtype=self.dtype,
                     name="linear2")(y)
        return nn.LayerNorm(name="norm2", dtype=self.dtype)(x + y)


class FMT(nn.Module):
    d_model: int = 32
    n_heads: int = 8
    layer_names: tuple = ("self", "cross") * 4
    dtype: object = None

    @nn.compact
    def __call__(self, ref_feature, src_feature=None, feat: str = "ref"):
        """ref: (N, H, W, C) -> list of per-self-layer outputs (NHWC).
        src: ref_list + (N, H, W, C) -> transformed src (NHWC)."""
        layers = [EncoderLayer(self.d_model, self.n_heads, dtype=self.dtype,
                               name=f"layer_{i}")
                  for i in range(len(self.layer_names))]

        if feat == "ref":
            N, H, W, C = ref_feature.shape
            pe = sine_position_encoding_2d(self.d_model, H, W)
            x = (ref_feature + pe).reshape(N, H * W, C)
            outs = []
            for layer, name in zip(layers, self.layer_names):
                if name == "self":
                    x = layer(x, x)
                    outs.append(x.reshape(N, H, W, C))
            return outs

        assert feat == "src"
        ref_list = [r.reshape(r.shape[0], -1, r.shape[-1]) for r in ref_feature]
        N, H, W, C = src_feature.shape
        pe = sine_position_encoding_2d(self.d_model, H, W)
        x = (src_feature + pe).reshape(N, H * W, C)
        for i, (layer, name) in enumerate(zip(layers, self.layer_names)):
            if name == "self":
                x = layer(x, x)
            else:
                x = layer(x, ref_list[i // 2])
        return x.reshape(N, H, W, C)


class FMTWithPathway(nn.Module):
    base_channels: int = 8
    dtype: object = None

    def setup(self):
        self.fmt = FMT(d_model=4 * self.base_channels, dtype=self.dtype)
        self.dim_reduction_1 = nn.Conv(2 * self.base_channels, (1, 1),
                                       use_bias=False, dtype=self.dtype)
        self.dim_reduction_2 = nn.Conv(self.base_channels, (1, 1),
                                       use_bias=False, dtype=self.dtype)
        self.smooth_1 = nn.Conv(2 * self.base_channels, (3, 3),
                                padding=[(1, 1), (1, 1)], use_bias=False,
                                dtype=self.dtype)
        self.smooth_2 = nn.Conv(self.base_channels, (3, 3),
                                padding=[(1, 1), (1, 1)], use_bias=False,
                                dtype=self.dtype)

    def _upsample_add(self, x, y):
        N, H, W, C = y.shape
        # torch F.interpolate bilinear default = align_corners=False
        return jax.image.resize(x, (x.shape[0], H, W, x.shape[-1]),
                                method="linear") + y

    def __call__(self, features):
        """features: list (per view) of {'stage1','stage2','stage3'} NHWC."""
        out = []
        ref_list = None
        for nview_idx, f in enumerate(features):
            f = dict(f)
            if nview_idx == 0:
                ref_list = self.fmt(f["stage1"], feat="ref")
                f["stage1"] = ref_list[-1]
            else:
                f["stage1"] = self.fmt(ref_list, f["stage1"], feat="src")
            f["stage2"] = self.smooth_1(self._upsample_add(
                self.dim_reduction_1(f["stage1"]), f["stage2"]))
            f["stage3"] = self.smooth_2(self._upsample_add(
                self.dim_reduction_2(f["stage2"]), f["stage3"]))
            out.append(f)
        return out
