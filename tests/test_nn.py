"""NN layer tests: posenc golden values, ResnetFC init semantics, trunk shapes,
spatial encoder border-PE, torch weight-port layout."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diner_tpu.nn import (
    posenc, posenc_dim, ResnetFC, ResNetTrunk, SpatialEncoder, Vgg19Features,
)
from diner_tpu.nn.torch_port import port_resnet_trunk, port_vgg19_features


def test_posenc_golden():
    """Layout: [x, sin(f0 x)_dims, cos(f0 x)_dims, sin(f1 x)_dims, ...]."""
    x = np.array([[0.3, -0.7]], np.float32)
    F, ff = 3, 2.0
    out = np.asarray(posenc(jnp.asarray(x), num_freqs=F, freq_factor=ff))
    assert out.shape == (1, posenc_dim(2, F))
    expected = [0.3, -0.7]
    for k in range(F):
        f = ff * 2 ** k
        expected += [np.sin(f * 0.3), np.sin(f * -0.7)]
        expected += [np.cos(f * 0.3), np.cos(f * -0.7)]
    np.testing.assert_allclose(out[0], expected, rtol=1e-5, atol=1e-6)


def test_posenc_batch_shapes():
    x = jnp.zeros((2, 4, 5, 3))
    assert posenc(x, 6, 6.28).shape == (2, 4, 5, 39)
    assert posenc(jnp.zeros((7, 1)), 6, 6.28).shape == (7, 13)


def test_resnetfc_identity_blocks_at_init():
    """fc_1 zero-init => every block is identity at init, so with d_latent=0
    the net is exactly lin_out(relu(lin_in(x)))."""
    mlp = ResnetFC(d_in=5, d_out=4, n_blocks=5, d_hidden=16, combine_layer=1000)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 5).astype(np.float32))
    params = mlp.init(jax.random.PRNGKey(0), x, combine_axis=0)
    out = mlp.apply(params, x, combine_axis=0)

    w_in = params["params"]["lin_in"]["kernel"]
    b_in = params["params"]["lin_in"]["bias"]
    w_out = params["params"]["lin_out"]["kernel"]
    b_out = params["params"]["lin_out"]["bias"]
    expected = jnp.maximum(x @ w_in + b_in, 0) @ w_out + b_out
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_resnetfc_combine_and_latent_injection():
    """At init: out = lin_out(relu(mean_views(lin_in(x) + sum_{b<3} lin_z_b(z))))."""
    d_lat, d_in, V, B = 8, 5, 4, 6
    mlp = ResnetFC(d_in=d_in, d_out=4, n_blocks=5, d_latent=d_lat,
                   d_hidden=16, combine_layer=3)
    rng = np.random.RandomState(1)
    zx = jnp.asarray(rng.randn(V, B, d_lat + d_in).astype(np.float32))
    params = mlp.init(jax.random.PRNGKey(1), zx, combine_axis=0)
    out = mlp.apply(params, zx, combine_axis=0)
    assert out.shape == (B, 4)

    p = params["params"]
    z, x = zx[..., :d_lat], zx[..., d_lat:]
    h = x @ p["lin_in"]["kernel"] + p["lin_in"]["bias"]
    for b in range(3):
        h = h + z @ p[f"lin_z_{b}"]["kernel"] + p[f"lin_z_{b}"]["bias"]
    h = jnp.mean(h, axis=0)
    expected = jnp.maximum(h, 0) @ p["lin_out"]["kernel"] + p["lin_out"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("norm", ["batch", "group"])
def test_trunk_shapes(norm):
    trunk = ResNetTrunk(backbone="resnet34", num_layers=4, norm=norm)
    x = jnp.zeros((1, 64, 80, 3))
    variables = trunk.init(jax.random.PRNGKey(0), x)
    feats = trunk.apply(variables, x)
    assert [f.shape for f in feats] == [
        (1, 32, 40, 64), (1, 16, 20, 64), (1, 8, 10, 128), (1, 4, 5, 256)]


def test_spatial_encoder_latent_shape_and_border_pe():
    enc = SpatialEncoder(num_layers=4, norm="group", image_padding=8, padding_pe=4)
    x = jnp.zeros((2, 32, 40, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    latent = enc.apply(variables, x)
    # padded input 48x56 -> stem /2 -> 24x28; latent 512
    assert latent.shape == (2, 24, 28, 512)
    assert enc.feature_padding == 4
    pe = enc.border_pe(32, 40)
    assert pe.shape == (48, 56, posenc_dim(2, 4))
    np.testing.assert_allclose(np.asarray(pe[8:-8, 8:-8]), 0.0)  # zero inside
    assert float(jnp.abs(pe[:8]).max()) > 0  # nonzero in border


def test_vgg_feature_shapes():
    vgg = Vgg19Features()
    x = jnp.zeros((1, 64, 64, 3))
    variables = vgg.init(jax.random.PRNGKey(0), x)
    feats = vgg.apply(variables, x)
    assert [f.shape for f in feats] == [
        (1, 64, 64, 64), (1, 32, 32, 128), (1, 16, 16, 256), (1, 8, 8, 512)]


def _fake_resnet34_sd(rng):
    """Random state_dict with torchvision resnet34 key layout/shapes."""
    sd = {}
    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05
    def bn(name, c):
        sd[f"{name}.weight"] = np.abs(rng.randn(c).astype(np.float32)) + 0.5
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = np.abs(rng.randn(c).astype(np.float32)) + 1.0
    conv("conv1", 64, 3, 7); bn("bn1", 64)
    blocks = {1: (3, 64, 64), 2: (4, 128, 64), 3: (6, 256, 128)}
    for stage, (n, c, cin_first) in blocks.items():
        for b in range(n):
            cin = cin_first if b == 0 else c
            t = f"layer{stage}.{b}"
            conv(f"{t}.conv1", c, cin, 3); bn(f"{t}.bn1", c)
            conv(f"{t}.conv2", c, c, 3); bn(f"{t}.bn2", c)
            if cin != c:
                conv(f"{t}.downsample.0", c, cin, 1); bn(f"{t}.downsample.1", c)
    return sd


def test_port_resnet_trunk_applies():
    rng = np.random.RandomState(0)
    sd = _fake_resnet34_sd(rng)
    variables = port_resnet_trunk(sd, num_layers=4, extra_in_channels=2)
    trunk = ResNetTrunk(num_layers=4, norm="batch")
    x = jnp.asarray(rng.randn(1, 32, 32, 5).astype(np.float32))
    feats = trunk.apply({"params": variables["params"],
                         "batch_stats": variables["batch_stats"]}, x)
    assert feats[-1].shape == (1, 2, 2, 256)
    # Structure matches a fresh init exactly.
    ref = trunk.init(jax.random.PRNGKey(0), x)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape,
                              {"params": variables["params"],
                               "batch_stats": variables["batch_stats"]})
    assert ref_shapes == got_shapes


def test_port_conv_direction_matches_torch():
    """A single ported conv must equal torch's conv2d on the same weights."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(3)
    w = rng.randn(8, 3, 3, 3).astype(np.float32) * 0.1  # OIHW
    x = rng.randn(1, 3, 10, 12).astype(np.float32)      # NCHW
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=2,
                   padding=1).numpy()
    from flax import linen as nn
    conv = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                   use_bias=False)
    out = conv.apply({"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}},
                     jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref,
                               rtol=1e-4, atol=1e-5)


def test_port_vgg19():
    rng = np.random.RandomState(1)
    sd = {}
    shapes = {0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128),
              10: (256, 128), 12: (256, 256), 14: (256, 256), 16: (256, 256),
              19: (512, 256)}
    for idx, (o, i) in shapes.items():
        sd[f"features.{idx}.weight"] = rng.randn(o, i, 3, 3).astype(np.float32) * 0.02
        sd[f"features.{idx}.bias"] = np.zeros(o, np.float32)
    variables = port_vgg19_features(sd)
    vgg = Vgg19Features()
    feats = vgg.apply(variables, jnp.zeros((1, 32, 32, 3)))
    assert feats[-1].shape == (1, 4, 4, 512)
