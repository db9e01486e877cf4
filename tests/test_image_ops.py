"""Resize / pooling / masked-downsample parity tests vs torch."""

import numpy as np
import pytest
import jax.numpy as jnp

from diner_tpu.image_ops import (
    resize_bilinear_align_corners, avg_pool2d, masked_downsample, colormap,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.mark.parametrize("out_hw", [(20, 28), (7, 5), (10, 14)])
def test_resize_matches_torch_align_corners(out_hw):
    img = _rand((2, 10, 14, 3), 0)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(img), out_hw))
    t = torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    ref = F.interpolate(t, out_hw, mode="bilinear", align_corners=True)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_avg_pool_matches_torch():
    img = _rand((2, 16, 24, 3), 1)
    ours = np.asarray(avg_pool2d(jnp.asarray(img), 8))
    t = torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    ref = np.moveaxis(F.avg_pool2d(t, 8, 8).numpy(), 1, -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_masked_downsample_no_bleed():
    H = W = 8
    x = np.zeros((1, H, W, 3), np.float32)
    m = np.zeros((1, H, W, 1), np.float32)
    x[0, :4, :4] = 1.0  # fg block is white
    m[0, :4, :4] = 1.0
    x[0, 4:, 4:] = 5.0  # bg junk that must not bleed in
    out = np.asarray(masked_downsample(jnp.asarray(x), jnp.asarray(m), 4, bg_color=0.25))
    # fg output pixel: average over fg-only -> exactly 1.0
    np.testing.assert_allclose(out[0, 0, 0], 1.0)
    # pure-bg output pixel -> bg_color
    np.testing.assert_allclose(out[0, 1, 1], 0.25)


def test_colormap_shape_and_range():
    x = _rand((2, 6, 7, 1), 2)
    rgb = colormap(x)
    assert rgb.shape == (2, 6, 7, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
