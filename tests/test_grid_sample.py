"""grid_sample parity vs torch.nn.functional.grid_sample (align_corners=False).

grid_sample semantics drive PSNR parity more than anything else (SURVEY.md §7.3),
so every mode/padding combination is checked bit-near against torch on random
images and coordinates (in-range and far out-of-range).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from diner_tpu.image_ops import grid_sample, exponential_pad

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _torch_grid_sample(img_nhwc, uv, mode, padding_mode):
    """torch reference: img (B,H,W,C)->(B,C,H,W); uv (B,N,2)->(B,N,1,2)."""
    t_img = torch.from_numpy(np.moveaxis(img_nhwc, -1, 1).copy())
    t_uv = torch.from_numpy(uv[:, :, None, :].copy())
    out = F.grid_sample(t_img, t_uv, mode=mode, padding_mode=padding_mode,
                        align_corners=False)
    return np.moveaxis(out.numpy()[:, :, :, 0], 1, -1)  # (B, N, C)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_matches_torch(mode, padding):
    B, H, W, C, N = 3, 13, 17, 5, 200
    img = _rand((B, H, W, C), 0)
    uv = (_rand((B, N, 2), 1) * 1.5).astype(np.float32)  # includes out-of-range

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(uv), mode=mode,
                                  padding_mode=padding))
    ref = _torch_grid_sample(img, uv, mode, padding)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_batchdims_roundtrip():
    img = jnp.asarray(_rand((2, 4, 9, 11, 3), 2))
    uv = jnp.asarray(_rand((2, 4, 50, 2), 3))
    out = grid_sample(img, uv)
    assert out.shape == (2, 4, 50, 3)


def test_exponential_matches_materialized_reference_path():
    """Analytic exponential sampling == pad-then-sample (the reference recipe)."""
    B, H, W, C, N = 2, 12, 10, 1, 300
    pad, dw = 15, 6.0
    img = np.abs(_rand((B, H, W, C), 4)) + 0.1
    uv = (_rand((B, N, 2), 5) * 2.5).astype(np.float32)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(uv), mode="nearest",
                                  padding_mode="exponential",
                                  pad_double_width=dw, pad_size=pad))

    # Reference path: materialize exponential padding, rescale uv, nearest/zeros.
    padded = np.asarray(exponential_pad(jnp.asarray(img), pad, dw))
    scale = np.array([W / (W + 2 * pad), H / (H + 2 * pad)], dtype=np.float32)
    ref = _torch_grid_sample(padded, uv * scale, "nearest", "zeros")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_exponential_pad_values():
    """Border doubles every double_width px; inside untouched."""
    img = jnp.ones((1, 4, 4, 1))
    out = exponential_pad(img, padding=3, double_width=1.0)
    assert out.shape == (1, 10, 10, 1)
    np.testing.assert_allclose(out[0, 3:7, 3:7, 0], 1.0)
    np.testing.assert_allclose(out[0, 2, 5, 0], 1.0)   # dist 0 -> x1
    np.testing.assert_allclose(out[0, 1, 5, 0], 2.0)   # dist 1 -> x2
    np.testing.assert_allclose(out[0, 0, 5, 0], 4.0)   # dist 2 -> x4
    np.testing.assert_allclose(out[0, 0, 0, 0], 4.0)   # corner: chebyshev dist


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_matches_torch_align_corners_true(mode, padding):
    B, H, W, C, N = 2, 11, 15, 4, 150
    img = _rand((B, H, W, C), 7)
    uv = (_rand((B, N, 2), 8) * 1.5).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(uv), mode=mode,
                                  padding_mode=padding, align_corners=True))
    t_img = torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    t_uv = torch.from_numpy(uv[:, :, None, :].copy())
    ref = F.grid_sample(t_img, t_uv, mode=mode, padding_mode=padding,
                        align_corners=True)
    ref = np.moveaxis(ref.numpy()[:, :, :, 0], 1, -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_quad_pack_matches_bilinear_border():
    """grid_sample_quad(pack_quad(img)) == grid_sample(img, bilinear/border)."""
    from diner_tpu.image_ops.grid_sample import pack_quad, grid_sample_quad

    img = jnp.asarray(_rand((2, 9, 12, 6), 10))
    uv = jnp.asarray((_rand((2, 300, 2), 11) * 1.4).astype(np.float32))
    ref = grid_sample(img, uv, mode="bilinear", padding_mode="border")
    got = grid_sample_quad(pack_quad(img), uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
