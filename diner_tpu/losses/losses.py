"""Training losses: MSE, VGG-perceptual, antibias.

Behavioral reference: src/losses/vggloss.py:48-69 (4 slices weighted
[1/16, 1/8, 1/4, 1], L1 on ImageNet-normalized inputs, detached targets) and
src/losses/antibiasloss.py:4-14 (2^n average-pool then L1) in
malteprinzler/diner. DTU training uses w_vgg=0.1, w_antibias=1.0
(configs/train_dtu.yaml:62-64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diner_tpu.image_ops import avg_pool2d
from diner_tpu.models.pixelnerf import IMAGENET_MEAN, IMAGENET_STD

VGG_SLICE_WEIGHTS = (1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def antibias_loss(pred_img, target_img, n_downsampling: int = 3):
    """L1 between 2^n-fold average-pooled images; (..., H, W, C)."""
    k = 2 ** n_downsampling
    return l1_loss(avg_pool2d(pred_img, k), avg_pool2d(target_img, k))


def vgg_perceptual_loss(vgg_apply, pred_img, target_img):
    """Weighted L1 over VGG19 feature slices.

    vgg_apply: callable (img NHWC in [0,1]) -> list of 4 feature maps
    (a bound Vgg19Features.apply). Target features are stop-gradient'd.
    """
    mean = jnp.asarray(IMAGENET_MEAN, pred_img.dtype)
    std = jnp.asarray(IMAGENET_STD, pred_img.dtype)
    fx = vgg_apply((pred_img - mean) / std)
    fy = vgg_apply((target_img - mean) / std)
    loss = 0.0
    for w, a, b in zip(VGG_SLICE_WEIGHTS, fx, fy):
        loss = loss + w * l1_loss(a, jax.lax.stop_gradient(b))
    return loss
