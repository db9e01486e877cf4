"""MVS training losses.

Behavioral reference: deps/TransMVSNet/models/module.py:480-553 in
malteprinzler/diner: per-stage masked cross-entropy between the prob volume
and the one-hot ground-truth depth bin (weight 2.0), summed with per-stage
`dlossw` weights; smooth-L1 depth error reported alongside.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp


def entropy_loss(prob_volume, depth_gt, mask, depth_values):
    """Masked CE vs one-hot GT bin (module.py:490-526).

    prob_volume: (B, D, H, W) softmaxed; depth_gt/mask: (B, H, W);
    depth_values: (B, D, H, W). Returns (loss scalar, wta_depth (B, H, W)).
    """
    mask = mask.astype(jnp.float32)
    valid = jnp.sum(mask, axis=(1, 2)) + 1e-6

    gt_idx = jnp.argmin(jnp.abs(depth_values - depth_gt[:, None]), axis=1)
    gt_idx = jnp.round(mask * gt_idx).astype(jnp.int32)  # (B, H, W)

    # CE against the one-hot bin == -log p at the gt index
    p_at_gt = jnp.take_along_axis(prob_volume, gt_idx[:, None], axis=1)[:, 0]
    ce = -jnp.log(p_at_gt + 1e-6)
    masked_ce = jnp.sum(ce * mask, axis=(1, 2)) / valid
    loss = jnp.mean(masked_ce)

    wta_idx = jnp.argmax(prob_volume, axis=1, keepdims=True)
    wta = jnp.take_along_axis(depth_values, wta_idx, axis=1)[:, 0]
    return loss, wta


def smooth_l1(pred, gt, mask):
    mask = mask.astype(jnp.float32)
    diff = jnp.abs(pred - gt)
    val = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    return jnp.sum(val * mask) / (jnp.sum(mask) + 1e-6)


def mvs_loss(outputs: Dict, depth_gt_ms: Dict, mask_ms: Dict,
             dlossw: Sequence[float] = (0.5, 1.0, 2.0),
             entropy_weight: float = 2.0):
    """Total cascade loss (module.py:529-553).

    outputs: TransMVSNet outputs; depth_gt_ms/mask_ms: dicts stage1..3 of
    (B, h, w) per-stage GT pyramids. Returns (total, aux dict).
    """
    total = 0.0
    aux = {}
    depth_loss = 0.0
    for key in [k for k in outputs if k.startswith("stage")]:
        st = outputs[key]
        mask = mask_ms[key] > 0.5
        entro, wta = entropy_loss(st["prob_volume"], depth_gt_ms[key], mask,
                                  st["depth_values"])
        entro = entro * entropy_weight
        depth_loss = smooth_l1(wta, depth_gt_ms[key], mask)
        idx = int(key.replace("stage", "")) - 1
        total = total + dlossw[idx] * entro
        aux[f"{key}_entropy"] = entro
        aux[f"{key}_depth_l1"] = depth_loss
    aux["depth_loss"] = depth_loss
    return total, aux


def mvs_loss_focal(outputs: Dict, depth_gt_ms: Dict, mask_ms: Dict,
                   depth_interval, dlossw: Sequence[float] = (0.5, 1.0, 2.0)):
    """BlendedMVS variant (module.py:556-587): same cascade entropy loss plus
    normalized end-point-error metrics (epe, <1px, <3px fractions)."""
    total, aux = mvs_loss(outputs, depth_gt_ms, mask_ms, dlossw)
    last = f"stage{sum(1 for k in outputs if k.startswith('stage'))}"
    mask = mask_ms[last] > 0.5
    err = jnp.abs(depth_gt_ms[last] - outputs[last]["depth"])
    scaled = err / (depth_interval * 192.0 / 128.0)
    denom = jnp.sum(mask) + 1e-6
    aux["epe"] = jnp.sum(jnp.where(mask, scaled, 0.0)) / denom
    aux["less1"] = jnp.sum(jnp.where(mask, (scaled < 1.0).astype(jnp.float32),
                                     0.0)) / denom
    aux["less3"] = jnp.sum(jnp.where(mask, (scaled < 3.0).astype(jnp.float32),
                                     0.0)) / denom
    return total, aux
