"""LPIPS (VGG16 backbone) in flax.

Behavioral reference: pip lpips==0.1.4 `LPIPS(net="vgg")` as used by
src/evaluation/eval_suite.py:52,75-77 in malteprinzler/diner: a VGG16 feature
tower tapped after relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, inputs in [-1, 1]
shifted/scaled by fixed constants, features unit-normalized per pixel, squared
differences reduced by learned 1x1 "lin" heads, spatially averaged, summed
over the 5 taps.

Weights (VGG16 convs + lin heads) must be ported from the pip package's
checkpoint via `port_lpips_vgg`; without them the metric is meaningless —
`LpipsVgg.available` gates usage.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

# lpips.ScalingLayer constants (shift/scale applied to [-1, 1] inputs).
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

_VGG16_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_LIN_CH = (64, 128, 256, 512, 512)


class Vgg16Tower(nn.Module):
    @nn.compact
    def __call__(self, x):
        outs = []
        for si, (ch, reps) in enumerate(_VGG16_STAGES):
            if si > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci in range(reps):
                x = nn.relu(nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                                    name=f"conv{si + 1}_{ci + 1}")(x))
            outs.append(x)
        return outs


class LpipsVgg(nn.Module):
    @nn.compact
    def __call__(self, x, y):
        """x, y: (B, H, W, 3) in [-1, 1]. Returns (B,) distances."""
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        tower = Vgg16Tower(name="net")
        fx = tower((x - shift) / scale)
        fy = tower((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (_LIN_CH[i],))
            # lpips lin layers are 1x1 convs with non-negative weights
            d = jnp.sum(d * jnp.abs(w), axis=-1)
            total = total + jnp.mean(d, axis=(1, 2))
        return total


def port_lpips_vgg(lpips_sd, vgg_sd):
    """Build LpipsVgg params from the pip lpips state_dict (lin heads, keys
    like 'lin0.model.1.weight') + torchvision vgg16 features state_dict."""
    from diner_tpu.nn.torch_port import _conv

    vgg_idx = {  # torchvision vgg16.features conv index -> our name
        0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
        10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
        17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
        24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
    }
    net = {}
    for idx, name in vgg_idx.items():
        net[name] = {"kernel": _conv(vgg_sd[f"features.{idx}.weight"]),
                     "bias": vgg_sd[f"features.{idx}.bias"]}
    params = {"net": net}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lpips_sd:
                params[f"lin{i}"] = np.asarray(lpips_sd[key]).reshape(-1)
                break
    return {"params": params}


def save_lpips_npz(variables, path):
    """Flatten ported LpipsVgg variables into a single .npz."""
    import jax

    flat = {"/".join(map(str, k)): np.asarray(v) for k, v in
            jax.tree_util.tree_flatten_with_path(
                variables, is_leaf=lambda x: isinstance(x, np.ndarray))[0]}
    flat = {k.replace("[", "").replace("]", "").replace("'", ""): v
            for k, v in flat.items()}
    np.savez(path, **flat)


def load_lpips_npz(path):
    """Load an .npz written by save_lpips_npz back into a variables tree."""
    data = np.load(path)
    tree = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return tree


def make_lpips_fn(variables):
    """(pred (H,W,3) in [0,1], gt) -> float LPIPS, matching the reference's
    usage (eval_suite.py:75-77: images scaled to [-1, 1])."""
    import jax

    model = LpipsVgg()
    variables = {"params": variables["params"]}  # drop metadata collections

    @jax.jit
    def dist(x, y):
        return model.apply(variables, x[None] * 2.0 - 1.0,
                           y[None] * 2.0 - 1.0)[0]

    return lambda pred, gt: float(dist(jnp.asarray(pred), jnp.asarray(gt)))
