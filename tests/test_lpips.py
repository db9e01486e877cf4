"""LPIPS-VGG structural round-trip at random weights (no shipped weights).

The real lpips/vgg16 checkpoints can't ship with the repo, so the port +
forward path is exercised the same way the DINER/MVS checkpoint ports are:
random-weight fixtures in the exact torch on-disk layout, ported via
`port_lpips_vgg` / `scripts/port_lpips.py`, compared against an independent
torch implementation of the pip `lpips==0.1.4` LPIPS(net="vgg") forward
(the metric the reference uses, src/evaluation/eval_suite.py:52,75-77):
scaling layer -> VGG16 relu taps 1_2/2_2/3_3/4_3/5_3 -> per-pixel unit
normalization -> squared diff -> 1x1 lin heads -> spatial mean -> sum.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

_VGG16_CONV_IDX = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
_LIN_CH = (64, 128, 256, 512, 512)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def t(x):
    return torch.as_tensor(np.asarray(x), dtype=torch.float32)


def _fixture_state_dicts(seed=0):
    """Random-weight vgg16 `features.*` and lpips `lin*.model.1.weight`
    state dicts in the torchvision / pip-lpips on-disk layouts."""
    rng = np.random.RandomState(seed)
    vgg_sd = {}
    in_ch = 3
    for stage, idxs in enumerate(_VGG16_CONV_IDX):
        out_ch = _LIN_CH[stage]
        for idx in idxs:
            fan_in = in_ch * 9
            vgg_sd[f"features.{idx}.weight"] = (
                rng.randn(out_ch, in_ch, 3, 3) * np.sqrt(2.0 / fan_in)
            ).astype(np.float32)
            vgg_sd[f"features.{idx}.bias"] = (
                rng.randn(out_ch) * 0.01).astype(np.float32)
            in_ch = out_ch
    # lin heads: 1x1 convs, non-negative like the trained release
    lpips_sd = {f"lin{i}.model.1.weight":
                rng.rand(1, ch, 1, 1).astype(np.float32) + 0.01
                for i, ch in enumerate(_LIN_CH)}
    return lpips_sd, vgg_sd


def _lpips_torch(x, y, vgg_sd, lpips_sd):
    """Independent torch forward with pip-lpips semantics. x, y: (B, 3, H, W)
    in [-1, 1]."""
    shift = t(_SHIFT).view(1, 3, 1, 1)
    scale = t(_SCALE).view(1, 3, 1, 1)

    def tower(z):
        feats = []
        z = (z - shift) / scale
        for si, idxs in enumerate(_VGG16_CONV_IDX):
            if si > 0:
                z = F.max_pool2d(z, 2)
            for i in idxs:
                z = F.relu(F.conv2d(z, t(vgg_sd[f"features.{i}.weight"]),
                                    t(vgg_sd[f"features.{i}.bias"]),
                                    padding=1))
            feats.append(z)
        return feats

    fx, fy = tower(x), tower(y)
    total = torch.zeros(x.shape[0])
    for k, (a, b) in enumerate(zip(fx, fy)):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        w = t(lpips_sd[f"lin{k}.model.1.weight"])
        total = total + F.conv2d(d, w)[:, 0].mean(dim=(1, 2))
    return total


def _images(seed=1, B=2, H=36, W=28):
    rng = np.random.RandomState(seed)
    x = (rng.rand(B, H, W, 3) * 2 - 1).astype(np.float32)
    y = np.clip(x + rng.randn(B, H, W, 3).astype(np.float32) * 0.1, -1, 1)
    return x, y


def test_lpips_port_matches_torch_forward():
    from diner_tpu.nn.lpips import LpipsVgg, port_lpips_vgg

    lpips_sd, vgg_sd = _fixture_state_dicts()
    variables = port_lpips_vgg(lpips_sd, vgg_sd)
    x, y = _images()

    ours = np.asarray(LpipsVgg().apply(variables, jnp.asarray(x),
                                       jnp.asarray(y)))
    with torch.no_grad():
        theirs = _lpips_torch(t(np.moveaxis(x, -1, 1)),
                              t(np.moveaxis(y, -1, 1)),
                              vgg_sd, lpips_sd).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
    # metric sanity at ported weights
    same = np.asarray(LpipsVgg().apply(variables, jnp.asarray(x),
                                       jnp.asarray(x)))
    np.testing.assert_allclose(same, 0.0, atol=1e-6)
    assert (ours > 0).all()


def test_lpips_port_handles_lins_key_layout():
    """Newer pip-lpips checkpoints use 'lins.{i}.model.1.weight'."""
    from diner_tpu.nn.lpips import LpipsVgg, port_lpips_vgg

    lpips_sd, vgg_sd = _fixture_state_dicts()
    renamed = {f"lins.{k[3]}.model.1.weight": v for k, v in lpips_sd.items()}
    v1 = port_lpips_vgg(lpips_sd, vgg_sd)
    v2 = port_lpips_vgg(renamed, vgg_sd)
    x, y = _images(seed=2)
    a = np.asarray(LpipsVgg().apply(v1, jnp.asarray(x), jnp.asarray(y)))
    b = np.asarray(LpipsVgg().apply(v2, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(a, b)


def test_port_lpips_script_end_to_end(tmp_path):
    """scripts/port_lpips.py on .pth fixtures: shape validation, sha256
    provenance, npz round-trip, and make_lpips_fn agreement with the
    in-memory port."""
    import sys

    sys.path.insert(0, "scripts")
    import port_lpips

    from diner_tpu.nn.lpips import (LpipsVgg, load_lpips_npz, make_lpips_fn,
                                    port_lpips_vgg)

    lpips_sd, vgg_sd = _fixture_state_dicts(seed=3)
    lp = tmp_path / "vgg.pth"
    vp = tmp_path / "vgg16.pth"
    out = tmp_path / "lpips_vgg.npz"
    torch.save({k: t(v) for k, v in lpips_sd.items()}, lp)
    torch.save({k: t(v) for k, v in vgg_sd.items()}, vp)
    port_lpips.main(["--lpips-ckpt", str(lp), "--vgg16", str(vp),
                     "--out", str(out)])

    loaded = load_lpips_npz(out)
    assert "_source_sha256" in loaded
    fn = make_lpips_fn(loaded)

    x, y = _images(seed=4, B=1)
    direct = float(LpipsVgg().apply(port_lpips_vgg(lpips_sd, vgg_sd),
                                    jnp.asarray(x), jnp.asarray(y))[0])
    via_npz = fn((x[0] + 1) / 2, (y[0] + 1) / 2)  # fn takes [0, 1] images
    np.testing.assert_allclose(via_npz, direct, rtol=1e-5, atol=1e-6)


def test_port_lpips_script_rejects_bad_shapes(tmp_path):
    import sys

    sys.path.insert(0, "scripts")
    import port_lpips

    lpips_sd, vgg_sd = _fixture_state_dicts(seed=5)
    vgg_sd["features.10.weight"] = vgg_sd["features.10.weight"][:, :64]
    lp = tmp_path / "vgg.pth"
    vp = tmp_path / "vgg16.pth"
    torch.save({k: t(v) for k, v in lpips_sd.items()}, lp)
    torch.save({k: t(v) for k, v in vgg_sd.items()}, vp)
    with pytest.raises(AssertionError):
        port_lpips.main(["--lpips-ckpt", str(lp), "--vgg16", str(vp),
                         "--out", str(tmp_path / "o.npz")])
