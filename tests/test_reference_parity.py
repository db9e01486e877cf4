"""Whole-model numeric parity: ported flax DINER vs an independent torch
implementation of the reference forward pass, at random weights.

This is the strongest parity evidence available without released checkpoints:
the same Lightning-style state_dict drives both stacks; encode / field /
composite outputs must agree to float-accumulation tolerance. Any semantic
drift in the port (conv direction, BN stats, PE ordering, uv convention,
combine placement, compositing math) fails loudly.

Reference: python_scripts/create_prediction_folder.py:30-49 is the torch-side
generator this emulates; src/models/pixelnerf.py:55-145 the forward contract.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_model_port import _fake_lightning_sd  # noqa: E402
from torch_reference import TorchReferenceStack, t  # noqa: E402

from diner_tpu.models import PixelNeRF  # noqa: E402
from diner_tpu.models.torch_port import port_diner_checkpoint  # noqa: E402

SB, NV, H, W = 1, 2, 48, 48
PAD = 16


def _scene():
    """Random but geometrically sane scene: two cameras looking at a smooth
    surface around z ~ 0.7."""
    rng = np.random.RandomState(3)
    images = rng.rand(SB, NV, H, W, 3).astype(np.float32)
    yy, xx = np.mgrid[:H, :W] / H
    base = 0.65 + 0.05 * np.sin(3 * xx) * np.cos(2 * yy)
    depths = np.stack([base + 0.02 * v for v in range(NV)])[None]
    depths = depths[..., None].astype(np.float32)
    stds = (0.02 + 0.01 * rng.rand(SB, NV, H, W, 1)).astype(np.float32)

    K = np.zeros((SB, NV, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 40.0
    K[..., 0, 2] = W / 2
    K[..., 1, 2] = H / 2
    K[..., 2, 2] = 1.0
    ext = np.broadcast_to(np.eye(4, dtype=np.float32), (SB, NV, 4, 4)).copy()
    # second view: small rotation about y + x-shift
    a = 0.08
    ext[0, 1, :3, :3] = np.array([[np.cos(a), 0, np.sin(a)],
                                  [0, 1, 0],
                                  [-np.sin(a), 0, np.cos(a)]], np.float32)
    ext[0, 1, 0, 3] = 0.05
    return images, depths, stds, ext, K


@pytest.fixture(scope="module")
def stacks():
    sd = _fake_lightning_sd()
    ref = TorchReferenceStack(sd, num_layers=4, image_padding=PAD,
                              padding_pe=4, num_freqs=6, freq_factor=6.28,
                              n_blocks=5, combine_layer=3)
    images, depths, stds, ext, K = _scene()
    ref.encode(t(np.moveaxis(images, -1, 2)), t(np.moveaxis(depths, -1, 2)),
               t(np.moveaxis(stds, -1, 2)), t(ext), t(K))

    model = PixelNeRF(encoder_layers=4, encoder_norm="batch",
                      image_padding=PAD, padding_pe=4, n_blocks=5,
                      d_hidden=512, combine_layer=3, sigma_activation="relu")
    ported, extras = port_diner_checkpoint(sd)
    variables = {"params": ported["params"],
                 "batch_stats": ported["batch_stats"]}
    enc = model.apply(variables, jnp.asarray(images), jnp.asarray(depths),
                      jnp.asarray(stds), jnp.asarray(ext), jnp.asarray(K),
                      method="encode")
    return ref, model, variables, enc


def _assert_close_quantile(a, b, frac=0.995, tol=1e-4, max_tol=1e-2):
    """Parity assertion robust to ReLU-boundary chaos at random weights: a
    float-noise-level difference that crosses a ReLU threshold flips one unit
    and amplifies locally through the following layers, so a tiny FRACTION of
    elements may differ visibly even for a perfect port. A real semantic bug
    (wrong conv direction / BN stats / PE ordering / uv convention) mismatches
    globally and still fails these bounds."""
    d = np.abs(a - b)
    ok = d <= tol * (1.0 + np.abs(b))
    assert ok.mean() >= frac, f"only {ok.mean():.4f} within tol"
    scale = 1.0 + np.abs(b).max()
    assert d.max() <= max_tol * scale, f"max diff {d.max():.4g} (scale {scale:.3g})"


def test_encode_latent_parity(stacks):
    ref, model, variables, enc = stacks
    ours = np.moveaxis(np.asarray(enc.latent), -1, 2)  # NHWC -> NCHW
    theirs = ref.latent.numpy()
    assert ours.shape == theirs.shape
    # shallow stages pin conv/BN/pad/PE semantics exactly; the deep stage
    # (layer3, 6 blocks of random weights) gets the chaos-robust bound
    np.testing.assert_allclose(ours[:, :, :256], theirs[:, :, :256],
                               rtol=1e-4, atol=5e-4)
    _assert_close_quantile(ours[:, :, 256:], theirs[:, :, 256:],
                           frac=0.995, tol=1e-3, max_tol=2e-2)


def test_encode_normals_parity(stacks):
    ref, model, variables, enc = stacks
    ours = np.moveaxis(np.asarray(enc.normals), -1, 2)
    np.testing.assert_allclose(ours, ref.normals.numpy(), rtol=1e-4, atol=1e-5)


def _query_points(n=200):
    rng = np.random.RandomState(5)
    xyz = np.stack([(rng.rand(n) - 0.5) * 0.6, (rng.rand(n) - 0.5) * 0.6,
                    0.55 + 0.3 * rng.rand(n)], axis=-1).astype(np.float32)
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return xyz[None], dirs[None]


def test_field_parity(stacks):
    ref, model, variables, enc = stacks
    xyz, dirs = _query_points()
    theirs = ref.field(t(xyz), t(dirs)).numpy()
    ours = np.asarray(model.apply(variables, enc, jnp.asarray(xyz),
                                  jnp.asarray(dirs), method="field"))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_composite_parity(stacks):
    """One full (small) image through both renderers on identical z samples."""
    from diner_tpu.geometry import gen_rays
    from diner_tpu.renderer.composite import composite

    ref, model, variables, enc = stacks
    images, depths, stds, ext, K = _scene()
    h = w = 12
    Ksmall = K[:, 0].copy()
    Ksmall[..., 0, 2] = w / 2
    Ksmall[..., 1, 2] = h / 2
    rays = gen_rays(jnp.asarray(ext[:, 0]), jnp.asarray(Ksmall), w, h,
                    jnp.full((SB,), 0.4), jnp.full((SB,), 1.2))
    rays = rays.reshape(SB, h * w, 8)
    z = jnp.broadcast_to(jnp.linspace(0.45, 1.1, 16, dtype=jnp.float32),
                         (SB, h * w, 16))

    weights, rgb, depth = composite(
        lambda p, d: model.apply(variables, enc, p, d, method="field"),
        rays, z, white_bkgd=False)
    w_t, rgb_t, depth_t = ref.composite(t(np.asarray(rays)), t(np.asarray(z)))

    _assert_close_quantile(np.asarray(rgb), rgb_t.numpy(),
                           frac=0.995, tol=1e-4, max_tol=2e-3)
    _assert_close_quantile(np.asarray(depth), depth_t.numpy(),
                           frac=0.995, tol=1e-4, max_tol=2e-3)
    _assert_close_quantile(np.asarray(weights), w_t.numpy(),
                           frac=0.995, tol=1e-4, max_tol=2e-3)


# ---- flagship shape: 256x320 / padding 64 / 4 views / BN + relu-sigma ----
# (the reference's actual DTU eval configuration,
#  python_scripts/create_prediction_folder.py:30-49 + configs/train_dtu.yaml)

FH, FW, FNV, FPAD = 256, 320, 4, 64


def _flagship_scene():
    rng = np.random.RandomState(7)
    images = rng.rand(SB, FNV, FH, FW, 3).astype(np.float32)
    yy, xx = np.mgrid[:FH, :FW] / FH
    base = 0.65 + 0.05 * np.sin(3 * xx) * np.cos(2 * yy)
    depths = np.stack([base + 0.02 * v for v in range(FNV)])[None]
    depths = depths[..., None].astype(np.float32)
    stds = (0.02 + 0.01 * rng.rand(SB, FNV, FH, FW, 1)).astype(np.float32)

    K = np.zeros((SB, FNV, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 320.0
    K[..., 0, 2] = FW / 2
    K[..., 1, 2] = FH / 2
    K[..., 2, 2] = 1.0
    ext = np.broadcast_to(np.eye(4, dtype=np.float32), (SB, FNV, 4, 4)).copy()
    for v in range(1, FNV):
        a = 0.05 * v
        ext[0, v, :3, :3] = np.array([[np.cos(a), 0, np.sin(a)],
                                      [0, 1, 0],
                                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        ext[0, v, 0, 3] = 0.04 * v
    return images, depths, stds, ext, K


@pytest.fixture(scope="module")
def flagship_stacks():
    sd = _fake_lightning_sd()
    ref = TorchReferenceStack(sd, num_layers=4, image_padding=FPAD,
                              padding_pe=4, num_freqs=6, freq_factor=6.28,
                              n_blocks=5, combine_layer=3)
    images, depths, stds, ext, K = _flagship_scene()
    ref.encode(t(np.moveaxis(images, -1, 2)), t(np.moveaxis(depths, -1, 2)),
               t(np.moveaxis(stds, -1, 2)), t(ext), t(K))

    model = PixelNeRF(encoder_layers=4, encoder_norm="batch",
                      image_padding=FPAD, padding_pe=4, n_blocks=5,
                      d_hidden=512, combine_layer=3, sigma_activation="relu")
    ported, extras = port_diner_checkpoint(sd)
    variables = {"params": ported["params"],
                 "batch_stats": ported["batch_stats"]}
    enc = model.apply(variables, jnp.asarray(images), jnp.asarray(depths),
                      jnp.asarray(stds), jnp.asarray(ext), jnp.asarray(K),
                      method="encode")
    return ref, model, variables, enc


def test_flagship_encode_parity(flagship_stacks):
    """Full flagship-shape latent parity: the 384x448-padded 4-view encode
    with the border-PE surgery, at the real DTU padding."""
    ref, model, variables, enc = flagship_stacks
    ours = np.moveaxis(np.asarray(enc.latent), -1, 2)
    theirs = ref.latent.numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours[:, :, :256], theirs[:, :, :256],
                               rtol=1e-4, atol=5e-4)
    _assert_close_quantile(ours[:, :, 256:], theirs[:, :, 256:],
                           frac=0.995, tol=1e-3, max_tol=2e-2)


def test_flagship_field_parity(flagship_stacks):
    ref, model, variables, enc = flagship_stacks
    xyz, dirs = _query_points()
    theirs = ref.field(t(xyz), t(dirs)).numpy()
    ours = np.asarray(model.apply(variables, enc, jnp.asarray(xyz),
                                  jnp.asarray(dirs), method="field"))
    # rtol 2e-4: 4-view mid-MLP averaging at random weights accumulates
    # ~1e-4 relative float noise on the unbounded sigma head
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-4)


def test_flagship_composite_parity(flagship_stacks):
    """A 16x20 crop of the flagship view through both compositors on
    identical z samples (full-image compositing at 512-width MLP x 40
    samples is CPU-prohibitive; the chunked tiling is shape-independent)."""
    from diner_tpu.geometry import gen_rays
    from diner_tpu.renderer.composite import composite

    ref, model, variables, enc = flagship_stacks
    images, depths, stds, ext, K = _flagship_scene()
    h, w = 16, 20
    Ksmall = K[:, 0].copy()
    Ksmall[..., 0, 2] = w / 2
    Ksmall[..., 1, 2] = h / 2
    rays = gen_rays(jnp.asarray(ext[:, 0]), jnp.asarray(Ksmall), w, h,
                    jnp.full((SB,), 0.4), jnp.full((SB,), 1.2))
    rays = rays.reshape(SB, h * w, 8)
    z = jnp.broadcast_to(jnp.linspace(0.45, 1.1, 40, dtype=jnp.float32),
                         (SB, h * w, 40))

    weights, rgb, depth = composite(
        lambda p, d: model.apply(variables, enc, p, d, method="field"),
        rays, z, white_bkgd=False)
    w_t, rgb_t, depth_t = ref.composite(t(np.asarray(rays)), t(np.asarray(z)))

    _assert_close_quantile(np.asarray(rgb), rgb_t.numpy(),
                           frac=0.995, tol=1e-4, max_tol=2e-3)
    _assert_close_quantile(np.asarray(depth), depth_t.numpy(),
                           frac=0.995, tol=1e-4, max_tol=2e-3)
    _assert_close_quantile(np.asarray(weights), w_t.numpy(),
                           frac=0.995, tol=1e-4, max_tol=2e-3)
