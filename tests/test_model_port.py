"""DINER checkpoint port: structural round-trip against a fake Lightning sd."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diner_tpu.models import PixelNeRF
from diner_tpu.models.torch_port import port_diner_checkpoint
from test_nn import _fake_resnet34_sd


def _fake_lightning_sd(d_latent=512, d_in=55, d_hidden=512, n_blocks=5,
                       combine_layer=3, pe_ch=18):
    rng = np.random.RandomState(0)
    sd = {}
    trunk = _fake_resnet34_sd(rng)
    # widen conv1 like the reference surgery (3 + pe channels)
    trunk["conv1.weight"] = rng.randn(64, 3 + pe_ch, 7, 7).astype(np.float32) * 0.05
    for k, v in trunk.items():
        sd[f"nerf.encoder.model.{k}"] = v

    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = np.zeros(o, np.float32)
    lin("nerf.mlp_fine.lin_in", d_in, d_hidden)
    lin("nerf.mlp_fine.lin_out", d_hidden, 4)
    for i in range(combine_layer):
        lin(f"nerf.mlp_fine.lin_z.{i}", d_latent, d_hidden)
    for b in range(n_blocks):
        lin(f"nerf.mlp_fine.blocks.{b}.fc_0", d_hidden, d_hidden)
        lin(f"nerf.mlp_fine.blocks.{b}.fc_1", d_hidden, d_hidden)
    sd["znear"] = np.float32(0.32)
    sd["zfar"] = np.float32(1.2)
    return sd


def test_port_diner_checkpoint_structural():
    sd = _fake_lightning_sd()
    variables, extras = port_diner_checkpoint(sd)
    assert extras["znear"] == np.float32(0.32)

    model = PixelNeRF(encoder_layers=4, encoder_norm="batch",
                      image_padding=64, padding_pe=4, n_blocks=5,
                      d_hidden=512, combine_layer=3)
    SB, NV, H, W = 1, 2, 64, 64
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(SB, NV, H, W, 3).astype(np.float32))
    depths = jnp.full((SB, NV, H, W, 1), 0.7)
    stds = jnp.full((SB, NV, H, W, 1), 0.01)
    ext = jnp.broadcast_to(jnp.eye(4), (SB, NV, 4, 4))
    K = np.zeros((SB, NV, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 60.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 32, 32, 1
    xyz = jnp.asarray(np.array([[[0.1, 0.0, 0.7], [0.0, 0.1, 0.8],
                                 [-0.1, 0.05, 0.75]]], np.float32))

    ref_vars = model.init(jax.random.PRNGKey(0), images, depths, stds, ext,
                          jnp.asarray(K), xyz, xyz)
    # ported tree must be shape-compatible with a fresh init (nerf subtree)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_vars["params"])
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape,
                              variables["params"])
    assert ref_shapes == got_shapes

    # and the model must run with the ported weights
    merged = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}
    out = model.apply(merged, images, depths, stds, ext, jnp.asarray(K),
                      xyz, xyz)
    assert out.shape == (SB, 3, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_torch_ckpt_file_roundtrip(tmp_path):
    """Save a fake Lightning .ckpt with torch; load + port via the CLI path."""
    torch = pytest.importorskip("torch")
    from diner_tpu.nn.torch_port import load_torch_state_dict

    sd = _fake_lightning_sd()
    ckpt = {"state_dict": {k: torch.from_numpy(np.asarray(v))
                           for k, v in sd.items()},
            "epoch": 3}
    p = tmp_path / "diner.ckpt"
    torch.save(ckpt, p)

    loaded = load_torch_state_dict(p)
    variables, extras = port_diner_checkpoint(loaded)
    assert extras["znear"] == np.float32(0.32)
    assert "encoder" in variables["params"] and "mlp" in variables["params"]
