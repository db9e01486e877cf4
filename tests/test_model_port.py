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


def test_export_diner_roundtrip():
    """export_diner is the exact inverse of port_diner_checkpoint: a fake
    Lightning sd survives port -> export bit-exactly (keys and values)."""
    from diner_tpu.models.torch_port import export_diner

    sd = _fake_lightning_sd()
    variables, extras = port_diner_checkpoint(sd)
    out = export_diner(variables, znear=extras["znear"], zfar=extras["zfar"])

    # every original key round-trips (posenc buffers + num_batches_tracked
    # are synthesized extras on top)
    missing = set(sd) - set(out)
    assert not missing, missing
    for k in sd:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(sd[k]),
                                      err_msg=k)
    extra = {k for k in out if k not in sd}
    assert all("._freqs" in k or "._phases" in k or
               k.endswith("num_batches_tracked") for k in extra), extra
    # posenc buffers match the reference construction
    f = out["nerf.poscode._freqs"]
    assert f.shape == (1, 12, 1)
    np.testing.assert_allclose(f[0, :, 0],
                               np.repeat(6.28 * 2.0 ** np.arange(6), 2))


def test_export_diner_fresh_init_and_vgg():
    """A freshly initialized flax model exports to a reference-shaped sd
    (incl. frozen VGG slices) that ports back to the identical tree."""
    from diner_tpu.models.torch_port import export_diner
    from diner_tpu.nn import Vgg19Features

    model = PixelNeRF(encoder_layers=4, encoder_norm="batch",
                      image_padding=64, padding_pe=4, n_blocks=5,
                      d_hidden=32, combine_layer=3)
    SB, NV, H, W = 1, 2, 32, 32
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(SB, NV, H, W, 3).astype(np.float32))
    depths = jnp.full((SB, NV, H, W, 1), 0.7)
    stds = jnp.full((SB, NV, H, W, 1), 0.01)
    ext = jnp.broadcast_to(jnp.eye(4), (SB, NV, 4, 4))
    K = np.zeros((SB, NV, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 30.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 16, 16, 1
    xyz = jnp.asarray(np.array([[[0.1, 0.0, 0.7]]], np.float32))
    variables = model.init(jax.random.PRNGKey(0), images, depths, stds, ext,
                           jnp.asarray(K), xyz, xyz)

    vgg = Vgg19Features()
    vgg_vars = vgg.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 32, 32, 3), jnp.float32))
    sd = export_diner(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        znear=0.5, zfar=2.5, vgg_params=vgg_vars["params"])

    assert "vggloss.vgg_net.slice1.0.weight" in sd
    assert "vggloss.vgg_net.slice4.19.weight" in sd
    # conv1 carries the widened border-PE input channels
    assert sd["nerf.encoder.model.conv1.weight"].shape[1] > 3

    back, extras = port_diner_checkpoint(sd, n_blocks=5, combine_layer=3)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path]),
                                   atol=0, err_msg=str(path))
    assert extras["vgg_params"] is not None
    for name in vgg_vars["params"]:
        np.testing.assert_allclose(
            np.asarray(vgg_vars["params"][name]["kernel"]),
            np.asarray(extras["vgg_params"][name]["kernel"]), atol=0)


def test_export_diner_rejects_groupnorm_trunk():
    from diner_tpu.models.torch_port import export_diner

    sd = _fake_lightning_sd()
    variables, extras = port_diner_checkpoint(sd)
    # fake a groupnorm trunk by dropping the BatchNorm key
    variables["params"]["encoder"]["trunk"]["norm1"] = {"GroupNorm_0": {}}
    with pytest.raises(ValueError, match="BatchNorm"):
        export_diner(variables, znear=0.5, zfar=2.5)


def test_export_torch_cli_diner(tmp_path):
    """orbax DINER ckpt -> `export_torch diner` -> torch .ckpt that the
    import path loads back to the identical tree."""
    torch = pytest.importorskip("torch")
    from diner_tpu.cli.export_torch import main as export_main
    from diner_tpu.nn.torch_port import load_torch_state_dict
    from diner_tpu.train.ckpt_io import orbax_save

    sd = _fake_lightning_sd()
    variables, extras = port_diner_checkpoint(sd)
    ckpt_dir = tmp_path / "ckpts"
    orbax_save(ckpt_dir, 7, {
        "params": {"nerf": variables["params"]},
        "batch_stats": {"nerf": variables["batch_stats"]},
        "step": np.asarray(7)})

    out = tmp_path / "exported.ckpt"
    export_main(["diner", "--ckpt", str(ckpt_dir), "--out", str(out),
                 "--znear", "0.32", "--zfar", "1.2",
                 "--hparams", '{"lr": 1e-4}'])

    raw = torch.load(out, map_location="cpu", weights_only=False)
    assert raw["global_step"] == 7
    assert raw["hyper_parameters"] == {"lr": 1e-4}
    loaded = load_torch_state_dict(out)  # unwraps state_dict
    back, extras2 = port_diner_checkpoint(loaded)
    assert extras2["znear"] == np.float32(0.32)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


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
