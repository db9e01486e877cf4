"""RenderServer: scene cache, bucket contract, threaded renders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diner_tpu.core.types import RenderConfig
from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
from diner_tpu.models import PixelNeRF
from diner_tpu.serve import RenderServer


@pytest.fixture(scope="module")
def server_and_data():
    H = W = 32
    model = PixelNeRF(encoder_layers=2, encoder_norm="group", image_padding=4,
                      padding_pe=2, n_blocks=2, d_hidden=32, combine_layer=1)
    ds = SyntheticSphereDataset(n_scenes=2, n_views=2, H=H, W=W)
    b0 = {k: jnp.asarray(v) for k, v in to_device_batch(collate([ds[0]])).items()}
    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(jax.random.PRNGKey(0), b0["src_rgbs"],
                           b0["src_depths"], b0["src_depth_stds"],
                           b0["src_extrinsics"], b0["src_intrinsics"], xyz, xyz)
    server = RenderServer(
        model, variables,
        RenderConfig(n_samples=6, n_depth_candidates=32, n_gaussian=2,
                     n_prior_anchors=8),
        znear=ds.znear, zfar=ds.zfar, buckets=((H, W),), chunk=256)
    return server, ds, H, W


def test_serve_load_render_unload(server_and_data):
    server, ds, H, W = server_and_data
    b = {k: jnp.asarray(v) for k, v in to_device_batch(collate([ds[0]])).items()}
    server.load_scene("s0", b["src_rgbs"], b["src_depths"],
                      b["src_depth_stds"], b["src_extrinsics"],
                      b["src_intrinsics"])
    assert server.scene_ids() == ["s0"]
    rgb, depth = server.render("s0", b["target_extrinsics"],
                               b["target_intrinsics"], H, W)
    assert rgb.shape == (1, H, W, 3)
    assert np.isfinite(np.asarray(rgb)).all()
    # unknown bucket rejected (single compiled program per bucket)
    with pytest.raises(ValueError):
        server.render("s0", b["target_extrinsics"], b["target_intrinsics"],
                      H + 8, W)
    assert server.unload_scene("s0") and not server.unload_scene("s0")


def test_serve_from_preset(tmp_path):
    """RenderServer.from_preset builds model + render config from a YAML
    preset (the certified-fast-preset deployment path)."""
    import yaml

    conf = {
        "nerf": {"kwargs": {
            "compute_dtype": "bfloat16", "quad_latent": True,
            "encoder_conf": {"kwargs": {"num_layers": 2, "norm": "group",
                                        "image_padding": 4,
                                        "padding_pe": 2}},
            "mlp_fine_conf": {"kwargs": {"n_blocks": 2, "d_hidden": 32,
                                         "combine_layer": 1}}}},
        "renderer": {"kwargs": {"n_samples": 6, "n_depth_candidates": 32,
                                "n_gaussian": 2, "n_prior_anchors": 8}},
    }
    p = tmp_path / "preset.yaml"
    p.write_text(yaml.safe_dump(conf))

    H = W = 32
    ds = SyntheticSphereDataset(n_scenes=1, n_views=2, H=H, W=W)
    b = {k: jnp.asarray(v)
         for k, v in to_device_batch(collate([ds[0]])).items()}
    from diner_tpu.cli.build import build_nerf
    from diner_tpu.core.config import load_config

    model = build_nerf(load_config(p)["nerf"])
    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(jax.random.PRNGKey(0), b["src_rgbs"],
                           b["src_depths"], b["src_depth_stds"],
                           b["src_extrinsics"], b["src_intrinsics"], xyz, xyz)
    server = RenderServer.from_preset(p, variables, ds.znear, ds.zfar,
                                      buckets=((H, W),), chunk=256)
    assert server.cfg.n_prior_anchors == 8
    assert server.model.quad_latent is True
    server.load_scene("s", b["src_rgbs"], b["src_depths"],
                      b["src_depth_stds"], b["src_extrinsics"],
                      b["src_intrinsics"])
    rgb, depth = server.render("s", b["target_extrinsics"],
                               b["target_intrinsics"], H, W)
    assert rgb.shape == (1, H, W, 3) and np.isfinite(np.asarray(rgb)).all()


def test_serve_threaded_requests(server_and_data):
    from concurrent.futures import ThreadPoolExecutor

    server, ds, H, W = server_and_data
    for i in range(2):
        b = {k: jnp.asarray(v)
             for k, v in to_device_batch(collate([ds[i]])).items()}
        server.load_scene(f"t{i}", b["src_rgbs"], b["src_depths"],
                          b["src_depth_stds"], b["src_extrinsics"],
                          b["src_intrinsics"])

    def req(i):
        b = {k: jnp.asarray(v)
             for k, v in to_device_batch(collate([ds[i % 2]])).items()}
        rgb, _ = server.render(f"t{i % 2}", b["target_extrinsics"],
                               b["target_intrinsics"], H, W, seed=i)
        return np.asarray(rgb)

    with ThreadPoolExecutor(max_workers=3) as pool:
        frames = list(pool.map(req, range(6)))
    assert all(np.isfinite(f).all() for f in frames)
    # same scene + same seed is deterministic
    np.testing.assert_array_equal(req(0), req(0))
