"""Training step: loss decreases on a synthetic scene; VGG params stay frozen;
data-parallel sharded step matches semantics on an 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from diner_tpu.core.types import RenderConfig
from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
from diner_tpu.models import PixelNeRF
from diner_tpu.models.diner import DINER
from diner_tpu.parallel import make_mesh, shard_batch, replicate
from diner_tpu.train import create_train_state, make_train_step, make_eval_step


def _tiny_diner(w_vgg=0.0, w_antibias=0.0):
    nerf = PixelNeRF(encoder_layers=2, encoder_norm="group", image_padding=4,
                     padding_pe=2, n_blocks=3, d_hidden=32, combine_layer=2)
    return DINER(nerf=nerf,
                 render_cfg=RenderConfig(n_samples=8, n_depth_candidates=64,
                                         n_gaussian=3),
                 znear=SyntheticSphereDataset.znear,
                 zfar=SyntheticSphereDataset.zfar,
                 ray_batch_size=64, w_vgg=w_vgg, vgg_spatch=16,
                 w_antibias=w_antibias)


def _batch(n=2, H=32, W=32):
    ds = SyntheticSphereDataset(n_scenes=n, n_views=2, H=H, W=W)
    return to_device_batch(collate([ds[i] for i in range(n)]))


def test_loss_decreases():
    """Deterministic: fixed-rng eval loss must drop after 50 train steps.
    (Per-step losses are noisy across random ray subsets, so compare a fixed
    evaluation instead.)"""
    model = _tiny_diner()
    batch = _batch(2)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, lr=1e-3)
    step = make_train_step(model)
    eval_step = make_eval_step(model)
    k_eval = jax.random.PRNGKey(99)
    before = float(eval_step(state, batch, k_eval)["total"])
    rngs = jax.random.split(jax.random.PRNGKey(1), 50)
    for i in range(50):
        state, losses = step(state, batch, rngs[i])
    after = float(eval_step(state, batch, k_eval)["total"])
    assert np.isfinite(before) and np.isfinite(after)
    assert after < before * 0.95, (before, after)


def test_vgg_frozen_and_patch_losses_run():
    model = _tiny_diner(w_vgg=0.1, w_antibias=1.0)
    batch = _batch(2)
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    assert "vgg" in state.params  # tower exists
    vgg_before = jax.tree.map(np.asarray, state.params["vgg"])
    step = make_train_step(model)
    state, losses = step(state, batch, jax.random.PRNGKey(2))
    assert {"rgb_fine", "vgg_fine", "antibias", "total"} <= set(losses)
    assert float(losses["skipped_nonfinite"]) == 0.0  # NaN guard inactive
    assert np.isfinite(float(losses["total"]))
    vgg_after = state.params["vgg"]
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                 vgg_before, vgg_after)


def test_eval_step_runs():
    model = _tiny_diner()
    batch = _batch(2)
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    losses = make_eval_step(model)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))


def test_data_parallel_step_on_mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(axis_names=("data",))
    model = _tiny_diner()
    batch = _batch(8)
    state = create_train_state(model, jax.random.PRNGKey(0), batch)

    sharded = shard_batch(batch, mesh)
    state = jax.tree.map(
        lambda x: x if not hasattr(x, "shape") else x, state)
    state = state.replace(params=replicate(state.params, mesh),
                          opt_state=replicate(state.opt_state, mesh))
    step = make_train_step(model)
    new_state, losses = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))
    # grads were all-reduced: params remain fully replicated
    p = jax.tree.leaves(new_state.params)[0]
    assert p.sharding.is_fully_replicated


def test_remat_field_trains():
    """remat on the field MLP: gradients still flow, loss finite."""
    from diner_tpu.models import PixelNeRF
    from diner_tpu.models.diner import DINER
    from diner_tpu.core.types import RenderConfig
    from diner_tpu.data import SyntheticSphereDataset

    nerf = PixelNeRF(encoder_layers=2, encoder_norm="group", image_padding=4,
                     padding_pe=2, n_blocks=3, d_hidden=32, combine_layer=2,
                     remat_field=True)
    model = DINER(nerf=nerf,
                  render_cfg=RenderConfig(n_samples=8, n_depth_candidates=32,
                                          n_gaussian=3),
                  znear=SyntheticSphereDataset.znear,
                  zfar=SyntheticSphereDataset.zfar, ray_batch_size=32)
    batch = _batch(2)
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    step = make_train_step(model)
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))


def test_make_data_mesh_for_batch():
    from diner_tpu.parallel import make_data_mesh_for_batch

    # 8 devices available in tests: LARGEST divisor of the batch that fits
    # (gcd was wrong: batch 3 can use 3 chips, batch 12 -> 6, not 4)
    assert make_data_mesh_for_batch(2).shape["data"] == 2
    assert make_data_mesh_for_batch(3).shape["data"] == 3
    assert make_data_mesh_for_batch(8).shape["data"] == 8
    assert make_data_mesh_for_batch(12).shape["data"] == 6
    assert make_data_mesh_for_batch(5).shape["data"] == 5
    assert make_data_mesh_for_batch(7).shape["data"] == 7
    assert make_data_mesh_for_batch(11).shape["data"] == 1


def test_patch_anchor_erosion_thin_ring():
    """With erode_fg_mask > 0, anchors are never drawn from a thin alpha ring
    (every fg pixel vanishes under erosion wider than the ring); with the
    reference's raw-alpha behavior (erode=0) they land on the ring."""
    import jax.numpy as jnp

    H = W = 32
    # thin ring + solid disk, both inside the border-zeroed window
    # [pad, H-pad) = [8, 24)
    yy, xx = np.mgrid[:H, :W]
    r = np.sqrt((yy - H / 2) ** 2 + (xx - W / 2) ** 2)
    alpha = ((np.abs(r - 6.5) < 0.7) | (r < 3)).astype(np.float32)
    batch = {"target_alpha": jnp.asarray(alpha[None, ..., None])}

    def centers(model, n=64):
        out = []
        for i in range(n):
            pix = model._select_pixels(jax.random.PRNGKey(i), batch, 1, H, W)
            # patch center = offset (pad, pad) from the top-left pixel
            s, pad = model.vgg_spatch, (model.vgg_spatch + 1) // 2
            first = int(np.asarray(pix)[0, 0])
            cx, cy = first % W + pad, first // W + pad
            out.append((cx, cy))
        return np.array(out)

    # force the patch path without building VGG weights
    model_raw = _tiny_diner(w_antibias=1.0).bind({})
    model_eroded = DINER(nerf=model_raw.nerf, render_cfg=model_raw.render_cfg,
                         znear=model_raw.znear, zfar=model_raw.zfar,
                         ray_batch_size=64, w_antibias=1.0, vgg_spatch=16,
                         erode_fg_mask=2).bind({})

    c_raw = centers(model_raw)
    d_raw = np.sqrt(((c_raw - np.array([W / 2, H / 2])) ** 2).sum(-1))
    assert (np.abs(d_raw - 6.5) < 1.5).any(), "raw sampling should hit the ring"

    c_er = centers(model_eroded)
    d_er = np.sqrt(((c_er - np.array([W / 2, H / 2])) ** 2).sum(-1))
    assert (d_er < 3).all(), "eroded sampling must stay inside the solid disk"


def test_build_render_cfg_knobs():
    from diner_tpu.cli.build import build_render_cfg

    cfg = build_render_cfg({"kwargs": {
        "n_samples": 20, "eval_batch_size": 100000, "prior_stride": 2,
        "approx_topk": False, "n_prior_anchors": 0}})
    assert cfg.n_samples == 20
    assert cfg.eval_chunk_rays == 5000  # 100000 points / 20 samples
    assert cfg.prior_stride == 2 and cfg.approx_topk is False

    cfg2 = build_render_cfg({"kwargs": {"eval_chunk_rays": 1234,
                                        "n_prior_anchors": 128}})
    assert cfg2.eval_chunk_rays == 1234 and cfg2.n_prior_anchors == 128


def test_cosine_schedule_requires_decay_steps():
    """lr_schedule='cosine' without lr_decay_steps must raise, not silently
    fall back to constant lr (the sweep-invalidating failure mode)."""
    import pytest

    from diner_tpu.train.state import make_optimizer

    with pytest.raises(ValueError, match="lr_decay_steps"):
        make_optimizer({"nerf": jnp.zeros(1)}, lr_schedule="cosine")
    with pytest.raises(ValueError, match="unknown lr_schedule"):
        make_optimizer({"nerf": jnp.zeros(1)}, lr_schedule="exp")


def test_latent_anchors_one_raises():
    """latent_anchors=1 would divide by zero in the anchor fraction — the
    knob must fail loudly at trace time, not render NaNs."""
    import pytest

    from diner_tpu.models.pixelnerf import index_latent_anchored

    with pytest.raises(ValueError, match="latent_anchors"):
        index_latent_anchored(None, None, None, 1)


def test_process_local_slice_pads_to_equal():
    """Training shards must be equal-length across hosts (a short host runs
    out of batches and strands the others in the collective)."""
    from diner_tpu.parallel import process_local_slice

    n, pc = 127, 8
    slices = [process_local_slice(n, pi, pc, pad_to_equal=True)
              for pi in range(pc)]
    lens = {len(s) for s in slices}
    assert lens == {-(-n // pc)}  # all equal to ceil(n/pc)
    covered = set()
    for s in slices:
        assert all(0 <= i < n for i in s)
        covered.update(s)
    assert covered == set(range(n))  # padding wraps, never drops
    # unpadded keeps the plain strided slice for write/eval sharding
    assert process_local_slice(n, 7, pc) == list(range(7, n, pc))


def test_make_data_mesh_for_batch_largest_divisor():
    """gcd(batch, n_devices) was wrong: batch 6 on 4 devices must use 3
    chips (largest divisor of 6 that fits), not gcd(6,4)=2."""
    from diner_tpu.parallel import make_data_mesh_for_batch

    devs = jax.devices()
    if len(devs) >= 4:
        assert make_data_mesh_for_batch(6, devs[:4]).devices.size == 3
    assert make_data_mesh_for_batch(12, devs[:8]).devices.size == \
        max(d for d in range(1, min(8, len(devs)) + 1) if 12 % d == 0)
    assert make_data_mesh_for_batch(5, devs[:4]).devices.size == 1


def test_periodic_checkpoint_resume_does_not_replay_steps(tmp_path):
    """Periodic checkpoints label STEPS COMPLETED: training 2 steps, then
    resuming from the periodic checkpoint and training 2 more must equal a
    straight 4-step run (the old `step` labeling re-applied an
    already-applied update on resume)."""
    import itertools

    import flax.linen as nn

    from diner_tpu.train.loop import train

    class Toy(nn.Module):
        def setup(self):
            self.d = nn.Dense(4)

        def __call__(self, batch, rng=None, train=True):
            return self.losses(batch, rng, train)

        def losses(self, batch, rng=None, train=True):
            y = self.d(batch["x"])
            return {"total": jnp.mean((y - batch["y"]) ** 2)}

    rs = np.random.RandomState(0)
    batch = {"x": rs.randn(2, 4).astype(np.float32),
             "y": rs.randn(2, 4).astype(np.float32)}
    loader = lambda: itertools.repeat(batch)  # constant batch: rng-free model

    from diner_tpu.train.loop import restore_checkpoint
    from diner_tpu.train.state import create_train_state

    # the PERIODIC checkpoint labeled 2 (from a 4-step run) must hold the
    # params of exactly 2 completed steps
    straight2 = train(Toy(), loader(), tmp_path / "a", max_steps=2,
                      ckpt_every=0, log_every=10)
    train(Toy(), loader(), tmp_path / "b", max_steps=4, ckpt_every=2,
          log_every=10)
    fresh = create_train_state(Toy(), jax.random.PRNGKey(0), batch)
    periodic, step = restore_checkpoint(tmp_path / "b" / "ckpts", fresh,
                                        step=2)
    assert step == 2
    for a, b in zip(jax.tree_util.tree_leaves(straight2.params),
                    jax.tree_util.tree_leaves(periodic.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # and resuming it runs steps 2,3 to match a straight 4-step run
    straight4 = train(Toy(), loader(), tmp_path / "c", max_steps=4,
                      ckpt_every=0, log_every=10)
    import shutil

    shutil.rmtree(tmp_path / "b" / "ckpts" / "4")  # leave only the periodic
    resumed = train(Toy(), loader(), tmp_path / "b", max_steps=4,
                    ckpt_every=0, log_every=10, resume=True)
    for a, b in zip(jax.tree_util.tree_leaves(straight4.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
