"""MVS depth-prior writer benchmark on one chip: depth-maps/min at the
reference's DTU training shape (512x640, 5 views, ndepths 48/32/8, 192
hypotheses — deps/TransMVSNet/train.py:152-191 writes priors with exactly
this cascade), plus a component profile (feature+FMT vs per-stage cost
volume+regularization).

Prints one JSON line (depth-maps/min + component millis). Run:
    python bench_mvs.py [--components]
"""

from __future__ import annotations

import argparse
import json
import sys
import traceback

import jax

from diner_tpu.utils.profiling import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp
import numpy as np

H, W, V = 512, 640, 5
NDEPTHS = (48, 32, 8)
NUMDEPTH = 192


def _setup(compute_dtype="float32", batch: int = 1, dcn_impl="gather"):
    from diner_tpu.mvs.net import TransMVSNet
    from diner_tpu.utils.jitinit import jit_init

    net = TransMVSNet(ndepths=NDEPTHS, depth_intervals_ratio=(4, 2, 1),
                      cr_base_chs=(8, 8, 8), base_channels=8,
                      compute_dtype=compute_dtype, dcn_impl=dcn_impl)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(batch, V, H, W, 3).astype(np.float32))
    projs = {}
    for si, scale in enumerate((4, 2, 1)):
        K4 = np.eye(4, dtype=np.float32)
        K4[0, 0] = K4[1, 1] = 2892.33 / scale  # DTU intrinsics scale
        K4[0, 2], K4[1, 2] = W / (2 * scale), H / (2 * scale)
        stack = []
        for v in range(V):
            ext = np.eye(4, dtype=np.float32)
            ext[0, 3] = 4.0 * (v - V // 2)  # mm-scale DTU baselines
            stack.append(np.stack([ext, K4]))
        projs[f"stage{si + 1}"] = jnp.asarray(
            np.broadcast_to(np.stack(stack)[None],
                            (batch, V, 2, 4, 4)).copy())
    dvals = jnp.asarray(np.broadcast_to(
        np.linspace(425.0, 905.0, NUMDEPTH, dtype=np.float32)[None],
        (batch, NUMDEPTH)).copy())
    variables = jit_init(net.init)(jax.random.PRNGKey(0), imgs, projs, dvals)
    return net, variables, imgs, projs, dvals


def bench_train(net, variables, imgs, projs, dvals, iters):
    """One DTU-recipe training step (B=1, masked entropy loss over the three
    stages with dlossw 0.5/1/2 — deps/TransMVSNet/train.py:72, models/
    module.py:480-553): encode + cascade + backward + adam update."""
    import optax

    from diner_tpu.mvs import mvs_loss
    from diner_tpu.utils.jitinit import jit_init
    from diner_tpu.utils.profiling import benchmark

    rng = np.random.RandomState(1)
    B = imgs.shape[0]
    variables = jit_init(lambda k, i, p, d: net.init(k, i, p, d, train=True))(
        jax.random.PRNGKey(0), imgs, projs, dvals)
    gt, msk = {}, {}
    for si, scale in enumerate((4, 2, 1)):
        h, w = H // scale, W // scale
        gt[f"stage{si + 1}"] = jnp.asarray(
            rng.uniform(425.0, 905.0, (B, h, w)).astype(np.float32))
        msk[f"stage{si + 1}"] = jnp.asarray(
            (rng.rand(B, h, w) > 0.1).astype(np.float32))

    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, mut = net.apply({"params": p, "batch_stats": batch_stats},
                                 imgs, projs, dvals, train=True,
                                 mutable=["batch_stats"])
            total, _ = mvs_loss(out, gt, msk, dlossw=(0.5, 1.0, 2.0))
            return total, mut["batch_stats"]

        (total, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, total

    res = benchmark(step, variables["params"], variables["batch_stats"],
                    opt_state, warmup=2, iters=iters)
    return res["median_s"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--components", action="store_true",
                    help="also time feature/FMT vs cost-volume stages")
    ap.add_argument("--train", action="store_true",
                    help="also time a full training step (fwd+bwd+adam)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=1,
                    help="samples per program (single-chip writer batching; "
                         "maps/min counts all of them)")
    ap.add_argument("--dcn", default="gather", choices=["gather", "window"],
                    help="DCN implementation: exact row-gather (default) or "
                         "the gather-free stencil (exact while |offset|<1px)")
    ap.add_argument("--shape", default="512x640",
                    help="HxW (default = the reference's DTU write shape)")
    ap.add_argument("--ndepths", default="48,32,8")
    ap.add_argument("--numdepth", type=int, default=192)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--skip-infer", action="store_true",
                    help="skip the writer timing (train-step bisects)")
    args = ap.parse_args()

    # shape overrides (scripts/bisect_mvs_train.py sweeps these to find the
    # largest train-step program the environment can compile)
    global H, W, V, NDEPTHS, NUMDEPTH
    H, W = (int(x) for x in args.shape.split("x"))
    V = args.views
    NDEPTHS = tuple(int(x) for x in args.ndepths.split(","))
    NUMDEPTH = args.numdepth

    from diner_tpu.utils.profiling import benchmark

    net, variables, imgs, projs, dvals = _setup(args.dtype, args.batch,
                                                args.dcn)

    @jax.jit
    def infer(variables, imgs, projs, dvals):
        out = net.apply(variables, imgs, projs, dvals)
        return out["depth"], out["photometric_confidence"]

    if args.skip_infer:
        line = {"metric": "mvs_train_bisect", "batch": args.batch,
                "ndepths": list(NDEPTHS), "shape": f"{H}x{W}",
                "numdepth": NUMDEPTH, "views": V}
    else:
        res = benchmark(infer, variables, imgs, projs, dvals,
                        warmup=2, iters=args.iters)
        dt = res["median_s"]
        line = {
            "metric": "mvs_depth_maps_per_min_per_chip",
            "value": round(60.0 * args.batch / dt, 1),
            "unit": "depth-maps/min",
            f"secs_per_map_{H}x{W}": round(dt / args.batch, 4),
            "batch": args.batch,
            "shape": f"{H}x{W}",
            "numdepth": NUMDEPTH,
            "views": V,
            "ndepths": list(NDEPTHS),
            "compute_dtype": args.dtype,
            "dcn_impl": args.dcn,
            "device": str(jax.devices()[0]),
        }

    # the optional sections must not lose the primary metric: the remote-TPU
    # tunnel in this sandbox occasionally drops a compile mid-read, and a
    # crash here would discard the already-measured depth-maps/min line
    if args.train:
        try:
            dt_t = bench_train(net, variables, imgs, projs, dvals, args.iters)
            line["train_steps_per_sec"] = round(1.0 / dt_t, 2)
        except Exception as e:  # noqa: BLE001 - report, keep the main line
            traceback.print_exc(file=sys.stderr)
            line["train_error"] = f"{type(e).__name__}: {e}"[:200]

    if args.components:
      try:
        from diner_tpu.mvs.ops import homo_warping

        @jax.jit
        def feats(variables, imgs):
            def run(m, imgs):
                fs = [m.feature(imgs[:, v]) for v in range(V)]
                return m.fmt_with_pathway(fs)

            return net.apply(variables, imgs, method=run)

        f = jax.block_until_ready(feats(variables, imgs))
        res_f = benchmark(feats, variables, imgs, warmup=1, iters=3)
        line["feature_fmt_ms"] = round(res_f["median_s"] * 1e3, 1)

        # stage-1 warp alone: the homography hot loop at 48 hypotheses /4 res
        s1 = [x["stage1"] for x in f]
        proj = projs["stage1"]

        def fuse(p):
            out = p[:, 0]
            krt = jnp.einsum("bij,bjk->bik", p[:, 1, :3, :3], p[:, 0, :3, :4])
            return out.at[:, :3, :4].set(krt)

        B = imgs.shape[0]
        dv1 = jnp.broadcast_to(
            jnp.linspace(425.0, 905.0, NDEPTHS[0])[None, :, None, None],
            (B, NDEPTHS[0], H // 4, W // 4))

        @jax.jit
        def warp_all(s1, proj, dv1):
            ref_p = fuse(proj[:, 0])
            return sum(homo_warping(s1[i + 1], fuse(proj[:, i + 1]), ref_p,
                                    dv1).sum() for i in range(V - 1))

        res_w = benchmark(warp_all, s1, proj, dv1, warmup=1, iters=3)
        line["homo_warp_stage1_ms"] = round(res_w["median_s"] * 1e3, 1)
      except Exception as e:  # noqa: BLE001 - report, keep the main line
        traceback.print_exc(file=sys.stderr)
        line["components_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(line))


if __name__ == "__main__":
    main()
