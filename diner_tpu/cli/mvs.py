"""MVS subsystem CLI: train the cascade / write depth priors.

Behavioral reference: deps/TransMVSNet/train.py in malteprinzler/diner —
train mode (Adam + 500-iter linear warmup + milestone decay,
utils.py:323-367) and write_prediction mode (train.py:152-191), which writes
the uint16 depth/conf PNGs the DINER datasets consume (DTU divides depth by
872/0.7, train.py:170).

Usage:
  python -m diner_tpu.cli.mvs train --datapath ... --listfile ... --logdir ...
  python -m diner_tpu.cli.mvs write --datapath ... --listfile ... --ckpt ...
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax


def _build_net(args):
    from diner_tpu.mvs import TransMVSNet

    return TransMVSNet(ndepths=tuple(int(x) for x in args.ndepths.split(",")),
                       depth_intervals_ratio=tuple(
                           float(x) for x in args.depth_inter_r.split(",")))


def warmup_multistep(lr: float, warmup_iters: int = 500,
                     milestones=(), gamma: float = 0.5):
    """WarmupMultiStepLR equivalent (deps/TransMVSNet/utils.py:323-367)."""
    def schedule(step):
        warm = jnp.minimum(step / max(warmup_iters, 1), 1.0)
        decay = jnp.asarray(1.0)
        for m in milestones:
            decay = decay * jnp.where(step >= m, gamma, 1.0)
        return lr * warm * decay
    return schedule


def _collate(samples):
    out = {}
    for k in samples[0]:
        v = samples[0][k]
        if isinstance(v, np.ndarray):
            out[k] = np.stack([s[k] for s in samples])
        elif isinstance(v, dict):
            out[k] = {kk: np.stack([s[k][kk] for s in samples]) for kk in v}
        else:
            out[k] = [s[k] for s in samples]
    return out


def cmd_train(args):
    from diner_tpu.mvs import mvs_loss
    from diner_tpu.mvs.datasets import DTUMVSDataset

    ds = DTUMVSDataset(args.datapath, args.listfile, mode="train",
                       ndepths=args.numdepth)
    net = _build_net(args)

    sample = _collate([ds[0]])
    imgs = jnp.asarray(sample["imgs"])
    projs = {k: jnp.asarray(v) for k, v in sample["proj_matrices"].items()}
    dvals = jnp.asarray(sample["depth_values"])
    variables = net.init(jax.random.PRNGKey(args.seed), imgs, projs, dvals,
                         train=True)

    milestones = [int(float(e) * len(ds) / args.batch_size)
                  for e in args.lrepochs.split(":")[0].split(",")]
    gamma = 1.0 / float(args.lrepochs.split(":")[1])
    tx = optax.adam(warmup_multistep(args.lr, milestones=milestones,
                                     gamma=gamma))
    opt_state = tx.init(variables["params"])

    # data-parallel mesh: batch sharded, params replicated (XLA all-reduces)
    from diner_tpu.parallel import make_data_mesh_for_batch, shard_batch, replicate

    mesh = make_data_mesh_for_batch(args.batch_size)
    variables = dict(variables)
    variables["params"] = replicate(variables["params"], mesh)
    variables["batch_stats"] = replicate(variables["batch_stats"], mesh)
    opt_state = replicate(opt_state, mesh)

    @jax.jit
    def step(params, batch_stats, opt_state, batch):
        def loss_fn(p):
            out, mut = net.apply(
                {"params": p, "batch_stats": batch_stats},
                jnp.asarray(batch["imgs"]),
                {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()},
                jnp.asarray(batch["depth_values"]), train=True,
                mutable=["batch_stats"])
            gt = {k: jnp.asarray(v) for k, v in batch["depth"].items()}
            msk = {k: jnp.asarray(v) for k, v in batch["mask"].items()}
            total, aux = mvs_loss(out, gt, msk,
                                  dlossw=tuple(float(x) for x in
                                               args.dlossw.split(",")))
            return total, (aux, mut["batch_stats"])

        (total, (aux, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, total

    params = variables["params"]
    stats = variables["batch_stats"]
    rng = np.random.RandomState(args.seed)
    order = rng.permutation(len(ds))
    logdir = Path(args.logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    profiling = False
    for it in range(args.max_steps):
        if getattr(args, "profile", False):
            if it == 5 and not profiling:
                jax.profiler.start_trace(str(logdir / "trace"))
                profiling = True
            elif it == 10 and profiling:
                jax.profiler.stop_trace()
                profiling = False
                print(f"trace written to {logdir / 'trace'}", flush=True)
        idcs = order[(it * args.batch_size) % len(ds):][:args.batch_size]
        batch = _collate([ds[int(i)] for i in idcs])
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, (np.ndarray, dict))}
        arrays = shard_batch(arrays, mesh)
        params, stats, opt_state, total = step(params, stats, opt_state, arrays)
        if it % args.log_every == 0:
            print(f"step {it}: loss {float(total):.4f}", flush=True)
    if profiling:
        jax.profiler.stop_trace()
    _save_ckpt(logdir / "ckpts", params, stats, args.max_steps)
    print("done ->", logdir)


def _save_ckpt(ckpt_dir, params, stats, step):
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(str(ckpt_dir)) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(
            {"params": params, "batch_stats": stats}), force=True)


def cmd_write(args):
    """Write depth priors next to the dataset's GT depth paths."""
    from diner_tpu.mvs.datasets import DTUMVSDataset
    from diner_tpu.mvs.write_prediction import write_depth_prediction

    ds = DTUMVSDataset(args.datapath, args.listfile, mode="write_prediction",
                       ndepths=args.numdepth)
    net = _build_net(args)

    sample = _collate([ds[0]])
    imgs = jnp.asarray(sample["imgs"])
    projs = {k: jnp.asarray(v) for k, v in sample["proj_matrices"].items()}
    dvals = jnp.asarray(sample["depth_values"])
    variables = net.init(jax.random.PRNGKey(0), imgs, projs, dvals)
    if args.ckpt:
        import orbax.checkpoint as ocp

        with ocp.CheckpointManager(str(Path(args.ckpt).resolve())) as mgr:
            target = {"params": variables["params"],
                      "batch_stats": variables["batch_stats"]}
            restored = mgr.restore(mgr.latest_step(),
                                   args=ocp.args.StandardRestore(target))
        variables = restored

    @jax.jit
    def infer(batch_imgs, batch_projs, batch_dvals):
        out = net.apply({"params": variables["params"],
                         "batch_stats": variables["batch_stats"]},
                        batch_imgs, batch_projs, batch_dvals)
        return out["depth"], out["photometric_confidence"]

    for i in range(len(ds)):
        s = _collate([ds[i]])
        depth, conf = infer(
            jnp.asarray(s["imgs"]),
            {k: jnp.asarray(v) for k, v in s["proj_matrices"].items()},
            jnp.asarray(s["depth_values"]))
        write_depth_prediction(np.asarray(depth[0]), np.asarray(conf[0]),
                               s["dpath"][0], scale=args.scale)
        if i % 20 == 0:
            print(f"wrote {i + 1}/{len(ds)}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("train", "write"):
        p = sub.add_parser(name)
        p.add_argument("--datapath", required=True)
        p.add_argument("--listfile", required=True)
        p.add_argument("--ndepths", default="48,32,8")
        p.add_argument("--depth_inter_r", default="4,2,1")
        p.add_argument("--numdepth", type=int, default=192)
        p.add_argument("--seed", type=int, default=0)
        if name == "train":
            p.add_argument("--logdir", required=True)
            p.add_argument("--profile", action="store_true",
                           help="capture a jax.profiler trace of steps 5-10 "
                                "(the reference's --mode=profile equivalent, "
                                "deps/TransMVSNet/train.py:304-332)")
            p.add_argument("--lr", type=float, default=1e-3)
            p.add_argument("--lrepochs", default="10,12,14:2")
            p.add_argument("--dlossw", default="0.5,1.0,2.0")
            p.add_argument("--batch-size", type=int, default=1)
            p.add_argument("--max-steps", type=int, default=1000)
            p.add_argument("--log-every", type=int, default=20)
        else:
            p.add_argument("--ckpt", default=None)
            p.add_argument("--scale", type=float, default=872.0 / 0.7)
    args = ap.parse_args(argv)
    {"train": cmd_train, "write": cmd_write}[args.cmd](args)


if __name__ == "__main__":
    main()
