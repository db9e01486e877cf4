"""Train entry point: `python -m diner_tpu.cli.train <config.yaml> [overrides]`.

Behavioral reference: python_scripts/train.py in malteprinzler/diner (build
datamodule + DINER + trainer, fit, periodic in-loop eval); plus config/code
snapshotting into the run dir (src/util/general.py:21-27) for provenance.
"""

from __future__ import annotations

import argparse
import os
import shutil
import time
from pathlib import Path

import jax

from diner_tpu.utils.profiling import setup_compilation_cache

setup_compilation_cache()


def _resolve_val_every(val_check_interval, loader):
    """Lightning val_check_interval semantics: an int is a step count; a
    float in (0, 1] is a FRACTION of an epoch (int() truncation used to
    silently disable validation for 0.25 and validate every step for 1.0)."""
    if not val_check_interval:
        return None
    if isinstance(val_check_interval, float) and 0 < val_check_interval <= 1:
        return max(1, int(round(val_check_interval * max(len(loader), 1))))
    return int(val_check_interval)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--logdir", default=None,
                    help="parent dir; a timestamped run dir is created inside")
    ap.add_argument("--run-dir", default=None,
                    help="exact run dir (no timestamp); use with --resume to "
                         "continue a previous invocation")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0,
                    help="model-init / training RNG seed (reproducibility "
                         "and multi-seed robustness studies)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed before touching devices "
                         "(reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES "
                         "/ JAX_PROCESS_ID or the flags below)")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)

    if args.multihost:
        from diner_tpu.parallel import init_multihost

        init_multihost(args.coordinator, args.num_processes, args.process_id)
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}"
              f" with {jax.local_device_count()} local devices")

    from diner_tpu.cli.build import build_dataset, build_loader, build_diner
    from diner_tpu.core.config import load_config
    from diner_tpu.eval.predict import create_prediction_folder
    from diner_tpu.eval.suite import evaluate_folder
    from diner_tpu.train.loop import train, MetricLogger

    conf = load_config(args.config)
    if args.run_dir:
        # exact directory: reusable across invocations, so --resume can find
        # <run-dir>/ckpts (the reference's trainer ckpt_path analog)
        logdir = Path(args.run_dir)
    else:
        logdir = Path(args.logdir or conf.get("logger", {}).get("kwargs", {})
                      .get("save_dir", "outputs/run")) \
            / time.strftime("%Y%m%d_%H%M%S")
    if jax.process_index() == 0:
        logdir.mkdir(parents=True, exist_ok=True)
        snap = logdir / "config.yaml"
        # resuming with the run dir's own snapshot is the natural resume
        # invocation — shutil.copy raises SameFileError on src == dst
        if Path(args.config).resolve() != snap.resolve():
            shutil.copy(args.config, snap)
    # provenance (the reference snapshots config + src/ into the run dir,
    # src/util/general.py:21-27; a git hash serves the same purpose here)
    try:
        import subprocess

        rev = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                             text=True, cwd=Path(__file__).parent).stdout.strip()
        (logdir / "GIT_REVISION").write_text(rev + "\n")
    except Exception:
        pass

    train_set = build_dataset(conf["data"]["train"], stage="train")
    val_set = build_dataset(conf["data"]["val"], stage="val")
    train_loader = build_loader(conf["data"]["train"], train_set, True)
    model = build_diner(conf, znear=getattr(train_set, "znear"),
                        zfar=getattr(train_set, "zfar"))

    trainer_kw = conf.get("trainer", {}).get("kwargs", {})
    max_steps = args.max_steps or int(trainer_kw.get("max_steps", 100_000))
    val_every = trainer_kw.get("val_check_interval")
    n_score = int(conf.get("optimizer", {}).get("kwargs", {})
                  .get("n_samples_score_eval", 16))

    # jit the val renders ONCE: an eager model.apply dispatches the whole
    # render op-by-op (catastrophic through a remote-TPU tunnel — observed
    # minutes per val); one compiled program renders in well under a second
    @jax.jit
    def _render_batch(variables, arrays, rng):
        return model.apply(variables, arrays, rng, method="render_batch")

    @jax.jit
    def _render_sweep(variables, arrays, rng, target_ext):
        return model.apply(variables, arrays, rng, method="render_batch",
                           target_extrinsics=target_ext)

    # one logger for every validation: a fresh MetricLogger per val call
    # leaks a metrics.jsonl fd and fragments the TB event stream
    val_logger = MetricLogger(logdir)

    def val_fn(state, step):
        eval_dir = logdir / f"eval_{step:06d}"
        visdir = eval_dir / "visualizations"

        def render_fn(batch, seed):
            import jax.numpy as jnp

            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if not isinstance(v, list)}
            variables = {"params": state.params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            return _render_batch(variables, arrays, jax.random.PRNGKey(seed))

        create_prediction_folder(render_fn, val_set, visdir, n_samples=n_score)
        scores = evaluate_folder(visdir, eval_dir)
        val_logger.log(step, {f"valscores_{k}": v
                              for k, v in scores.items()})

        # cam-sweep videos (diner.py:328-330), when configured and supported
        sweep_kw = dict(conf.get("optimizer", {}).get("kwargs", {})
                        .get("cam_sweep_settings", {}))
        if sweep_kw and hasattr(val_set, "get_cam_sweep_extrinsics"):
            from diner_tpu.eval.sweep import create_cam_sweep
            import jax.numpy as jnp

            def sweep_render(batch, target_ext, seed):
                arrays = {k: jnp.asarray(v) for k, v in batch.items()
                          if not isinstance(v, list)}
                variables = {"params": state.params}
                if state.batch_stats is not None:
                    variables["batch_stats"] = state.batch_stats
                return _render_sweep(variables, arrays,
                                     jax.random.PRNGKey(seed),
                                     jnp.asarray(target_ext))

            create_cam_sweep(sweep_render, val_set, eval_dir / "cam_sweeps",
                             **sweep_kw)

    opt_conf = conf.get("optimizer", {}).get("kwargs", {})
    train(model, train_loader, logdir,
          lr=float(opt_conf.get("lr", 1e-4)),
          opt_kwargs={k: opt_conf[k] for k in
                      ("lr_schedule", "lr_decay_steps", "lr_warmup_steps")
                      if k in opt_conf},
          max_steps=max_steps,
          ckpt_every=int(conf.get("checkpointing", {}).get("kwargs", {})
                         .get("every_n_train_steps", 10_000)),
          val_every=_resolve_val_every(val_every, train_loader),
          val_fn=val_fn, resume=args.resume, seed=args.seed)
    print(f"training done -> {logdir}")


if __name__ == "__main__":
    main()
