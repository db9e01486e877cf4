"""jax.profiler trace of the certified flagship render path; prints top
device ops by total time (parsed from the trace json).

Usage: python scripts/trace_flagship.py [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/flagship_trace")
    args = ap.parse_args(argv)

    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.geometry import gen_rays
    from diner_tpu.renderer import render_image
    from diner_tpu.utils.jitinit import jit_init

    nerf, cfg = bench._certified_model_and_cfg()
    H, W = bench.H, bench.W

    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=H, W=W)
    batch = to_device_batch(collate([ds[0]]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}

    variables = jit_init(nerf.init)(
        jax.random.PRNGKey(0), batch["src_rgbs"], batch["src_depths"],
        batch["src_depth_stds"], batch["src_extrinsics"],
        batch["src_intrinsics"], jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3)))

    def run(variables, batch, rng):
        enc = nerf.apply(variables, batch["src_rgbs"], batch["src_depths"],
                         batch["src_depth_stds"], batch["src_extrinsics"],
                         batch["src_intrinsics"], method="encode")
        rays = gen_rays(batch["target_extrinsics"],
                        batch["target_intrinsics"], W, H, ds.znear, ds.zfar)
        fieldfn = lambda p, d, aux=None: nerf.apply(variables, enc, p, d, aux,
                                                    method="field")
        return render_image(fieldfn, rng, rays, enc, cfg,
                            chunk=cfg.eval_chunk_rays)

    # warm
    out = jax.block_until_ready(run(variables, batch, jax.random.PRNGKey(0)))
    with jax.profiler.trace(args.trace_dir):
        out = jax.block_until_ready(run(variables, batch,
                                        jax.random.PRNGKey(1)))
        np.asarray(out[0].ravel()[0])

    files = glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    for f in files[-1:]:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pids = {p["pid"]: p.get("args", {}).get("name", str(p.get("pid")))
                for p in data.get("traceEvents", [])
                if p.get("ph") == "M" and p.get("name") == "process_name"}
        by_name = {}
        total = 0.0
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X" or not e.get("dur"):
                continue
            pname = pids.get(e.get("pid"), "")
            if "TPU" not in pname and "/device" not in pname.lower():
                continue
            by_name.setdefault(e["name"], [0.0, 0])
            by_name[e["name"]][0] += e["dur"]
            by_name[e["name"]][1] += 1
            total += e["dur"]
        rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])
        print(f"total device us: {total:.0f}")
        for name, (dur, n) in rows[: args.top]:
            print(f"{dur / 1e3:10.2f} ms  {n:5d}x  {100 * dur / total:5.1f}%"
                  f"  {name[:110]}")


if __name__ == "__main__":
    main()
