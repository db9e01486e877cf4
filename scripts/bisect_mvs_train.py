"""Bisect the MVS train-step TPU compile failure and measure reduced-shape
steps/s (VERDICT r3 missing #4).

Round 3 found the full DTU-recipe fwd+bwd+adam program (512x640, ndepths
48/32/8, 192 hypotheses, 5 views) fails in this sandbox's remote-compile
helper (HTTP 500) while the writer (forward-only) compiles fine. This script
walks a shape ladder through `bench_mvs.py --train --skip-infer` (one
subprocess per attempt so a helper crash can't take the sweep down),
recording train steps/s where the step compiles and the error where it
doesn't — locating WHICH dimension kills the helper.

It then projects full-recipe steps/s from the largest compiling shape via
the forward-FLOPs ratio between the two shapes (XLA cost_analysis of the
forward program, which compiles at every shape; a train step is fwd + bwd
~= 3x fwd FLOPs at any shape, so the ratio cancels the factor).

Usage: python scripts/bisect_mvs_train.py [--out results/mvs_train_bisect.json]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

LADDER = [
    # (shape, ndepths, numdepth, views) — ascending program size
    ("64x64", "16,8,8", 64, 4),
    ("128x160", "16,8,8", 64, 5),
    ("128x160", "48,32,8", 192, 5),
    ("256x320", "48,32,8", 192, 5),
    ("512x640", "16,8,8", 64, 5),
    ("512x640", "48,32,8", 192, 5),  # the full DTU write/train recipe
]


def attempt(shape, ndepths, numdepth, views, iters, timeout):
    cmd = [sys.executable, str(REPO / "bench_mvs.py"), "--train",
           "--skip-infer", "--iters", str(iters), "--shape", shape,
           "--ndepths", ndepths, "--numdepth", str(numdepth),
           "--views", str(views)]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"outcome": "timeout", "timeout_s": timeout}
    line = None
    for ln in r.stdout.splitlines():
        if ln.startswith("{"):
            line = json.loads(ln)
    if line is None:
        return {"outcome": "crash", "rc": r.returncode,
                "stderr_tail": r.stderr[-400:]}
    if "train_steps_per_sec" in line:
        return {"outcome": "ok",
                "train_steps_per_sec": line["train_steps_per_sec"]}
    return {"outcome": "train_error",
            "error": line.get("train_error", "?")}


def forward_flops(shape, ndepths, numdepth, views):
    """XLA cost-analysis FLOPs of the forward cascade at a shape (the
    forward compiles at every ladder shape — the writer runs it daily)."""
    import bench_mvs

    import jax

    bench_mvs.H, bench_mvs.W = (int(x) for x in shape.split("x"))
    bench_mvs.V = views
    bench_mvs.NDEPTHS = tuple(int(x) for x in ndepths.split(","))
    bench_mvs.NUMDEPTH = numdepth
    net, variables, imgs, projs, dvals = bench_mvs._setup()

    def infer(variables, imgs, projs, dvals):
        out = net.apply(variables, imgs, projs, dvals)
        return out["depth"]

    comp = jax.jit(infer).lower(variables, imgs, projs, dvals).compile()
    return float(comp.cost_analysis()["flops"])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--out", default="results/mvs_train_bisect.json")
    args = ap.parse_args(argv)

    rungs = []
    best = None
    for shape, nd, numd, v in LADDER:
        print(f"attempting train step @ {shape} ndepths={nd} "
              f"numdepth={numd} views={v}", flush=True)
        res = attempt(shape, nd, numd, v, args.iters, args.timeout)
        res.update(shape=shape, ndepths=nd, numdepth=numd, views=v)
        print(json.dumps(res), flush=True)
        rungs.append(res)
        if res["outcome"] == "ok":
            best = res

    out = {"ladder": rungs}
    if best is not None and rungs[-1]["outcome"] != "ok":
        print("computing forward-FLOPs projection...", flush=True)
        f_best = forward_flops(best["shape"], best["ndepths"],
                               best["numdepth"], best["views"])
        full = LADDER[-1]
        f_full = forward_flops(*full)
        proj = best["train_steps_per_sec"] * f_best / f_full
        out["projection"] = {
            "basis_shape": best["shape"],
            "basis_steps_per_sec": best["train_steps_per_sec"],
            "fwd_flops_basis": f_best,
            "fwd_flops_full": f_full,
            "flops_ratio": round(f_full / f_best, 2),
            "projected_full_recipe_steps_per_sec":
                round(proj, 3),
            "note": "train step ~= 3x fwd FLOPs at any shape, so the fwd "
                    "ratio cancels; projection assumes equal MXU/HBM "
                    "utilization across shapes (larger shapes utilize "
                    "better, so this is a LOWER bound)",
        }
    import jax

    out["device"] = str(jax.devices()[0])
    line = json.dumps(out)
    print(line)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
