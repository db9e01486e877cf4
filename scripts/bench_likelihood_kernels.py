"""Device microbench: likelihood kernel v1 (separate chord stage + remap
kernel) vs v2 (fused chord kernel, two-level remap) across tile sizes.

r4 decomposition (results/decompose_likelihood_r4.json): chord 2.8 ms /
gather 8.0 ms / kernel 6.9 ms per 4096-ray chunk at flagship shape. v2
targets the chord stage (folded in-register) and the kernel's dominant VPU
cost (the A*NC one-hot build, replaced by an (A/8 + 8)*NC two-level build).

Usage: python scripts/bench_likelihood_kernels.py [--chunk 4096]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (compilation cache)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(looped, *args, iters=4, warmup=2, K=10):
    out = looped(*args)
    np.asarray(out)
    times = []
    for _ in range(warmup + iters):
        t0 = time.perf_counter()
        out = looped(*args)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times[warmup:])) / K * 1e3


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default="results/bench_likelihood_kernels_r5.json")
    args = ap.parse_args(argv)
    K = args.reps

    from diner_tpu.sampler.pallas_likelihood import (likelihood_from_anchors,
                                                    likelihood_from_chord)

    SB, NV, NR, NC, A = 1, 4, args.chunk, 1000, 96
    G = SB * NV * NR
    rng = np.random.RandomState(7)

    depth = rng.rand(G, A).astype(np.float32) * 2.0 + 1.0
    std = rng.rand(G, A).astype(np.float32) * 0.3
    std[rng.rand(G, A) < 0.2] = 0.0
    cos = (rng.rand(G, A).astype(np.float32) - 0.7)
    vals_g = jnp.asarray(np.stack([depth, std, cos], axis=1))       # (G,3,A)
    a_ids = jnp.asarray(np.sort(rng.randint(0, A, (G, NC)), axis=-1))
    z_cam = jnp.asarray(rng.rand(G, NC).astype(np.float32) * 2.0 + 1.0)
    half = jnp.asarray(rng.rand(G, 1).astype(np.float32) * 0.01 + 0.001)

    z = jnp.asarray(rng.rand(SB, NR, NC).astype(np.float32) * 2.0 + 1.0)
    scal = np.zeros((SB, NV, NR, 8), np.float32)
    scal[..., 0] = 0.5 + rng.rand(SB, NV, NR)        # w0
    scal[..., 1] = rng.rand(SB, NV, NR) * 0.5        # w1
    scal[..., 2] = rng.rand(SB, NV, NR)              # P0
    scal[..., 3] = rng.rand(SB, NV, NR) * 0.2        # P1
    scal[..., 4] = 1.0 + rng.rand(SB, NV, NR)        # inv_dd
    scal[..., 5] = 1.0                               # dd_ok
    scal[..., 6] = 1.0                               # chord_ok
    scal[..., 7] = 0.005                             # half_step
    scal = jnp.asarray(scal)
    vals_c = jnp.asarray(vals_g.reshape(SB, NV, NR, 3, A))

    def loop(body):
        @jax.jit
        def run(*xs):
            def f(i, acc):
                return acc + body(i, *xs)
            return jax.lax.fori_loop(0, K, f, jnp.float32(0.0))
        return run

    results = {"chunk": args.chunk, "A": A, "NC": NC}

    for tg in (8, 16, 32):
        def v1_body(i, a_, v_, zc_, h_, _tg=tg):
            v = v_ * (1.0 + i.astype(v_.dtype) * 1e-12)
            p = likelihood_from_anchors(a_, v, zc_, h_, 0.5, tg=_tg)
            return p.ravel()[0]

        try:
            t = timed(loop(v1_body), a_ids, vals_g, z_cam, half, K=K)
            results[f"v1_tg{tg}_ms"] = round(t, 3)
        except Exception as e:  # noqa: BLE001
            results[f"v1_tg{tg}_ms"] = f"FAIL: {type(e).__name__}"
        print(json.dumps({f"v1_tg{tg}": results[f"v1_tg{tg}_ms"]}), flush=True)

    for tg in (8, 16, 32):
        for lo_w in (8, 16):
            def v2_body(i, z_, s_, v_, _tg=tg, _lo=lo_w):
                v = v_ * (1.0 + i.astype(v_.dtype) * 1e-12)
                p = likelihood_from_chord(z_, s_, v, A, 0.5, tg=_tg, lo_w=_lo)
                return p.ravel()[0]

            key = f"v2_tg{tg}_lo{lo_w}_ms"
            try:
                results[key] = round(timed(loop(v2_body), z, scal, vals_c,
                                           K=K), 3)
            except Exception as e:  # noqa: BLE001
                results[key] = f"FAIL: {type(e).__name__}"
            print(json.dumps({key: results[key]}), flush=True)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
