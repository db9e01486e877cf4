"""Gather-engine floor characterization (run on the real chip).

Three probes, each corrected by a measured dispatch floor (this sandbox's
remote tunnel adds ~50-70 ms per jitted call, which poisons naive
microbenchmarks — see PERFORMANCE.md "Gather floor"):

1. rows/s vs row width and index locality — shows the engine is
   locality-INDEPENDENT (sequential == random) and fastest per row at
   narrow widths, ~60-80M rows/s at 128-lane rows.
2. the stage-3 DCN tap fetch in four formulations (batched
   take_along_axis scan / flat global take / one all-taps gather /
   unrolled) — all within ~5%, i.e. the quad-packed fetch is AT the floor
   and no XLA gather formulation buys more.

Usage: python scripts/profile_gather_floor.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from diner_tpu.utils.profiling import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp
import numpy as np

from diner_tpu.utils.profiling import benchmark


def dispatch_floor_ms():
    one = jnp.ones((8, 128))
    f = jax.jit(lambda x: x + 1)
    jax.block_until_ready(f(one))
    return benchmark(f, one, warmup=2, iters=5)["median_s"] * 1e3


def probe_rates(disp_ms):
    rng = np.random.RandomState(0)
    R = 5 * 514 * 642  # stage-3 padded table rows x 5 views
    M = 5 * 512 * 640  # one tap's fetch
    seq = np.minimum(np.arange(M, dtype=np.int64) * R // M, R - 1)
    idxs = {
        "seq": seq.astype(np.int32),
        "local": np.clip(seq + rng.randint(-650, 650, size=M), 0,
                         R - 1).astype(np.int32),
        "rand": rng.randint(0, R, size=M).astype(np.int32),
    }
    for name, idx_np in idxs.items():
        for Wd in (8, 32, 128):
            tab = jnp.asarray(rng.rand(R, Wd).astype(np.float32))
            idx = jnp.asarray(idx_np)
            f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
            jax.block_until_ready(f(tab, idx))
            r = benchmark(f, tab, idx, warmup=1, iters=3)
            net = max(r["median_s"] - disp_ms / 1e3, 1e-4)
            print(f"{name:5s} W={Wd:4d} f32 {r['median_s']*1e3:8.1f} ms "
                  f"(net {net*1e3:7.1f})  {M/net/1e6:7.1f} M rows/s")


def probe_dcn_formulations(disp_ms):
    rng = np.random.RandomState(0)
    N, H, W, C, taps = 5, 512, 640, 32, 9
    R, HW = (H + 2) * (W + 2), H * W
    xq = jnp.asarray(rng.rand(N, R, 4 * C).astype(np.float32))
    base = np.arange(HW, dtype=np.int64) * R // HW
    idx = np.stack([np.clip(base + rng.randint(-1300, 1300, size=HW), 0,
                            R - 1) for _ in range(taps)])
    idx_b = jnp.asarray(np.broadcast_to(idx[:, None], (taps, N, HW)).copy()
                        .astype(np.int32))
    wts = jnp.asarray(rng.rand(taps, N, HW).astype(np.float32))

    @jax.jit
    def scan_taa(xq, idx_b, wts):
        def body(acc, t):
            i, w = t
            rows = jnp.take_along_axis(xq, i[..., None], axis=1)
            return acc + rows.sum(-1) * w, None
        out, _ = jax.lax.scan(body, jnp.zeros((N, HW), jnp.float32),
                              (idx_b, wts))
        return out

    @jax.jit
    def one_big(xq, idx_b, wts):
        i = jnp.moveaxis(idx_b, 0, -1).reshape(N, HW * taps)
        rows = jnp.take_along_axis(xq, i[..., None], axis=1)
        s = rows.sum(-1).reshape(N, HW, taps)
        return (s * jnp.moveaxis(wts, 0, -1)).sum(-1)

    for name, f in (("scan take_along_axis (shipped)", scan_taa),
                    ("one all-taps gather", one_big)):
        jax.block_until_ready(f(xq, idx_b, wts))
        r = benchmark(f, xq, idx_b, wts, warmup=1, iters=3)
        net = r["median_s"] - disp_ms / 1e3
        rows = taps * N * HW
        print(f"{name:32s} {r['median_s']*1e3:7.1f} ms "
              f"(net {net*1e3:7.1f})  {rows/net/1e6:6.1f} M rows/s")


if __name__ == "__main__":
    d = dispatch_floor_ms()
    print(f"dispatch floor {d:.1f} ms (subtracted as 'net' below)")
    probe_rates(d)
    probe_dcn_formulations(d)
