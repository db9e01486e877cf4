"""Microbenchmark: row-gather formulations at the flagship latent shape.

The certified render path's dominant op is the quad-latent bilinear fetch:
655k row-gathers of 4C=2048 channels per 4096-ray chunk from a
(NV=4, 192*224, 2048) bf16 table. This sweeps formulations/dtypes/widths to
find the fastest XLA lowering (and the hardware rate to target with Pallas).

Usage: python scripts/microbench_gather.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from diner_tpu.utils.profiling import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

NV, HW, C4 = 4, 192 * 224, 2048
N = 163840  # rays(4096) * samples(40) per chunk, per view


K = 20  # in-jit repetitions: amortizes the tunnel's host-fetch RTT


def bench(fn, *args, iters=4, warmup=2):
    """Times K in-jit repetitions of fn (looped via fori_loop inside one
    program) and returns seconds per single application.

    axon tunnel caveats: block_until_ready returns at enqueue, so a host fetch
    of one output element is the real fence — but that fetch costs a full
    tunnel RTT (~30 ms), so single-shot timings are RTT-dominated. Looping
    K times inside the program amortizes the RTT to K-th."""

    @jax.jit
    def looped(*a):
        def body(i, acc):
            out = fn(i, *a)
            return acc + out.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    out = looped(*args)
    np.asarray(out)
    times = []
    for _ in range(warmup + iters):
        t0 = time.perf_counter()
        out = looped(*args)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    del out
    return float(np.median(times[warmup:])) / K


def report(name, dt, rows, bytes_per_row):
    gb = rows * bytes_per_row / 1e9
    print(json.dumps({
        "case": name, "ms": round(dt * 1e3, 2),
        "mrows_per_s": round(rows / dt / 1e6, 1),
        "eff_gb_per_s": round(gb / dt, 1)}), flush=True)


def main():
    key = jax.random.PRNGKey(0)
    tbl_bf16 = jax.random.normal(key, (NV, HW, C4), jnp.bfloat16)
    idx = jax.random.randint(key, (NV, N), 0, HW)
    w = jax.random.uniform(key, (NV, N, 4))

    # each case takes the fori_loop index i and perturbs the indices with it,
    # so XLA cannot hoist the gather out of the loop

    # 1. current: batched take_along_axis + blend to C
    def batched_taa(i, tbl, idx, w):
        idx_i = (idx + i) % HW
        rows = jnp.take_along_axis(tbl, idx_i[..., None], axis=1, mode="clip")
        C = C4 // 4
        w = w.astype(rows.dtype)
        return (rows[..., :C] * w[..., 0:1] + rows[..., C:2 * C] * w[..., 1:2]
                + rows[..., 2 * C:3 * C] * w[..., 2:3]
                + rows[..., 3 * C:] * w[..., 3:4])

    dt = bench(batched_taa, tbl_bf16, idx, w)
    report("batched_taa_bf16_blend", dt, NV * N, C4 * 2)

    # 2. gather only, no blend (isolate)
    def gather_only(i, tbl, idx):
        idx_i = (idx + i) % HW
        return jnp.take_along_axis(tbl, idx_i[..., None], axis=1, mode="clip")

    dt = bench(gather_only, tbl_bf16, idx)
    report("batched_taa_bf16_raw", dt, NV * N, C4 * 2)

    # 3. flattened single gather (fold view into row index)
    tbl_flat = tbl_bf16.reshape(NV * HW, C4)
    idx_flat = (idx + jnp.arange(NV)[:, None] * HW).reshape(-1)

    def flat_take(i, tbl, idx):
        return jnp.take(tbl, (idx + i) % tbl.shape[0], axis=0)

    dt = bench(flat_take, tbl_flat, idx_flat)
    report("flat_take_bf16", dt, NV * N, C4 * 2)

    # 4. dtype sweep on the flat gather
    for dtype, nbytes in ((jnp.int8, 1), (jnp.float32, 4)):
        tbl_d = tbl_flat.astype(dtype)
        dt = bench(flat_take, tbl_d, idx_flat)
        report(f"flat_take_{dtype.__name__}", dt, NV * N, C4 * nbytes)

    # 5. width sweep at bf16 (same total rows)
    for c in (256, 512, 1024):
        tbl_c = tbl_flat[:, :c]
        dt = bench(flat_take, tbl_c, idx_flat)
        report(f"flat_take_bf16_c{c}", dt, NV * N, c * 2)

    # 6. 4x rows of C=512 (the unpacked 4-corner formulation, rows only)
    tbl_512 = tbl_flat[:, :512]
    idx4 = jnp.concatenate([idx_flat] * 4)
    dt = bench(flat_take, tbl_512, idx4)
    report("flat_take_bf16_4x_c512", dt, 4 * NV * N, 512 * 2)

    # 7. sorted indices (locality): does the gather unit exploit it?
    idx_sorted = jnp.sort(idx_flat)

    def flat_take_nowrap(i, tbl, idx):
        # keep sortedness: shift, don't wrap (clip instead)
        return jnp.take(tbl, jnp.minimum(idx + i, tbl.shape[0] - 1), axis=0)

    dt = bench(flat_take_nowrap, tbl_flat, idx_sorted)
    report("flat_take_bf16_sorted", dt, NV * N, C4 * 2)

    # 8. contiguous rows probe (pure copy upper bound for the gather unit)
    idx_contig = jnp.arange(NV * N, dtype=jnp.int32) % (NV * HW)
    dt = bench(flat_take, tbl_flat, idx_contig)
    report("flat_take_bf16_contig", dt, NV * N, C4 * 2)

    # 9. one-hot matmul alternative at narrow width (MXU instead of gather):
    # segment the table into T=1024-row tiles; per sample, matmul a one-hot
    # against its tile. FLOPs = rows * T * C — only plausible at small C.
    def onehot_mm(i, tbl, idx):
        T = 1024
        idx_i = (idx + i) % tbl.shape[0]
        tile = idx_i // T
        within = idx_i - tile * T
        # gather of TILES is contiguous-ish; emulate cost with a plain gather
        # of tile starts + onehot matmul inside the tile
        oh = jax.nn.one_hot(within, T, dtype=tbl.dtype)  # (R, T)
        # all samples hit tile 0 for the FLOP probe (upper bound on MXU rate)
        return oh @ tbl[:T]

    dt = bench(onehot_mm, tbl_flat[:, :512], idx_flat[:65536])
    report("onehot_mm_bf16_c512_65k", dt, 65536, 512 * 2)


if __name__ == "__main__":
    main()
