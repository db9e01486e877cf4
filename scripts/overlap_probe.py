"""Does XLA/TPU overlap an HBM-bound gather with MXU matmuls in one program?

Times gather-only, matmul-only, and a combined program with independent
gather+matmul. If t_combined ~= max(tg, tm) the scheduler overlaps and
software-pipelining the render loop pays; if ~= tg+tm it doesn't.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from diner_tpu.utils.profiling import setup_compilation_cache

setup_compilation_cache()

N_ROWS = 43008          # ~192x224 latent pixels
C = 2048                # quad-packed 512ch bf16
N_GATHER = 1_310_720    # 8192 rays * 40 samples * 4 views
M, K, NN = 1_310_720 // 8, 512, 512


def bench(f, *a, iters=5):
    def run():
        out = jax.block_until_ready(f(*a))
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])  # axon: force real completion readback

    run(); run()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return min(ts)


key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (N_ROWS, C), jnp.bfloat16)
idx = jax.random.randint(key, (N_GATHER,), 0, N_ROWS)
a = jax.random.normal(key, (M, K), jnp.bfloat16)
w = jax.random.normal(key, (K, NN), jnp.bfloat16)


@jax.jit
def g(table, idx):
    return jnp.take(table, idx, axis=0).sum(axis=0)


@jax.jit
def m(a, w):
    x = a
    for _ in range(10):
        x = jnp.tanh(x @ w)
    return x.sum()


@jax.jit
def both(table, idx, a, w):
    return g(table, idx), m(a, w)


tg = bench(g, table, idx)
tm = bench(m, a, w)
tb = bench(both, table, idx, a, w)
print({"gather_ms": round(tg * 1e3, 2), "matmul_ms": round(tm * 1e3, 2),
       "both_ms": round(tb * 1e3, 2),
       "overlap_frac": round((tg + tm - tb) / min(tg, tm), 3)})
