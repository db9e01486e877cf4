"""MVS feature-path profiling on the real chip: where do the ~3.0 s of
feature+FMT (bench_mvs --components) go? Usage:

    python scripts/profile_mvs.py dcn         # DCNLayer per stage vs plain conv
    python scripts/profile_mvs.py featnet     # FeatureNet forward per view
    python scripts/profile_mvs.py fmt         # FMT on 5 views of stage1 feats

Each experiment prints one JSON line per case.
"""

from __future__ import annotations

import json
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diner_tpu.utils.profiling import benchmark, setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp
import numpy as np


def report(name, res, **extra):
    print(json.dumps({"exp": name, "median_ms": round(res["median_s"] * 1e3, 2),
                      **extra}), flush=True)


# stage shapes for the DTU writer workload (512x640, base_channels=8):
# stage3 /1 8ch, stage2 /2 16ch, stage1 /4 32ch
STAGES = {"s3": (512, 640, 8), "s2": (256, 320, 16), "s1": (128, 160, 32)}


def run_dcn():
    from diner_tpu.mvs.layers import ConvBnRelu, DCNLayer
    from diner_tpu.utils.jitinit import jit_init

    for name, (H, W, C) in STAGES.items():
        x = jnp.asarray(np.random.RandomState(0).rand(1, H, W, C),
                        jnp.float32)
        layer = DCNLayer(C)
        v = jit_init(layer.init)(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda v, x: layer.apply(v, x))
        report(f"dcn_{name}", benchmark(f, v, x, warmup=2, iters=5),
               shape=[H, W, C])

        conv = ConvBnRelu(C)
        cv = jit_init(conv.init)(jax.random.PRNGKey(0), x)
        g = jax.jit(lambda v, x: conv.apply(v, x))
        report(f"conv_{name}", benchmark(g, cv, x, warmup=2, iters=5),
               shape=[H, W, C])


def run_featnet():
    from diner_tpu.mvs.feature_net import FeatureNet
    from diner_tpu.utils.jitinit import jit_init

    x = jnp.asarray(np.random.RandomState(0).rand(1, 512, 640, 3), jnp.float32)
    net = FeatureNet(base_channels=8)
    v = jit_init(net.init)(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda v, x: net.apply(v, x))
    report("featnet_1view", benchmark(f, v, x, warmup=2, iters=5))


def run_fmt():
    from diner_tpu.mvs.fmt import FMTWithPathway
    from diner_tpu.utils.jitinit import jit_init

    V = 5
    rng = np.random.RandomState(0)
    feats = [{f"stage{3 - i}": jnp.asarray(rng.rand(1, H, W, C), jnp.float32)
              for i, (H, W, C) in enumerate(STAGES.values())}
             for _ in range(V)]
    fmt = FMTWithPathway(base_channels=8)
    v = jit_init(fmt.init)(jax.random.PRNGKey(0), feats)
    f = jax.jit(lambda v, feats: fmt.apply(v, feats))
    report("fmt_pathway_5views", benchmark(f, v, feats, warmup=2, iters=5))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "dcn"
    {"dcn": run_dcn, "featnet": run_featnet, "fmt": run_fmt}[which]()
