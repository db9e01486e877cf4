"""Device-mode exactness check for the Pallas TPU kernels (ADVICE r4).

The bf16 3-way-split MXU remap in `diner_tpu/sampler/pallas_likelihood.py`
claims BIT-EXACT f32 selection (load-bearing for the |d - z| < ddm gate;
hardware bf16 quantization of the MXU's default f32 path was observed to
flip the gate on v5e). This script verifies that claim ON DEVICE against a
numpy `take_along_axis` oracle:

  1. selection core (d / std / cos through the concat+dot layout) —
     must be BITWISE equal to numpy on device;
  2. the full likelihood output vs a scipy-erf oracle — within the A&S
     7.1.26 polynomial tolerance (1e-5);
  3. the one-hot remap kernel (exact and bf16 modes) — device vs interpret.

NOTE (r5 finding, results/parity_diag_r5.json): Pallas INTERPRET mode is
the *inexact* path for the bf16-operand dot — its CPU lowering rounds the
chunk products (max err ~bf16 ULP), while the device MXU accumulates them
exactly. Device-vs-interpret bitwise comparison of the likelihood kernel is
therefore the WRONG contract; the oracle must be numpy. The elementwise
tail (gates + A&S erf, incl. exp) IS bitwise identical device-vs-interpret.

The pytest suite runs on forced-CPU (tests/conftest.py) where device mode is
unavailable, so this lives as a script; the committed artifact is
results/pallas_device_parity_r5.json.

Usage: python scripts/check_pallas_device_parity.py [--out out.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from scipy.special import erf as scipy_erf


def _inputs(rng, G=128, A=96, NC=1000):
    depth = rng.rand(G, A).astype(np.float32) * 2.0 + 1.0
    std = rng.rand(G, A).astype(np.float32) * 0.3
    std[rng.rand(G, A) < 0.2] = 0.0
    cos = (rng.rand(G, A).astype(np.float32) - 0.7)
    a = np.sort(rng.randint(0, A, (G, NC)), axis=-1)
    z = rng.rand(G, NC).astype(np.float32) * 2.0 + 1.0
    hs = rng.rand(G, 1).astype(np.float32) * 0.01 + 0.001
    return depth, std, cos, a, z, hs


def _selection_debug(a, vals, what, tg=8):
    """The production kernel's concat+dot selection core, outputting the
    selected channel instead of the likelihood."""
    G, NC = a.shape
    A = vals.shape[-1]

    def kernel(a_ref, vals_ref, o_ref):
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, NC), 0)
        dims = (((1,), (0,)), ((), ()))
        rows = []
        for g in range(tg):
            onehot = (iota_a == a_ref[g, :][None, :]).astype(jnp.bfloat16)
            v = vals_ref[g]
            v1 = v.astype(jnp.bfloat16)
            r1 = v - v1.astype(jnp.float32)
            v2 = r1.astype(jnp.bfloat16)
            v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
            v9 = jnp.concatenate([v1, v2, v3], axis=0)
            d9 = jax.lax.dot_general(v9, onehot, dims,
                                     preferred_element_type=jnp.float32)
            dsc = d9[0:3] + d9[3:6] + d9[6:9]
            rows.append(dsc[what:what + 1])
        o_ref[...] = jnp.concatenate(rows, axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, NC), jnp.float32),
        grid=(G // tg,),
        in_specs=[pl.BlockSpec((tg, NC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tg, 3, A), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tg, NC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM))(a, vals)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/pallas_device_parity_r5.json")
    args = ap.parse_args()

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        raise SystemExit("needs a real TPU device (got cpu)")

    from diner_tpu.sampler.pallas_likelihood import likelihood_from_anchors
    from diner_tpu.sampler.pallas_remap import remap_anchors_pallas

    rng = np.random.RandomState(5)
    report = {"device": str(dev), "checks": {}}

    depth, std, cos, a_np, z_np, hs_np = _inputs(rng)
    vals = jnp.asarray(np.stack([depth, std, cos], axis=1))
    a = jnp.asarray(a_np)

    # 1. selection core bitwise vs numpy (the load-bearing claim)
    for what, name, table in ((0, "d", depth), (1, "std", std),
                              (2, "cos", cos)):
        got = np.asarray(_selection_debug(a, vals, what))
        ref = np.take_along_axis(table, a_np, axis=-1)
        report["checks"][f"selection_{name}_bitwise_vs_numpy"] = {
            "pass": bool(np.array_equal(got.view(np.uint32),
                                        ref.view(np.uint32))),
            "max_abs_diff": float(np.abs(got - ref).max()),
        }

    # 2. full likelihood vs scipy-erf oracle (A&S poly tol 1e-5)
    out = np.asarray(likelihood_from_anchors(
        a, vals, jnp.asarray(z_np), jnp.asarray(hs_np), 0.5, tg=8))
    d = np.take_along_axis(depth, a_np, axis=-1)
    s = np.take_along_axis(std, a_np, axis=-1)
    c = np.take_along_axis(cos, a_np, axis=-1)
    valid = (c <= 0) & (np.abs(d - z_np) < 0.5) & (s != 0)
    sstd = np.where(s == 0, 1.0, s) * math.sqrt(2.0)
    hi = scipy_erf((z_np + hs_np - d) / sstd)
    lo = scipy_erf((z_np - hs_np - d) / sstd)
    ref_p = np.where(valid, 0.5 * np.abs(hi - lo), 0.0)
    report["checks"]["likelihood_vs_scipy_oracle"] = {
        "pass": bool(np.abs(out - ref_p).max() < 1e-5),
        "max_abs_diff": float(np.abs(out - ref_p).max()),
        "gate_flips": int(((out == 0) != (ref_p == 0)).sum()),
    }

    # 3. remap kernel device vs interpret (both modes are exact here: the
    # f32 path has no bf16 operands, the bf16 path rounds identically)
    G, A = 256, 96
    v = jnp.asarray(rng.rand(G, 3, A).astype(np.float32) * 3.0 - 1.0)
    ids = jnp.asarray(rng.randint(0, A, (G, 1000)))
    for exact in (True, False):
        dv = np.asarray(remap_anchors_pallas(ids, v, tg=8, exact=exact))
        it = np.asarray(remap_anchors_pallas(ids, v, tg=8, exact=exact,
                                             interpret=True))
        report["checks"][f"remap_exact{exact}_bitwise_dev_vs_interpret"] = {
            "pass": bool(np.array_equal(dv.view(np.uint32),
                                        it.view(np.uint32))),
            "max_abs_diff": float(np.abs(dv - it).max()),
        }

    ok = all(c["pass"] for c in report["checks"].values())
    report["all_pass"] = ok
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))
    if not ok:
        raise SystemExit("DEVICE PARITY FAILURE — see report")


if __name__ == "__main__":
    main()
