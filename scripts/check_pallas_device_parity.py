"""Device-vs-interpret parity check for the Pallas TPU kernels.

ADVICE r4: the stacked (9, A) bf16-split dot's bitwise-exactness claim in
`diner_tpu/sampler/pallas_likelihood.py` — load-bearing for the
|d - z| < ddm gate (hardware bf16 quantization of the MXU's default f32
path was observed to flip the gate on v5e) — was only covered by the
interpret-mode test. This script runs the SAME inputs through
interpret=True and interpret=False on a real TPU and asserts the outputs
are bitwise identical, so future Mosaic/MXU lowering changes to the
concat+dot layout can't silently reintroduce gate flips. Also checks the
one-hot remap kernel (exact and bf16 modes).

The pytest suite runs on forced-CPU (tests/conftest.py), where
interpret=False Pallas is unavailable, so this lives as a script the
round's TPU session runs; the committed artifact is
results/pallas_device_parity_r5.json.

Usage: python scripts/check_pallas_device_parity.py [--out out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _likelihood_inputs(rng, G=128, A=96, NC=1000):
    depth = rng.rand(G, A).astype(np.float32) * 2.0 + 1.0
    std = rng.rand(G, A).astype(np.float32) * 0.3
    std[rng.rand(G, A) < 0.2] = 0.0
    cos = (rng.rand(G, A).astype(np.float32) - 0.7)
    vals = jnp.asarray(np.stack([depth, std, cos], axis=1))
    a = jnp.asarray(np.sort(rng.randint(0, A, (G, NC)), axis=-1))
    z_cam = jnp.asarray(rng.rand(G, NC).astype(np.float32) * 2.0 + 1.0)
    half_step = jnp.asarray(rng.rand(G, 1).astype(np.float32) * 0.01 + 0.001)
    return a, vals, z_cam, half_step


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

    a, vals, z, hs = _likelihood_inputs(rng)
    out_dev = np.asarray(likelihood_from_anchors(a, vals, z, hs, 0.5, tg=8))
    out_int = np.asarray(likelihood_from_anchors(a, vals, z, hs, 0.5, tg=8,
                                                 interpret=True))
    bitwise = bool(np.array_equal(
        out_dev.view(np.uint32), out_int.view(np.uint32)))
    report["checks"]["likelihood_bitwise_dev_vs_interpret"] = {
        "pass": bitwise,
        "max_abs_diff": float(np.abs(out_dev - out_int).max()),
        "n_mismatch_bits": int(
            (out_dev.view(np.uint32) != out_int.view(np.uint32)).sum()),
    }

    G, A = 256, 96
    v = jnp.asarray(rng.rand(G, 3, A).astype(np.float32) * 3.0 - 1.0)
    ids = jnp.asarray(rng.randint(0, A, (G, 1000)))
    for exact in (True, False):
        d = np.asarray(remap_anchors_pallas(ids, v, tg=8, exact=exact))
        i = np.asarray(remap_anchors_pallas(ids, v, tg=8, exact=exact,
                                            interpret=True))
        key = f"remap_exact{exact}_bitwise_dev_vs_interpret"
        report["checks"][key] = {
            "pass": bool(np.array_equal(d.view(np.uint32), i.view(np.uint32))),
            "max_abs_diff": float(np.abs(d - i).max()),
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
