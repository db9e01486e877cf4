"""Dump the optimized HLO of the certified flagship render program and print
the named fusions' root expressions (to attribute trace_flagship.py's
per-fusion device times to source ops).

Usage: python scripts/dump_flagship_hlo.py [--grep fusion.341,fusion.324]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (sets up compilation cache)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--grep", default="fusion.341,fusion.324,fusion.342,"
                                      "fusion.331,fusion.343,fusion.344")
    ap.add_argument("--out", default="/tmp/flagship_hlo.txt")
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

    @jax.jit
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

    txt = run.lower(variables, batch, jax.random.PRNGKey(0)) \
             .compile().as_text()
    Path(args.out).write_text(txt)
    print(f"wrote {args.out} ({len(txt)} chars)")

    wanted = args.grep.split(",")
    for name in wanted:
        # fusion computation bodies are named `%fused_computation.N`; the
        # call site is `%fusion.N = ... fusion(...), calls=%fused_...`
        pat = re.compile(rf"%{re.escape(name)} = [^\n]*", re.S)
        m = pat.search(txt)
        if not m:
            print(f"\n== {name}: NOT FOUND")
            continue
        print(f"\n== {name}:")
        print(m.group(0)[:700])
        # search the FULL instruction line (not a char-capped window) so
        # long operand lists can't push `calls=` out of reach
        cm = re.search(r"calls=%?([\w.\-]+)", m.group(0))
        if cm:
            body = re.search(
                rf"^(%?{re.escape(cm.group(1))}[^\n]*\n(?:.+\n)*?}})",
                txt, re.M)
            if body:
                lines = body.group(1).splitlines()
                # print the heavy ops inside the fusion body
                heavy = [l for l in lines if re.search(
                    r"gather|dot|convolution|sort|scatter|reduce|iota|"
                    r"transpose|exponential|power|tanh|erf|rsqrt|divide",
                    l)]
                print(f"  body: {len(lines)} lines; heavy ops:")
                for l in heavy[:25]:
                    print("   ", l.strip()[:180])


if __name__ == "__main__":
    main()
