"""Score an existing prediction folder, or compare several evaluations.

Behavioral reference: python_scripts/evaluate_prediction_folder.py:1-14
(re-score `<eval>/visualizations` in place) and the `compare_evaluations`
entry in src/evaluation/eval_suite.py:127-385 of malteprinzler/diner.

  # re-score a prediction folder (…/visualizations with *-pred/-gt pairs)
  python -m diner_tpu.cli.eval_folder score <eval_dir> [--lpips w.npz]

  # multi-model comparison report (violins, example sheets, diff plots)
  python -m diner_tpu.cli.eval_folder compare out/ nameA=<evalA> nameB=<evalB>
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("score")
    ps.add_argument("eval_dir", help="dir containing visualizations/")
    ps.add_argument("--lpips", default=None,
                    help="ported LPIPS-VGG weights (.npz; scripts/port_lpips.py)")

    pc = sub.add_parser("compare")
    pc.add_argument("outdir")
    pc.add_argument("runs", nargs="+", help="name=<eval_dir> pairs")
    pc.add_argument("--n-examples", type=int, default=3)

    args = ap.parse_args(argv)
    if args.cmd == "score":
        from diner_tpu.eval.suite import evaluate_folder

        lpips_fn = None
        if args.lpips:
            from diner_tpu.nn.lpips import load_lpips_npz, make_lpips_fn

            lpips_fn = make_lpips_fn(load_lpips_npz(args.lpips))
        eval_dir = Path(args.eval_dir)
        scores = evaluate_folder(eval_dir / "visualizations", eval_dir,
                                 lpips_fn=lpips_fn)
        for k, v in sorted(scores.items()):
            print(f"{k}: {v:.4f}")
        return 0

    names, dirs = [], []
    for run in args.runs:
        name, _, d = run.partition("=")
        if not d:
            raise SystemExit(f"expected name=<eval_dir>, got {run!r}")
        names.append(name)
        dirs.append(Path(d))
    from diner_tpu.eval.compare import compare_evaluations

    compare_evaluations(dirs, names, Path(args.outdir),
                        n_examples=args.n_examples)
    print(f"comparison written to {args.outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
