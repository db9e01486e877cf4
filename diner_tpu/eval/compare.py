"""Multi-model evaluation comparison plots.

Behavioral reference: src/evaluation/eval_suite.py:127-385
(compare_evaluations) in malteprinzler/diner: violin plots of per-sample
metric distributions across models, side-by-side example sheets, and
biggest-L1-difference example plots. Offline analysis tooling over the
detailed_report.json files written by evaluate_folder.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from diner_tpu.eval.suite import REPORT_DETAIL_FILENAME, SUFFIXES

METRIC_OPT = dict(l1="-", l2="-", lpips="-", psnr="+", ssim="+")


def load_detailed_report(report_dir):
    return json.loads((Path(report_dir) / REPORT_DETAIL_FILENAME).read_text())


def compare_evaluations(report_dirs, names, outdir, n_examples: int = 5):
    """report_dirs: list of dirs containing detailed_report.json; names: model
    labels. Writes violin plots + biggest-difference example sheets."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import imageio.v2 as imageio

    outdir = Path(outdir)
    os.makedirs(outdir, exist_ok=True)
    reports = [load_detailed_report(d) for d in report_dirs]
    metrics = [k for k in reports[0][0] if k != "path"]

    # violin plots per metric
    fig, axes = plt.subplots(1, len(metrics), figsize=(4 * len(metrics), 4))
    for ax, metric in zip(np.atleast_1d(axes), metrics):
        data = [[row[metric] for row in rep] for rep in reports]
        ax.violinplot(data, showmedians=True)
        ax.set_xticks(range(1, len(names) + 1))
        ax.set_xticklabels(names, rotation=30)
        ax.set_title(f"{metric} ({METRIC_OPT.get(metric, '?')})")
    fig.tight_layout()
    fig.savefig(outdir / "metric_violins.png", dpi=120)
    plt.close(fig)

    # biggest per-sample l1 difference between first two models
    if len(reports) >= 2 and "l1" in metrics:
        by_stem = lambda rep: {Path(r["path"]).name: r for r in rep}
        a, b = by_stem(reports[0]), by_stem(reports[1])
        common = sorted(set(a) & set(b),
                        key=lambda s: abs(a[s]["l1"] - b[s]["l1"]),
                        reverse=True)[:n_examples]
        rows = []
        for stem in common:
            imgs = []
            for rep, root in ((a, report_dirs[0]), (b, report_dirs[1])):
                p = Path(rep[stem]["path"])
                if not p.exists():
                    continue
                imgs.append(imageio.imread(p)[..., :3])
                gt_p = p.parent / p.name.replace(SUFFIXES["pred"], SUFFIXES["gt"])
                if gt_p.exists() and len(imgs) == 1:
                    imgs.insert(0, imageio.imread(gt_p)[..., :3])
            if imgs:
                h = min(i.shape[0] for i in imgs)
                rows.append(np.concatenate([i[:h] for i in imgs], axis=1))
        if rows:
            w = max(r.shape[1] for r in rows)
            rows = [np.pad(r, ((0, 0), (0, w - r.shape[1]), (0, 0))) for r in rows]
            imageio.imwrite(outdir / "biggest_l1_differences.png",
                            np.concatenate(rows, axis=0))
    return outdir
