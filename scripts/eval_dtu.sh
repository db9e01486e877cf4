#!/usr/bin/env bash
# Usage: scripts/eval_dtu.sh <ckpt_dir> <outdir> [--n N]
set -euo pipefail
CKPT=$1; OUT=$2; shift 2
python -m diner_tpu.cli.render_eval --config configs/evaluate_diner_on_dtu.yaml \
  --ckpt "$CKPT" --out "$OUT" "$@"
