#!/usr/bin/env bash
# DTU MVS evaluation: per-scan depth/conf writing then point-cloud fusion
# (reference parity: deps/TransMVSNet/scripts/test_dtu.sh -> test.py
# save_scene_depth + filter; ndepths 48,32,8, interval_scale 1.06).
set -euo pipefail
TESTPATH=${1:-data/dtu_test}
OUTDIR=${2:-outputs/dtu_testing}
CKPT=${3:-}
EXTRA=()
[ -n "$CKPT" ] && EXTRA+=(--ckpt "$CKPT")
python -m diner_tpu.cli.mvs eval --datapath "$TESTPATH" \
  --testlist lists/dtu/test.txt --outdir "$OUTDIR" \
  --ndepths 48,32,8 --numdepth 192 --interval_scale 1.06 "${EXTRA[@]}"
python -m diner_tpu.cli.mvs fuse --datapath "$TESTPATH" \
  --testlist lists/dtu/test.txt --outdir "$OUTDIR" --method normal
