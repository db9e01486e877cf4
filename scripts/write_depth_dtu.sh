#!/usr/bin/env bash
# Depth-prior writing (reference parity: deps/TransMVSNet/scripts/write_to_dtu.sh:
# ndepths 48,32,8, numdepth 192, DTU scale 872/0.7).
set -euo pipefail
DATAPATH=${1:-data/DTU}
python -m diner_tpu.cli.mvs write --datapath "$DATAPATH" \
  --listfile lists/dtu/trainval.txt --ndepths 48,32,8 --numdepth 192 "${@:2}"
