#!/usr/bin/env bash
# Depth-prior writing for FaceScape (reference parity:
# deps/TransMVSNet/scripts/write_to_facescape.sh: ndepths 96,64,16,
# numdepth 384, 4 views, metric scale).
set -euo pipefail
DATAPATH=${1:-data/FACESCAPE_PROCESSED}
python -m diner_tpu.cli.mvs write --dataset facescape --datapath "$DATAPATH" \
  --listfile unused --ndepths 96,64,16 --numdepth 384 "${@:2}"
