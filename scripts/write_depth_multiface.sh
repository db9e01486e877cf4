#!/usr/bin/env bash
# Depth-prior writing for MultiFace (reference parity:
# deps/TransMVSNet/scripts/write_to_multiface.sh).
set -euo pipefail
DATAPATH=${1:-data/MULTIFACE_PROCESSED}
python -m diner_tpu.cli.mvs write --dataset multiface --datapath "$DATAPATH" \
  --listfile unused --ndepths 96,64,16 --numdepth 384 "${@:2}"
