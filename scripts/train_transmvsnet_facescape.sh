#!/usr/bin/env bash
# MVS cascade training on FaceScape (reference parity:
# scripts/train_TransMVSNet_facescape.sh: ndepths 96,64,16, numdepth 384,
# lrepochs 1,2,3:2, dlossw 1,1,1).
set -euo pipefail
DATAPATH=${1:-data/FACESCAPE_PROCESSED}
LOGDIR=${2:-outputs/transmvsnet_facescape}
python -m diner_tpu.cli.mvs train --dataset facescape --datapath "$DATAPATH" \
  --listfile unused --logdir "$LOGDIR" \
  --ndepths 96,64,16 --numdepth 384 --lr 1e-3 --lrepochs 1,2,3:2 \
  --dlossw 1.0,1.0,1.0 "${@:3}"
