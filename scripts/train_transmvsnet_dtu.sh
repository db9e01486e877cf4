#!/usr/bin/env bash
# MVS cascade training (reference parity: scripts/train_TransMVSNet_dtu.sh).
set -euo pipefail
DATAPATH=${1:-data/DTU}
LOGDIR=${2:-outputs/transmvsnet_dtu}
python -m diner_tpu.cli.mvs train --datapath "$DATAPATH" \
  --listfile lists/dtu/train.txt --logdir "$LOGDIR" \
  --ndepths 48,32,8 --numdepth 192 --lr 1e-3 --lrepochs 10,12,14:2 \
  --dlossw 0.5,1.0,2.0 "${@:3}"
