#!/usr/bin/env bash
# MVS cascade training on MultiFace (reference parity:
# condor_scripts/transmvsnet_train_multiface.sub workload).
set -euo pipefail
DATAPATH=${1:-data/MULTIFACE_PROCESSED}
LOGDIR=${2:-outputs/transmvsnet_multiface}
python -m diner_tpu.cli.mvs train --dataset multiface --datapath "$DATAPATH" \
  --listfile unused --logdir "$LOGDIR" \
  --ndepths 96,64,16 --numdepth 384 --lr 1e-3 --lrepochs 1,2,3:2 \
  --dlossw 1.0,1.0,1.0 "${@:3}"
