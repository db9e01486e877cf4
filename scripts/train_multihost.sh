#!/usr/bin/env bash
# Multi-host DINER training launcher (reference analog:
# deps/TransMVSNet/scripts/train_TransMVSNet_dtu.sh + torch.distributed.launch).
#
# Run ONCE PER HOST (e.g. via your scheduler or gcloud compute tpus ssh --worker=all):
#   JAX_COORDINATOR_ADDRESS=<host0>:8476 JAX_NUM_PROCESSES=<N> \
#   JAX_PROCESS_ID=<rank> scripts/train_multihost.sh configs/train_dtu.yaml out/
# On Cloud TPU pods, the three env vars are discovered automatically and
# `--multihost` alone suffices.
set -euo pipefail
CONFIG=${1:?usage: train_multihost.sh <config.yaml> <logdir>}
LOGDIR=${2:?usage: train_multihost.sh <config.yaml> <logdir>}
exec python -m diner_tpu.cli.train "$CONFIG" --logdir "$LOGDIR" --multihost
