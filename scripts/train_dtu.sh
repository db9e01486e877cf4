#!/usr/bin/env bash
# DINER training on DTU (reference parity: condor_scripts + scripts/*.sh are
# replaced by plain launchers; multi-host TPU pods call jax.distributed
# internally — run this once per host).
set -euo pipefail
python -m diner_tpu.cli.train configs/train_dtu.yaml "$@"
