#!/usr/bin/env bash
set -euo pipefail
python -m diner_tpu.cli.train configs/train_facescape.yaml "$@"
