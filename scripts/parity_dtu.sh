#!/usr/bin/env bash
# Real-artifact DTU parity runner: given a released reference DINER Lightning
# checkpoint and a prepared DTU root (with *_TransMVSNet.png depth priors),
# renders the deterministic eval subset through the ported model, scores it,
# and prints the reference-vs-port metric table.
#
# Reference flow being reproduced end to end:
#   python_scripts/create_prediction_folder.py:30-49 (render prediction
#   folder from ckpt) + evaluate_prediction_folder.py (PSNR/SSIM/L1/L2/LPIPS).
# North-star gate (BASELINE.md): PSNR within 0.1 dB and LPIPS within 0.005 of
# the reference pipeline on the same subset.
#
# Usage:
#   scripts/parity_dtu.sh --ckpt path/to/diner_dtu.ckpt --data path/to/DTU \
#       [--out outputs/parity_dtu] [--n 100] [--nsamples N] \
#       [--lpips lpips_vgg.npz] [--ref-pred DIR] [--ref-scores JSON] \
#       [--time-reference REF_DIR [--ref-python PY] [--ref-config YAML]] \
#       [--ref-timing JSON]
#
#   --ref-pred:   a prediction folder rendered by the REFERENCE code (if you
#                 have one) — scored with the same scorer for a true
#                 same-subset comparison.
#   --ref-scores: alternatively, a JSON of published/known reference means
#                 {"psnr": ..., "ssim": ..., "lpips": ...}.
#   --time-reference: path to a malteprinzler/diner checkout; times the
#                 reference renderer itself on the same subset via
#                 scripts/time_reference_render.py and emits measured rays/s
#                 next to ours — retiring bench.py's estimated 50k rays/s
#                 denominator. Use --ref-python to point at the reference
#                 environment's python (the reference needs torchvision etc.,
#                 which this repo's env does not ship).
#   --ref-timing: alternatively, a JSON already produced by
#                 time_reference_render.py on the reference machine.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
CKPT="" DATA="" OUT="outputs/parity_dtu" N="" NSAMPLES="" LPIPS="" REF_PRED="" REF_SCORES=""
CONFIG="$REPO/configs/train_dtu.yaml" DS_KWARGS="{}"
TIME_REF="" REF_PYTHON="python" REF_CONFIG="" REF_TIMING=""

while [[ $# -gt 0 ]]; do
  case "$1" in
    --ckpt) CKPT="$2"; shift 2;;
    --data) DATA="$2"; shift 2;;
    --out) OUT="$2"; shift 2;;
    --n) N="$2"; shift 2;;
    --nsamples) NSAMPLES="$2"; shift 2;;
    --lpips) LPIPS="$2"; shift 2;;
    --ref-pred) REF_PRED="$2"; shift 2;;
    --ref-scores) REF_SCORES="$2"; shift 2;;
    --config) CONFIG="$2"; shift 2;;
    --dataset-kwargs) DS_KWARGS="$2"; shift 2;;
    --time-reference) TIME_REF="$2"; shift 2;;
    --ref-python) REF_PYTHON="$2"; shift 2;;
    --ref-config) REF_CONFIG="$2"; shift 2;;
    --ref-timing) REF_TIMING="$2"; shift 2;;
    *) echo "unknown arg $1"; exit 2;;
  esac
done
[[ -n "$CKPT" && -n "$DATA" ]] || { echo "need --ckpt and --data"; exit 2; }

mkdir -p "$OUT"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

# 1. write a config override pointing the datasets at $DATA
python - "$CONFIG" "$DATA" "$OUT/config.yaml" "$DS_KWARGS" <<'PY'
import json, sys, yaml
conf_path, data_root, out_path, ds_kwargs = sys.argv[1:]
conf = yaml.safe_load(open(conf_path))
extra = json.loads(ds_kwargs)
for split in ("train", "val"):
    kw = conf["data"][split]["dataset"]["kwargs"]
    kw["root"] = data_root
    kw.update(extra)
yaml.safe_dump(conf, open(out_path, "w"))
PY

# 2. render the deterministic eval subset with the ported checkpoint + score
ARGS=(--config "$OUT/config.yaml" --torch-ckpt "$CKPT" --out "$OUT/port")
[[ -n "$N" ]] && ARGS+=(--n "$N")
[[ -n "$NSAMPLES" ]] && ARGS+=(--nsamples "$NSAMPLES")
[[ -n "$LPIPS" ]] && ARGS+=(--lpips "$LPIPS")
python -m diner_tpu.cli.render_eval "${ARGS[@]}"

# 3. score the reference prediction folder with the SAME scorer (if given)
if [[ -n "$REF_PRED" ]]; then
  SARGS=(score "$REF_PRED")
  [[ -n "$LPIPS" ]] && SARGS+=(--lpips "$LPIPS")
  python -m diner_tpu.cli.eval_folder "${SARGS[@]}"
fi

# 3b. time the reference renderer itself on the same subset (if an env given)
if [[ -n "$TIME_REF" ]]; then
  TARGS=(--ref-dir "$TIME_REF" --ckpt "$CKPT"
         --config "${REF_CONFIG:-$TIME_REF/configs/evaluate_diner_on_dtu.yaml}"
         --out "$OUT/reference_timing.json")
  [[ -n "$N" ]] && TARGS+=(--n "$N")
  "$REF_PYTHON" "$REPO/scripts/time_reference_render.py" "${TARGS[@]}"
  REF_TIMING="$OUT/reference_timing.json"
fi

# 4. side-by-side table + gate check
python - "$OUT/port" "$REF_PRED" "$REF_SCORES" "$REF_TIMING" <<'PY'
import json, sys
from pathlib import Path

port_dir, ref_pred, ref_scores, ref_timing = sys.argv[1:]
port = json.loads((Path(port_dir) / "average_scores.json").read_text())
ref = None
if ref_pred:
    ref = json.loads((Path(ref_pred) / "average_scores.json").read_text())
elif ref_scores:
    ref = json.loads(Path(ref_scores).read_text())

cols = [k for k in ("psnr", "ssim", "lpips", "l1", "l2") if k in port]
print("\n== DTU parity table ==")
print(f"{'metric':<8}{'port':>12}" + (f"{'reference':>12}{'delta':>12}" if ref else ""))
ok = True
for k in cols:
    row = f"{k:<8}{port[k]:>12.4f}"
    if ref and k in ref:
        d = port[k] - ref[k]
        row += f"{ref[k]:>12.4f}{d:>+12.4f}"
        if k == "psnr" and abs(d) > 0.1:
            ok = False
        if k == "lpips" and abs(d) > 0.005:
            ok = False
    print(row)
if ref_timing:
    tm = json.loads(Path(ref_timing).read_text())
    print(f"\nreference renderer (measured): "
          f"{tm['reference_rays_per_sec']:.1f} rays/s on {tm['device']} "
          f"({tm['frames']} frames) — use this as the vs_baseline "
          f"denominator instead of bench.py's estimate")
if ref:
    print("PARITY GATE:", "PASS (psnr +-0.1 dB, lpips +-0.005)" if ok else "FAIL")
    sys.exit(0 if ok else 1)
if not ref_timing:
    print("(no reference folder/scores given - port metrics only)")
PY
