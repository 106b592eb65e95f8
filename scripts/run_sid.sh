#!/usr/bin/env bash
# SiD-LSG distillation recipes (role of reference run_sid.sh:61-191).
# One JAX process per host drives all local TPU chips; no torchrun.
#
# Usage: scripts/run_sid.sh {sd15|sd15_bf16|sd21|sd21_bf16} [kappa] [extra flags...]
set -euo pipefail

PRESET="${1:-sd15}"; shift || true
KAPPA="${1:-1.5}"; shift || true

COMMON=(
  --outdir image_experiment/sid-lsg-train-runs
  --data "${SIDLSG_PROMPTS:-aesthetics_6_plus.txt}"
  --batch 512 --batch-micro "${SIDLSG_MICROBATCH:-32}"
  --glr 1e-6 --lr 1e-6
  --cfg_train_fake "$KAPPA" --cfg_eval_fake "$KAPPA" --cfg_eval_real "$KAPPA"
  --init_timestep 625 --tmin 20 --tmax 980 --alpha 1
  --ema 500 --tick 10 --snap 50 --dump 500
  --metrics fid_clip_30k_full --metric_data "${SIDLSG_COCO:-/data/coco256}"
)

case "$PRESET" in
  # fp32 matches the paper numbers (reference run_sid.sh:38-42).
  sd15)       MODEL=(--sd_model "${SD15_PATH:-runwayml/stable-diffusion-v1-5}" --bf16 0) ;;
  sd15_bf16)  MODEL=(--sd_model "${SD15_PATH:-runwayml/stable-diffusion-v1-5}" --bf16 1 --fsdp "${SIDLSG_FSDP:-4}") ;;
  sd21)       MODEL=(--sd_model "${SD21_PATH:-stabilityai/stable-diffusion-2-1-base}" --bf16 0) ;;
  sd21_bf16)  MODEL=(--sd_model "${SD21_PATH:-stabilityai/stable-diffusion-2-1-base}" --bf16 1 --fsdp "${SIDLSG_FSDP:-4}") ;;
  *) echo "unknown preset $PRESET"; exit 1 ;;
esac

exec python -m sid_lsg_tpu.cli.sid_train "${COMMON[@]}" "${MODEL[@]}" "$@"
