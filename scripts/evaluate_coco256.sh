#!/usr/bin/env bash
# Zero-shot COCO-2014 evaluation, GigaGAN protocol (role of reference
# evaluate_SiD_t2i_coco256.sh): 30k caption-prompted one-step images at
# 512px, downsampled to 256 for FID/CLIP against the prepared COCO val set.
#
# Usage: scripts/evaluate_coco256.sh <snapshot> <base_model_dir> <coco256_dir> [outdir]
set -euo pipefail

SNAPSHOT="$1"
BASE="$2"
COCO="$3"
OUTDIR="${4:-image_experiment/eval_$(basename "$SNAPSHOT" | tr . _)}"

# 1. Generate the 30k eval images (seeds 0-29999 = caption indices).
python -m sid_lsg_tpu.cli.generate_onestep \
  --outdir "$OUTDIR/images" --seeds 0-29999 --batch "${SIDLSG_EVAL_BATCH:-64}" \
  --network "$SNAPSHOT" --repo_id "$BASE" \
  --text_prompts prompts/captions.txt --init_timestep 625

# 2. FID + CLIP score at 256px.
python -m sid_lsg_tpu.cli.sid_metrics \
  --metrics fid_clip_30k_full --data "$COCO" --network "$SNAPSHOT" \
  --repo_id "$BASE" --outdir "$OUTDIR" --resolution 256
