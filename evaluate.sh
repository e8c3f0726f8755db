#!/usr/bin/env bash
# Canonical inference entry (reference surface: /root/reference/evaluate.sh).
# Usage: ./evaluate.sh <wav_or_mp4> [speaker] [ckpt] [dataset_root]
set -euo pipefail

EVAL_INPUT="${1:?usage: evaluate.sh <wav> [speaker] [ckpt] [dataset_root]}"
SPEAKER="${2:-m1}"
CKPT="${3:-experiments/results/latest/last.ckpt}"
DATASET_ROOT="${4:-/tmp/synth_voca_dgrad}"

python -m sdfa_tpu evaluate \
  --custom_hparams dgrad \
  --dataset_root "${DATASET_ROOT}" \
  --load_from "${CKPT}" \
  --eval_input "${EVAL_INPUT}" \
  --eval_spk_cond "${SPEAKER}" \
  --output_dir evaluate_results
