#!/usr/bin/env bash
# Canonical depth zero-shot suite (reference script/depth/eval/0_infer_eval_all.sh role)
set -e
ckpt=${1:-"prs-eth/marigold-depth-v1-1"}
out=${2:-"output/eval"}
python -m marigold_tpu.cli.benchmark --modality depth --benchmark all \
    --checkpoint "$ckpt" --output_dir "$out" --parity ${PARITY_LIMIT:+--limit "$PARITY_LIMIT"}
