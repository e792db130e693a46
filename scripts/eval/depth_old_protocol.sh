#!/usr/bin/env bash
# CVPR v1-0 protocol: 50 denoising steps, ensemble 10
set -e
ckpt=${1:-"prs-eth/marigold-depth-v1-0"}
out=${2:-"output/eval_old"}
python -m marigold_tpu.cli.benchmark --modality depth --benchmark all \
    --checkpoint "$ckpt" --output_dir "$out" --old_protocol --parity ${PARITY_LIMIT:+--limit "$PARITY_LIMIT"}
