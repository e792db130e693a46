#!/usr/bin/env bash
set -e
ckpt=${1:-"prs-eth/marigold-normals-v1-1"}
out=${2:-"output/eval"}
python -m marigold_tpu.cli.benchmark --modality normals --benchmark all \
    --checkpoint "$ckpt" --output_dir "$out" --parity ${PARITY_LIMIT:+--limit "$PARITY_LIMIT"}
