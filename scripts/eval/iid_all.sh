#!/usr/bin/env bash
set -e
appearance_ckpt=${1:-"prs-eth/marigold-iid-appearance-v1-1"}
lighting_ckpt=${2:-"prs-eth/marigold-iid-lighting-v1-1"}
out=${3:-"output/eval"}
python -m marigold_tpu.cli.benchmark --modality iid --benchmark appearance_interiorverse \
    --checkpoint "$appearance_ckpt" --output_dir "$out" --parity ${PARITY_LIMIT:+--limit "$PARITY_LIMIT"}
python -m marigold_tpu.cli.benchmark --modality iid --benchmark lighting_hypersim \
    --checkpoint "$lighting_ckpt" --output_dir "$out" --parity ${PARITY_LIMIT:+--limit "$PARITY_LIMIT"}
