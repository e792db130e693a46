#!/usr/bin/env bash
# Download published Marigold checkpoints from HF hub into $BASE_CKPT_DIR
# (role of reference script/download_weights.sh; requires network access).
set -e
ckpt_dir=${BASE_CKPT_DIR:-"checkpoint"}
mkdir -p "$ckpt_dir"
for repo in prs-eth/marigold-depth-v1-1 prs-eth/marigold-normals-v1-1 \
            prs-eth/marigold-iid-appearance-v1-1 prs-eth/marigold-iid-lighting-v1-1 \
            stabilityai/stable-diffusion-2; do
    name=$(basename "$repo")
    if [ -d "$ckpt_dir/$name" ]; then echo "exists: $name"; continue; fi
    echo "downloading $repo ..."
    python - <<PY
from huggingface_hub import snapshot_download
snapshot_download("$repo", local_dir="$ckpt_dir/$name")
PY
done
