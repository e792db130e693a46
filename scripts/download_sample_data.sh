#!/usr/bin/env bash
# Download sample input images (role of reference script/download_sample_data.sh).
set -e
data_dir=${1:-"input"}
mkdir -p "$data_dir/in-the-wild_example"
echo "Place RGB images (.png/.jpg) in $data_dir/in-the-wild_example and run:"
echo "  python -m marigold_tpu.cli.run --modality depth --checkpoint <ckpt> \\"
echo "      --input_rgb_dir $data_dir/in-the-wild_example --output_dir output/in-the-wild_example"
