#!/bin/bash
# Download ShapeNet part segmentation into $1/ShapeNet
# (reference scripts/download_datasets/download_shapenet.sh).
set -euo pipefail
BASE_DIR="${1:?usage: download_shapenet.sh <output_dir>}/ShapeNet"
mkdir -p "$BASE_DIR"
cd "$BASE_DIR"
ZIP=shapenetcore_partanno_segmentation_benchmark_v0.zip
wget -c --no-check-certificate \
  "https://shapenet.cs.stanford.edu/ericyi/$ZIP"
unzip -o "$ZIP"
mkdir -p zip_files && mv "$ZIP" zip_files/
echo "ShapeNet ready at $BASE_DIR"
