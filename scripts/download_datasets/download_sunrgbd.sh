#!/bin/bash
# Download SUN RGB-D (scans + 2D/3D box metadata + toolbox) into $1/sunrgbd
# (reference scripts/download_datasets/download_sunrgbd.sh). Run
# scripts/preprocess_sunrgbd.py afterwards to produce the reader format.
set -euo pipefail
BASE_DIR="${1:?usage: download_sunrgbd.sh <output_dir>}/sunrgbd"
mkdir -p "$BASE_DIR"
cd "$BASE_DIR"
for f in SUNRGBD.zip SUNRGBDMeta2DBB_v2.mat SUNRGBDMeta3DBB_v2.mat \
         SUNRGBDtoolbox.zip; do
  wget -c --no-check-certificate "http://rgbd.cs.princeton.edu/data/$f"
done
unzip -o SUNRGBD.zip
unzip -o SUNRGBDtoolbox.zip
mkdir -p zip_files && mv SUNRGBD.zip SUNRGBDtoolbox.zip zip_files/
echo "SUN RGB-D ready at $BASE_DIR"
