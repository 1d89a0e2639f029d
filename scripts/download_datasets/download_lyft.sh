#!/bin/bash
# Download the Lyft Level-5 3D object detection dataset into $1/Lyft and
# lay it out as v1.01-train / v1.01-test the way the Lyft reader expects
# (reference scripts/download_datasets/download_lyft.sh). Run
# scripts/preprocess_lyft.py afterwards.
set -euo pipefail
BASE_DIR="${1:?usage: download_lyft.sh <output_dir>}/Lyft"
mkdir -p "$BASE_DIR"
cd "$BASE_DIR"
S3=https://lyft-l5-datasets-public.s3-us-west-2.amazonaws.com/3d-object-detection
for f in train.tar test.tar; do
  wget -c "$S3/$f"
  tar -xf "$f"
done
mkdir -p tar_files && mv train.tar test.tar tar_files/
for split in train test; do
  mkdir -p "v1.01-$split"
  mv "${split}_data"   "v1.01-$split/data"
  mv "${split}_images" "v1.01-$split/images"
  mv "${split}_lidar"  "v1.01-$split/lidar"
  mv "${split}_maps"   "v1.01-$split/maps"
done
echo "Lyft ready at $BASE_DIR (v1.01-train/ + v1.01-test/)"
