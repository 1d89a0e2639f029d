#!/bin/bash
# Download KITTI 3D object detection (velodyne + calib + labels) into $1/KITTI.
set -euo pipefail
BASE_DIR="${1:?usage: download_kitti.sh <output_dir>}/KITTI"
mkdir -p "$BASE_DIR"
cd "$BASE_DIR"
for f in data_object_velodyne.zip data_object_calib.zip data_object_label_2.zip; do
  wget -c "https://s3.eu-central-1.amazonaws.com/avg-kitti/$f"
  unzip -o "$f"
done
echo "KITTI ready at $BASE_DIR (training/ + testing/)"
