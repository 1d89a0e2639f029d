#!/bin/bash
# Download SemanticKITTI (velodyne scans + labels) into $1/SemanticKITTI.
set -euo pipefail
BASE_DIR="${1:?usage: download_semantickitti.sh <output_dir>}/SemanticKITTI"
mkdir -p "$BASE_DIR"
cd "$BASE_DIR"
wget -c http://www.semantic-kitti.org/assets/data_odometry_labels.zip
wget -c https://s3.eu-central-1.amazonaws.com/avg-kitti/data_odometry_velodyne.zip
unzip -o data_odometry_velodyne.zip -d dataset_tmp
unzip -o data_odometry_labels.zip -d dataset_tmp
mkdir -p dataset && mv dataset_tmp/dataset/* dataset/ && rm -rf dataset_tmp
echo "SemanticKITTI ready at $BASE_DIR/dataset"
