#!/bin/bash
# Download Semantic3D (semantic-8) into $1/Semantic3D.
set -euo pipefail
BASE_DIR="${1:?usage: download_semantic3d.sh <output_dir>}/Semantic3D"
mkdir -p "$BASE_DIR"
cd "$BASE_DIR"
for url in \
  http://semantic3d.net/data/sem8_data_training.7z \
  http://semantic3d.net/data/sem8_labels_training.7z ; do
  wget -c "$url" || echo "see http://semantic3d.net for current links"
done
7z x -y sem8_data_training.7z || true
7z x -y sem8_labels_training.7z || true
