#!/bin/bash
# Download Paris-Lille-3D into $1/ParisLille3D.
set -euo pipefail
BASE_DIR="${1:?usage: download_parislille3d.sh <output_dir>}/ParisLille3D"
mkdir -p "$BASE_DIR"
echo "Register at https://npm3d.fr/paris-lille-3d to obtain download links,"
echo "then place training_10_classes/ and test_10_classes/ under $BASE_DIR."
