#!/bin/bash
# Download Toronto-3D into $1/Toronto3D.
set -euo pipefail
BASE_DIR="${1:?usage: download_toronto3d.sh <output_dir>}/Toronto3D"
mkdir -p "$BASE_DIR"
cd "$BASE_DIR"
wget -c -O Toronto_3D.zip "https://xx9lca.sn.files.1drv.com/Toronto_3D.zip" || \
  echo "See https://github.com/WeikaiTan/Toronto-3D for current download links."
unzip -o Toronto_3D.zip || true
