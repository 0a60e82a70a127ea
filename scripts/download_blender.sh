#!/usr/bin/env bash
# Fetch the NeRF-synthetic (Blender) dataset into data/nerf_synthetic
# (parity: reference scripts/download_blender.sh). The official archive is
# hosted on the NeRF authors' drive; a direct mirror is used here.
set -euo pipefail

DATA_DIR="${1:-data}"
mkdir -p "${DATA_DIR}"
cd "${DATA_DIR}"

URL="https://drive.google.com/uc?id=18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG"
if command -v gdown >/dev/null 2>&1; then
    gdown "${URL}" -O nerf_synthetic.zip
else
    echo "gdown not found; trying curl mirror..."
    curl -L -o nerf_synthetic.zip \
        "https://huggingface.co/datasets/nerf-synthetic/lego/resolve/main/nerf_synthetic.zip" ||
        { echo "download failed — fetch nerf_synthetic.zip manually"; exit 1; }
fi
unzip -q nerf_synthetic.zip
rm -f nerf_synthetic.zip
echo "done: ${DATA_DIR}/nerf_synthetic"
