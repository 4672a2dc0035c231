#!/usr/bin/env bash
# Fetch the reference PyTorch checkpoints (imported on the fly by our loader).
# Mirrors reference download.sh.
set -euo pipefail
DIR=${1:-checkpoints}
mkdir -p "$DIR"; cd "$DIR"
BASE_SAM2="https://dl.fbaipublicfiles.com/segment_anything_2/092824"
wget -nc "$BASE_SAM2/sam2.1_hiera_tiny.pt"
# MedSAM2 fine-tunes (Hugging Face wanglab/MedSAM2)
for f in MedSAM2_latest.pt MedSAM2_US_Heart.pt MedSAM2_MRI_LiverLesion.pt \
         MedSAM2_CTLesion.pt medsam2_FLARE25_RECIST_baseline.pt; do
  wget -nc "https://huggingface.co/wanglab/MedSAM2/resolve/main/$f" || true
done
