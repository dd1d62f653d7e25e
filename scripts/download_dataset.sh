#!/bin/bash
# Download the real CHM13 HiFi per-chromosome dataset (43 GB compressed,
# ~180 GB unpacked) — reference: download_dataset.sh:1-51 (5 zip chunks
# from Dropbox, reassembled and unzipped into <data>/real/chr*/raw/).
#
# Usage: scripts/download_dataset.sh <data_path>
set -euo pipefail

DATA_PATH=${1:-data}
REAL_PATH="$DATA_PATH/real"
mkdir -p "$REAL_PATH"
cd "$REAL_PATH"

# Chunked archive published by the reference authors (download_dataset.sh:20-32).
URLS=(
  "https://www.dropbox.com/s/fhjpicacvg0y6d8/real_chm13_chunks.zip.001?dl=1"
  "https://www.dropbox.com/s/lgndwzsvn4mirxb/real_chm13_chunks.zip.002?dl=1"
  "https://www.dropbox.com/s/6t9jwhtkhb9wuram/real_chm13_chunks.zip.003?dl=1"
  "https://www.dropbox.com/s/jpw0gnpstzdvv2o/real_chm13_chunks.zip.004?dl=1"
  "https://www.dropbox.com/s/jgrtvzfhnh43zwo/real_chm13_chunks.zip.005?dl=1"
)

echo "Downloading 5 chunks (~43 GB total; reference quotes ~1h20m)..."
i=1
for url in "${URLS[@]}"; do
  part="real_chm13_chunks.zip.$(printf '%03d' "$i")"
  if [ ! -f "$part" ]; then
    curl -L --retry 5 -o "$part" "$url"
  fi
  i=$((i+1))
done

echo "Reassembling and unzipping (~20m)..."
cat real_chm13_chunks.zip.* > real_chm13.zip
unzip -o real_chm13.zip
rm -f real_chm13.zip real_chm13_chunks.zip.*

# normalize per-chromosome directory layout expected by the pipeline
for i in $(seq 1 22) X; do
  mkdir -p "chr$i/raw" "chr$i/processed" "chr$i/info" "chr$i/builder_output"
done

echo "Done: $REAL_PATH"
