#!/bin/bash
# Download the real CHM13 HiFi per-chromosome dataset (~43 GB compressed,
# ~182 GB unpacked). Faithful executable port of the reference's
# download_dataset.sh:1-51: the same five Dropbox chunk URLs published by
# the reference authors, reassembled with `zip --fix` and unzipped.
#
# Usage: scripts/download_dataset.sh <data_path>
# Timing quoted by the reference: download ~1h20m, unzip ~20m.
set -uo pipefail

DIR=${1:-data}
mkdir -p "$DIR"
cd "$DIR"

# Chunk URLs carried verbatim from the reference (download_dataset.sh:18-32).
declare -A CHUNKS=(
  [genomic_dataset_chunk.z01]="https://www.dropbox.com/s/fa14gza4cf9dsk3/genomic_dataset_chunk.z01?dl=1"
  [genomic_dataset_chunk.z02]="https://www.dropbox.com/s/i8pftsjmbpkj1a0/genomic_dataset_chunk.z02?dl=1"
  [genomic_dataset_chunk.z03]="https://www.dropbox.com/s/udlqbypizummctq/genomic_dataset_chunk.z03?dl=1"
  [genomic_dataset_chunk.z04]="https://www.dropbox.com/s/2qzbswupfg90tbq/genomic_dataset_chunk.z04?dl=1"
  [genomic_dataset_chunk.zip]="https://www.dropbox.com/s/0suo9k6fhtdg4p3/genomic_dataset_chunk.zip?dl=1"
)

for part in genomic_dataset_chunk.z01 genomic_dataset_chunk.z02 \
            genomic_dataset_chunk.z03 genomic_dataset_chunk.z04 \
            genomic_dataset_chunk.zip; do
  if [ ! -f "$part" ]; then
    echo -e "\nDownloading $part..."
    curl "${CHUNKS[$part]}" -o "$part" -J -L -k
  fi
done

# Reassemble the split archive (reference download_dataset.sh:35-38):
# `zip --fix` stitches the .z01-.z04 + .zip chunks into one archive.
echo -e "\nAssembling genomic_dataset.zip (46GB)..."
zip --fix genomic_dataset_chunk --out genomic_dataset

echo -e "\nUnzipping genomic_dataset.zip (182GB)..."
unzip genomic_dataset.zip

rm -f genomic_dataset_chunk.z01 genomic_dataset_chunk.z02 \
      genomic_dataset_chunk.z03 genomic_dataset_chunk.z04 \
      genomic_dataset_chunk.zip genomic_dataset.zip

# Per-chromosome directory layout the pipeline expects under <data>/real/.
mkdir -p real
for i in $(seq 1 22) X; do
  mkdir -p "real/chr$i/raw" "real/chr$i/processed" "real/chr$i/info" \
           "real/chr$i/builder_output"
done

echo -e "Dataset downloaded, unzipped and ready to use.\n"
