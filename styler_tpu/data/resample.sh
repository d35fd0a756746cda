#!/usr/bin/env bash
# Resample a corpus tree to the model sample rate (22050 Hz) into a
# mirrored directory layout. Offline prep tool (ffmpeg stays host-side;
# reference equivalent: data/resample.sh).
#
# Usage: resample.sh <in_dir> <out_dir> [sample_rate] [jobs]
set -euo pipefail

IN_DIR=${1:?usage: resample.sh <in_dir> <out_dir> [sample_rate] [jobs]}
OUT_DIR=${2:?usage: resample.sh <in_dir> <out_dir> [sample_rate] [jobs]}
SR=${3:-22050}
JOBS=${4:-16}

export IN_DIR OUT_DIR SR

find "$IN_DIR" -type f \( -name '*.wav' -o -name '*.flac' \) -print0 |
  xargs -0 -P "$JOBS" -I{} bash -c '
    src="$1"
    rel="${src#"$IN_DIR"/}"
    dst="$OUT_DIR/${rel%.*}.wav"
    mkdir -p "$(dirname "$dst")"
    ffmpeg -loglevel error -y -i "$src" -ar "$SR" -ac 1 "$dst"
  ' _ {}

echo "resampled $(find "$OUT_DIR" -name '*.wav' | wc -l) files to ${SR} Hz"
