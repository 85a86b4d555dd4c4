#!/usr/bin/env bash
# Lossless-compression baseline: FLAC size vs raw 16-bit PCM, in bits/frame.
# Rebuild of reference scripts/compression/evaluate_flac_compression.sh:
# per-file compressed/raw ratio over a corpus directory, plus the corpus mean.
#
# Usage: evaluate_flac_compression.sh <audio-dir> [extension]
set -euo pipefail

DIR="${1:?usage: evaluate_flac_compression.sh <audio-dir> [ext]}"
EXT="${2:-wav}"

if ! command -v flac >/dev/null 2>&1; then
    echo "flac binary not found; install flac to run this baseline" >&2
    exit 1
fi

total_raw=0
total_flac=0
count=0

while IFS= read -r -d '' f; do
    tmp="$(mktemp --suffix=.flac)"
    flac --silent --force --output-name="$tmp" "$f"
    raw_bytes=$(( $(stat -c%s "$f") - 44 ))           # strip wav header
    flac_bytes=$(stat -c%s "$tmp")
    rm -f "$tmp"

    frames=$(( raw_bytes / 2 ))                       # 16-bit mono PCM
    if [ "$frames" -gt 0 ]; then
        bits_per_frame=$(echo "scale=4; $flac_bytes * 8 / $frames" | bc)
        echo "$f: ${bits_per_frame} bits/frame"
        total_raw=$(( total_raw + raw_bytes ))
        total_flac=$(( total_flac + flac_bytes ))
        count=$(( count + 1 ))
    fi
done < <(find "$DIR" -name "*.${EXT}" -print0)

if [ "$count" -gt 0 ]; then
    frames=$(( total_raw / 2 ))
    echo "----"
    echo "corpus: $count files, $(echo "scale=4; $total_flac * 8 / $frames" | bc) bits/frame (16 = uncompressed)"
fi
