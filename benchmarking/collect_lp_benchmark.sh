#!/bin/bash
# Downloads Hans Mittelmann's LP benchmark instances into $1.
# Reference: benchmarking/collect_lp_benchmark.sh (snapshot ~2021-04-23).
set -euo pipefail
DEST="${1:?usage: collect_lp_benchmark.sh DEST_DIR}"
mkdir -p "$DEST"
BASE="https://plato.asu.edu/ftp/lptestset"
if ! curl -fsI --max-time 10 "$BASE/" >/dev/null 2>&1; then
  echo "ERROR: no network egress; place .mps(.gz) files in $DEST manually." >&2
  exit 2
fi
curl -fsSL "$BASE/" | grep -oE 'href="[A-Za-z0-9_\-]+\.(mps|bz2|gz)[^"]*"' \
  | cut -d'"' -f2 | while read -r name; do
  curl -fsSL "$BASE/$name" -o "$DEST/$(basename "$name")" || true
done
