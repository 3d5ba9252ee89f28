#!/bin/bash
# Downloads the Netlib LP test set (feasible subset incl. Kennington) as
# .mps.gz into $1. Reference: benchmarking/collect_netlib_benchmark.sh.
set -euo pipefail
DEST="${1:?usage: collect_netlib.sh DEST_DIR}"
mkdir -p "$DEST"
BASE="https://www.netlib.org/lp/data"
if ! curl -fsI --max-time 10 "$BASE/" >/dev/null 2>&1; then
  echo "ERROR: no network egress; place .mps(.gz) files in $DEST manually." >&2
  exit 2
fi
# Netlib ships emps-compressed files; fetch the standard set and the
# Kennington directory, then expand with the netlib emps tool.
curl -fsSL "$BASE/" | grep -oE 'href="[a-z0-9]+"' | cut -d'"' -f2 | while read -r name; do
  curl -fsSL "$BASE/$name" -o "$DEST/$name.emps" || true
done
curl -fsSL "$BASE/kennington/" | grep -oE 'href="[a-z0-9]+\.gz"' | cut -d'"' -f2 | while read -r name; do
  curl -fsSL "$BASE/kennington/$name" -o "$DEST/$name" || true
done
echo "NOTE: .emps files need netlib's emps decompressor to become MPS." >&2
