#!/bin/bash
# Downloads the MIPLIB 2017 collection into $1 (the LP relaxations are
# obtained by reading the MIPs with the pure-LP MPS reader, which ignores
# integrality markers). Reference: benchmarking/collect_mip_relaxations.sh.
set -euo pipefail
DEST="${1:?usage: collect_mip_relaxations.sh DEST_DIR}"
mkdir -p "$DEST"
URL="https://miplib.zib.de/downloads/collection.zip"
if ! curl -fsI --max-time 10 "$URL" >/dev/null 2>&1; then
  echo "ERROR: no network egress; place .mps(.gz) files in $DEST manually." >&2
  exit 2
fi
curl -fsSL "$URL" -o "$DEST/collection.zip"
(cd "$DEST" && unzip -o collection.zip && rm collection.zip)
