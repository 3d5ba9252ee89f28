#!/bin/bash
# Downloads the Netlib LP test set (feasible subset incl. Kennington) as
# .mps.gz into $1. Reference: benchmarking/collect_netlib_benchmark.sh.
set -euo pipefail
DEST="${1:?usage: collect_netlib.sh DEST_DIR}"
TMP="$(mktemp -d)"
mkdir -p "$DEST"
BASE="https://www.netlib.org/lp/data"
if ! curl -fsI --max-time 10 "$BASE/" >/dev/null 2>&1; then
  echo "ERROR: no network egress; place .mps(.gz) files in $DEST manually." >&2
  exit 2
fi
# Netlib ships "compressed MPS"; build netlib's own emps expander
# (exactly as the reference does: fetch emps.c, cc -O3).
curl -fsSL "$BASE/emps.c" -o "$TMP/emps.c"
cc -O3 -o "$TMP/emps" "$TMP/emps.c"
while read -r name; do
  case "$name" in qap8|qap12|qap15) continue ;; esac  # generated below
  curl -fsSL "$BASE/$name" -o "$TMP/$name.emps" || continue
  "$TMP/emps" < "$TMP/$name.emps" > "$DEST/$name.mps" 2>/dev/null \
    || { echo "emps failed for $name" >&2; continue; }
  gzip -f "$DEST/$name.mps"
done < <(grep -v "^#" "$(dirname "$0")/netlib_instance_list")
# qap8/12/15 come from netlib's Fortran LP generator (reference
# collect_netlib_benchmark.sh:63-71); needs gfortran.
if command -v gfortran >/dev/null 2>&1; then
  curl -fsSL "https://www.netlib.org/lp/generators/qap/newlp.f" \
    -o "$TMP/newlp.f" &&
    gfortran -O3 -o "$TMP/newlp" "$TMP/newlp.f" &&
    for n in 8 12 15; do
      curl -fsSL "https://www.netlib.org/lp/generators/qap/data.${n}" |
        "$TMP/newlp" | gzip > "$DEST/qap${n}.mps.gz" || true
    done
else
  echo "WARNING: gfortran unavailable; skipping qap8/12/15" >&2
fi
# Kennington instances arrive emps-compressed then gzipped.
while read -r name; do
  curl -fsSL "$BASE/kennington/$name.gz" -o "$TMP/$name.gz" || continue
  gunzip -f "$TMP/$name.gz"
  "$TMP/emps" < "$TMP/$name" > "$DEST/$name.mps" 2>/dev/null || continue
  gzip -f "$DEST/$name.mps"
done < <(grep -v "^#" "$(dirname "$0")/kennington_instance_list")
rm -rf "$TMP"
echo "collected $(ls "$DEST" | wc -l) instances into $DEST"
