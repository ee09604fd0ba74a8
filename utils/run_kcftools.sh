#!/usr/bin/env bash
# End-to-end pipeline: count -> getVariations -> cohort -> findIBS -> exports.
# Analog of the reference's utils/run_kcftools.sh, using the built-in
# counter instead of external KMC. Resumable via .done marker files.
set -euo pipefail

REF=${1:?usage: run_kcftools.sh <reference.fa> <outdir> <sample.fa>...}
OUT=${2:?outdir required}
shift 2
SAMPLES=("$@")
K=${K:-31}
WINDOW=${WINDOW:-50000}
SCORE=${SCORE:-95}

mkdir -p "$OUT"
KCFS=()
for fa in "${SAMPLES[@]}"; do
  name=$(basename "$fa" | sed 's/\.[^.]*$//')
  db="$OUT/$name"
  kcf="$OUT/$name.kcf"
  if [[ ! -f "$db.done" ]]; then
    kcftools count -i "$fa" -o "$db" -k "$K"
    touch "$db.done"
  else
    echo "$name: count already processed, skipping"
  fi
  if [[ ! -f "$kcf.done" ]]; then
    kcftools getVariations -r "$REF" -k "$db" -o "$kcf" -s "$name" \
      -f window -w "$WINDOW"
    touch "$kcf.done"
  else
    echo "$name: getVariations already processed, skipping"
  fi
  KCFS+=("$kcf")
done

COHORT="$OUT/cohort.kcf"
if [[ ! -f "$COHORT.done" ]]; then
  kcftools cohort -o "$COHORT" -i "$(IFS=,; echo "${KCFS[*]}")"
  touch "$COHORT.done"
fi

kcftools findIBS -i "$COHORT" -o "$OUT/cohort.ibs" --score "$SCORE" --summary --bed
kcftools kcf2tsv -i "$COHORT" -o "$OUT/cohort"
kcftools kcf2gt -i "$COHORT" -o "$OUT/cohort.gt.tsv"
echo "pipeline complete: $OUT"
