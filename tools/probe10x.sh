#!/usr/bin/env bash
# Run the 10x scale probe and write BENCH_probe10x_<tag>.json — but only
# if the probe actually produced output. An empty committed artifact is
# worse than none (it reads as coverage that isn't — the r7 lesson), so
# the write is guarded: the probe streams to a temp file and the
# artifact only materializes when `test -s` passes.
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="${1:?usage: probe10x.sh <tag, e.g. r08>}"
OUT="BENCH_probe10x_${TAG}.json"
TMP="$(mktemp)"
trap 'rm -f "$TMP"' EXIT
# `|| true`: under set -eo pipefail an sbt failure (or zero JSON lines,
# grep rc=1) would exit the script HERE and skip the guard below — the
# artifact would still be withheld, but silently. Let control reach the
# test -s so the failure prints its diagnostic.
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch 'runMain graft.ScaleProbe' 2>/dev/null | grep -E '^\{' > "$TMP" || true
test -s "$TMP" || { echo "probe produced no output; NOT writing $OUT" >&2; exit 1; }
mv "$TMP" "$OUT"
trap - EXIT
echo "wrote $OUT ($(wc -l < "$OUT") lines)"
