#!/usr/bin/env bash
# One-command CI gate (VERDICT r9 ask #10, widened r11): Verify →
# DuckDB oracle compare → differential SQL fuzz → bench guard,
# failing non-zero on the first red step.
#
# Usage:
#   scripts/gate.sh            # sf0.01 oracle gate + fuzz + bench guard
#   scripts/gate.sh 0.001      # faster iteration gate (oracle only)
#   scripts/gate.sh 0.01 --scale   # also run the Heaps-10x guard
#   scripts/gate.sh 1          # sf1 frontier gate (VERDICT r10 ask #4):
#                              #   assembles /tmp/sf1 from scratch
#                              #   (gen_sf1 relational tables + the
#                              #   heaps-10x docs/embeddings) and runs
#                              #   Verify + the oracle compare there
#
# The oracle SF is the first argument (default 0.01 — the driver's
# regime). bench_guard always runs in its own committed regime
# (sf0.1 / 8 cpus / persist, plus --scale's Heaps corpus when asked),
# so its reference stays comparable across rounds regardless of the
# oracle SF chosen here. The fuzz step runs both corpora (synthetic +
# real sf0.01) twice each: the committed seed, then a date-rotating
# seed (GRAFT_FUZZ_ROTATE) — every run prints its seed, so a red
# rotating run reproduces verbatim with GRAFT_FUZZ_SEED.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-0.01}"
if [[ "${SF}" == "1" ]]; then
  SFDIR="/tmp/sf1"
  if [[ ! -f "${SFDIR}/lineitem.parquet" || ! -f "${SFDIR}/documents.parquet" ]]; then
    echo "== gate: assembling ${SFDIR} (sf1 relational + heaps-10x docs)"
    python3 scripts/gen_sf1.py "${SFDIR}"
    if [[ ! -f /tmp/heaps_10x/documents.parquet ]]; then
      python3 scripts/gen_scale.py /tmp/heaps_10x 10 heaps
    fi
    cp /tmp/heaps_10x/documents.parquet /tmp/heaps_10x/embeddings.parquet "${SFDIR}/"
  fi
else
  SFDIR="/root/testdata/sf${SF}"
fi
OUT="$(mktemp -d /tmp/graft-gate.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT

echo "== gate: Verify @ ${SFDIR} -> ${OUT}"
sbt -batch "runMain graft.Verify ${SFDIR} ${OUT}" >"${OUT}/verify.log" 2>&1 || {
  tail -40 "${OUT}/verify.log"; echo "GATE FAIL: graft.Verify"; exit 1; }

echo "== gate: DuckDB oracle compare"
python3 scripts/check_oracle.py "${SFDIR}" "${OUT}" || {
  echo "GATE FAIL: oracle mismatch"; exit 1; }

if [[ "${SF}" == "1" ]]; then
  echo "GATE PASS (sf1 frontier: Verify + oracle at ${SFDIR})"
  exit 0
fi

echo "== gate: differential SQL fuzz (committed + rotating seed)"
GRAFT_FUZZ_ROTATE=1 sbt -batch "testOnly graft.SqlFuzzSpec" \
  >"${OUT}/fuzz.log" 2>&1 || {
  grep -E "SQL_FUZZ|FAIL|seed" "${OUT}/fuzz.log" | tail -30
  echo "GATE FAIL: SQL fuzz divergence (seeds printed above)"; exit 1; }
grep -h "SQL_FUZZ" "${OUT}/fuzz.log" || true

echo "== gate: bench guard (steady-state vs scripts/bench_reference.json)"
python3 scripts/bench_guard.py || {
  echo "GATE FAIL: perf regression"; exit 1; }

if [[ "${2:-}" == "--scale" ]]; then
  echo "== gate: bench guard --scale (Heaps-10x)"
  python3 scripts/bench_guard.py --scale || {
    echo "GATE FAIL: at-scale perf regression"; exit 1; }
fi

echo "GATE PASS (sf=${SF}$([[ "${2:-}" == "--scale" ]] && echo ", +scale"))"
