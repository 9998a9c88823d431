#!/usr/bin/env bash
# One-command CI gate (VERDICT r9 ask #10): Verify → DuckDB oracle
# compare → bench guard, failing non-zero on the first red step.
#
# Usage:
#   scripts/gate.sh            # sf0.01 oracle gate + sf0.1 bench guard
#   scripts/gate.sh 0.001      # faster iteration gate (oracle only)
#   scripts/gate.sh 0.01 --scale   # also run the Heaps-10x guard
#
# The oracle SF is the first argument (default 0.01 — the driver's
# regime). bench_guard always runs in its own committed regime
# (sf0.1 / 8 cpus / persist, plus --scale's Heaps corpus when asked),
# so its reference stays comparable across rounds regardless of the
# oracle SF chosen here.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-0.01}"
SFDIR="/root/testdata/sf${SF}"
OUT="$(mktemp -d /tmp/graft-gate.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT

echo "== gate: Verify @ ${SFDIR} -> ${OUT}"
sbt -batch "runMain graft.Verify ${SFDIR} ${OUT}" >"${OUT}/verify.log" 2>&1 || {
  tail -40 "${OUT}/verify.log"; echo "GATE FAIL: graft.Verify"; exit 1; }

echo "== gate: DuckDB oracle compare"
python3 scripts/check_oracle.py "${SFDIR}" "${OUT}" || {
  echo "GATE FAIL: oracle mismatch"; exit 1; }

echo "== gate: bench guard (steady-state vs scripts/bench_reference.json)"
python3 scripts/bench_guard.py || {
  echo "GATE FAIL: perf regression"; exit 1; }

if [[ "${2:-}" == "--scale" ]]; then
  echo "== gate: bench guard --scale (Heaps-10x)"
  python3 scripts/bench_guard.py --scale || {
    echo "GATE FAIL: at-scale perf regression"; exit 1; }
fi

echo "GATE PASS (sf=${SF}$([[ "${2:-}" == "--scale" ]] && echo ", +scale"))"
