#!/usr/bin/env bash
# One-command 10x full-contract hash sweep (VERDICT r14 #2).
#
# Round 14 ran the first full-contract oracle sweep at /tmp/sf1 (10x the
# sf0.1 gate) by hand; this script mechanizes it so the evidence cannot
# rot: corpus presence is checked (and optionally regenerated on the
# current Gen10x — the r14 doc-id-stride fix made regeneration itself a
# correctness event), graft.Verify dumps all 310 query results at 10x,
# and tools/check_oracle_10x.py compares every one against its DuckDB
# oracle with the PROVED inverted-index rewrite of the 14+1 all-pairs
# oracles (the prove mode's equivalence certificate is in BASELINE.md).
# GREEN exit 0 = every contract query hash-matches at 10x; any FAIL/ERR
# exits 1.
#
#   bash tools/sweep10x.sh            # sweep, reusing /tmp/sf1 if present
#   bash tools/sweep10x.sh --regen    # force-regenerate /tmp/sf1 first
#
# Referenced from tools/round_close.sh as the release-grade OPTIONAL
# gate (the mandatory close gate is the full sbt test suite; this sweep
# adds the 10x hash evidence when the round's BASELINE claims it).
# sbt invocations are strictly SEQUENTIAL (shared target/).
set -euo pipefail
cd "$(dirname "$0")/.."

SF10X=${SWEEP10X_DIR:-/tmp/sf1}
DUMP=${SWEEP10X_DUMP:-/tmp/verify10x}

if [ "${1:-}" = "--regen" ]; then rm -rf "$SF10X"; fi
if [ ! -d "$SF10X" ]; then
  echo "sweep10x: generating 10x corpus at $SF10X"
  sbt -batch "runMain graft.Gen10x $SF10X 10" >/dev/null
fi

echo "sweep10x: Verify dump at $SF10X -> $DUMP"
rm -rf "$DUMP"
# Verify defaults to 4 cores (the driver's gate setting); the 10x dump
# is ~10x the work, so default to 16 here — SWEEP10X_CPUS overrides.
# Heap scales with concurrent agg buffers: 16 tasks OOM'd the 8g
# default on the 10x corpus (measured round 15), so size it up too.
export SPARK_GRAFT_CPUS=${SWEEP10X_CPUS:-16}
export SPARK_DRIVER_MEM=${SWEEP10X_MEM:-24g}
sbt -batch "runMain graft.Verify $SF10X $DUMP" >/tmp/sweep10x_verify.log 2>&1 || {
  echo "sweep10x: RED — graft.Verify failed (tail of /tmp/sweep10x_verify.log):" >&2
  tail -20 /tmp/sweep10x_verify.log >&2
  exit 1
}
# Verify records per-query exceptions instead of dying — a non-empty
# _errors.json is a red sweep even before the oracle compare
if [ -s "$DUMP/_errors.json" ] && [ "$(cat "$DUMP/_errors.json")" != "{}" ]; then
  echo "sweep10x: RED — Verify recorded per-query errors:" >&2
  cat "$DUMP/_errors.json" >&2
  exit 1
fi

if python3 tools/check_oracle_10x.py "$DUMP" "$SF10X"; then
  echo "sweep10x: GREEN ($(git rev-parse --short HEAD), $(date -u +%FT%TZ))"
else
  echo "sweep10x: RED — oracle mismatches above ($(git rev-parse --short HEAD))" >&2
  exit 1
fi
