#!/usr/bin/env bash
# Round-OPEN ritual (VERDICT r13 #3 — third consecutive round of
# working-tree artifact drift).
#
# The driver writes artifacts (BENCH_rN / CORRECTNESS_rN / VERDICT.md /
# ADVICE.md, and sometimes overwrites BENCH_LOCAL.json / LEAKCHECK.json)
# AFTER the round closes, so the builder's next session opens on a
# dirty tree it didn't dirty. The provenance policy (BASELINE.md):
# committed BENCH_LOCAL is quiet-box, never driver-box. This script
# adjudicates mechanically, BEFORE the first build of the round:
#   1. driver-written artifact changes → committed with driver
#      provenance stated, EXCEPT BENCH_LOCAL.json / LEAKCHECK.json,
#      which are restored to the committed (quiet-box) version — the
#      driver's copies of those two live on in BENCH_rN / the verdict.
#   2. any OTHER dirty path → fail loudly; a human (or the builder)
#      decides, because it means the last session closed without
#      committing code.
#   3. runs the two mechanical probes (scale_probe.sh skew ledger +
#      recall_probe.sh estimator-quality gate) unless ROUND_OPEN_FAST=1.
# Done right, `git status` is clean when this exits 0.
set -euo pipefail
cd "$(dirname "$0")/.."

DRIVER_ARTIFACTS='^(BENCH_r[0-9]+\.json|CORRECTNESS_r[0-9]+\.json|VERDICT\.md|ADVICE\.md|COPYCHECK\.json|PROGRESS\.jsonl)$'
RESTORE_ARTIFACTS='^(BENCH_LOCAL\.json|LEAKCHECK\.json)$'

# Parse null-delimited porcelain (ADVICE r14): `awk '{print $2}'` over
# the non-z form misparses renames (yields the OLD path of `R old ->
# new`) and any path containing spaces — fatal in a script that
# auto-commits and auto-restores. In -z form each entry is "XY PATH\0";
# rename/copy entries are followed by a second NUL-terminated ORIGIN
# path, which we consume and classify as hand-adjudication (a renamed
# artifact is not a driver behavior this script knows how to handle).
other=()
to_commit=()
to_restore=()
n_entries=0
while IFS= read -r -d '' entry; do
  n_entries=$((n_entries + 1))
  st=${entry:0:2}
  f=${entry:3}
  if [[ $st == *R* || $st == *C* ]]; then
    IFS= read -r -d '' origin || origin='<missing origin>'
    other+=("$f (renamed/copied from: $origin)")
    continue
  fi
  if [[ $f =~ $RESTORE_ARTIFACTS ]]; then to_restore+=("$f")
  elif [[ $f =~ $DRIVER_ARTIFACTS ]]; then to_commit+=("$f")
  else other+=("$f")
  fi
done < <(git status --porcelain=v1 -z)
if [ "$n_entries" -eq 0 ]; then
  echo "round_open: tree already clean — no driver artifacts to adjudicate"
else
  if [ ${#other[@]} -gt 0 ]; then
    echo "round_open: NON-driver paths are dirty — adjudicate by hand first:" >&2
    printf '  %s\n' "${other[@]}" >&2
    exit 1
  fi
  if [ ${#to_restore[@]} -gt 0 ]; then
    echo "round_open: restoring quiet-box artifacts: ${to_restore[*]}"
    git checkout -- "${to_restore[@]}"
  fi
  if [ ${#to_commit[@]} -gt 0 ]; then
    echo "round_open: committing driver artifacts: ${to_commit[*]}"
    git add "${to_commit[@]}"
    git commit -q -m "Round open: adopt driver-written round artifacts

Provenance: these files were written by the evaluation driver after the
previous round closed (driver-box numbers — see BASELINE.md's artifact
provenance note). BENCH_LOCAL.json/LEAKCHECK.json, if the driver also
overwrote them, were restored to the committed quiet-box versions.

No-Verification-Needed: driver-generated artifact adoption, no code change"
  fi
fi

if [ "${ROUND_OPEN_FAST:-0}" != "1" ]; then
  bash tools/scale_probe.sh
  bash tools/recall_probe.sh
fi
echo "round_open: done ($(git rev-parse --short HEAD), $(date -u +%FT%TZ)) — tree $(git status --porcelain | wc -l | tr -d ' ') dirty paths"
