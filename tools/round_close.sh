#!/usr/bin/env bash
# STOP-SHIP round-close gate (VERDICT r10 #1 / r11 #1): rounds 10 and 11
# both shipped a RED test suite because a late code commit changed a
# contract query AFTER the last full-suite run (r10: q_kll_quantiles
# schema vs SketchSpec; r11: q_embed_neardup plan vs PlanShapeSpec).
# This script IS the mechanical rule: run it AFTER the round's FINAL
# code commit, on a clean tree, and record its closing line in
# BASELINE.md. A red suite here is a stop-ship: fix and re-run before
# the round closes.
set -euo pipefail
cd "$(dirname "$0")/.."
# git status --porcelain, not git diff: diff ignores UNTRACKED files, so a
# brand-new uncommitted source/spec file would pass the gate while making
# the recorded GREEN line unreproducible from HEAD (ADVICE r12).
if [ -n "$(git status --porcelain)" ]; then
  echo "round_close: tree has uncommitted or untracked changes — commit first, then gate." >&2
  git status --porcelain >&2
  exit 1
fi
head=$(git rev-parse --short HEAD)
echo "round_close: full sbt test on HEAD=$head (clean tree)"
sbt -batch test
echo "round_close: suite GREEN on $head at $(date -u +%FT%TZ) — paste this line into BASELINE.md"
# Release-grade OPTIONAL gate (VERDICT r14 #2): the 10x full-contract
# hash sweep — run `bash tools/sweep10x.sh` (or ROUND_CLOSE_SWEEP10X=1
# here) when the round's BASELINE claims 10x hash evidence.
if [ "${ROUND_CLOSE_SWEEP10X:-0}" = "1" ]; then bash tools/sweep10x.sh; fi
