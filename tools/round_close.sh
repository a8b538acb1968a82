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
# Retime-contract check (VERDICT r16 #6): the committed BENCH_LOCAL.json
# must carry the disclosing retime fields — a bench line without them
# either predates the bounded-retime rule or silently dropped the
# disclosure, and the next round's PERF comparison would lose the
# ability to see the rule fire. (BenchRetimeSpec, run in the suite
# below, additionally pins that the rule goes inert on an sf mismatch.)
if ! grep -q '"stream_retimed":' BENCH_LOCAL.json || \
   ! grep -q '"batch_retimed":' BENCH_LOCAL.json; then
  echo "round_close: BENCH_LOCAL.json is missing stream_retimed/batch_retimed — regenerate with the current Bench before closing." >&2
  exit 1
fi
echo "round_close: full sbt test on HEAD=$head (clean tree)"
sbt -batch test
echo "round_close: suite GREEN on $head at $(date -u +%FT%TZ) — paste this line into BASELINE.md"
# 10x hash evidence runs on EVERY close (VERDICT r15 #6 — the opt-in
# gate caught four real bugs in round 15; an opt-in gate eventually
# rots). Default tier = the stratified ~86-query subset (~20 min, one+
# representative per §2 family); ROUND_CLOSE_SWEEP10X=1 upgrades to
# the full 310-query sweep (~80 min), =skip skips it (escape hatch for
# a doc-only close — say so in BASELINE). BASELINE.md records which
# tier each close ran (the sweep prints `tier=` in its GREEN line).
case "${ROUND_CLOSE_SWEEP10X:-subset}" in
  1|full) bash tools/sweep10x.sh ;;
  skip)   echo "round_close: sweep10x SKIPPED by ROUND_CLOSE_SWEEP10X=skip" ;;
  *)      bash tools/sweep10x.sh --subset ;;
esac
