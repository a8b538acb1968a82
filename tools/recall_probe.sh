#!/usr/bin/env bash
# One-command ANN estimator-QUALITY gate (VERDICT r13 #1).
#
# The lesson this script encodes: the round-8 IVFPQ ADC was a BIASED
# estimator for five rounds and every hash gate stayed green the whole
# time — pigeonhole recall floors certify "not catastrophically
# broken", not "correctly estimating". Measured recall only caught it
# when the builder hand-ran the clustered matrix in round 13. This
# script makes that measurement mechanical, like round_close.sh and
# scale_probe.sh:
#   1. ensures the 50-member (/tmp/sfc0.01) and 500-member (/tmp/sfc10x)
#      clustered corpora exist (graft.GenClustered; --regen rebuilds)
#   2. runs graft.queries.AnnRecallProbe --gate, which re-measures the
#      full §clustered-recall matrix and EXITS 1 if any method drops
#      below its pinned floor (floors live next to the methods in
#      AnnRecallProbe.scala; the fixed-depth r128/r256 rows are the
#      bias sentinels — the adaptive default depth would mask a
#      re-introduced bias, the intermediate depths cannot)
#   3. prints the regenerated markdown matrix (paste into BASELINE.md
#      §clustered-recall when a floor legitimately moves — with the
#      commit that moved it)
#
# Run it at round-open (alongside scale_probe.sh) and after ANY change
# to the ANN lane (VectorQueries codebooks/ADC/probe bodies/depth
# rules). A red gate is a stop-ship for the ANN family.
#
# sbt invocations are strictly SEQUENTIAL (shared target/).
set -euo pipefail
cd "$(dirname "$0")/.."

C50=${RECALL_PROBE_C50:-/tmp/sfc0.01}
C500=${RECALL_PROBE_C500:-/tmp/sfc10x}
C10K=${RECALL_PROBE_C10K:-/tmp/sfc10k}

if [ "${1:-}" = "--regen" ]; then rm -rf "$C50" "$C500" "$C10K"; fi
if [ ! -d "$C50" ]; then
  echo "recall_probe: generating 50-member clustered corpus at $C50"
  sbt -batch "runMain graft.GenClustered $C50" >/dev/null
fi
if [ ! -d "$C500" ]; then
  echo "recall_probe: generating 500-member clustered corpus at $C500"
  sbt -batch "runMain graft.GenClustered $C500 500" >/dev/null
fi

# sbt propagates the forked main's exit code; keep the full log for
# paste-ability but fail the script on a tripped floor
log=$(mktemp /tmp/recall_probe.XXXX.log)
if sbt -batch "runMain graft.queries.AnnRecallProbe --gate $C50 $C500" \
    >"$log" 2>&1; then
  grep -aE "^\[annrecall\]|^\||^RECALLGATE" "$log"
  echo "recall_probe: GREEN (full log: $log)"
else
  grep -aE "^\[annrecall\]|^\||^RECALLGATE" "$log" || tail -40 "$log"
  echo "recall_probe: RED — a pinned recall floor was tripped (log: $log)" >&2
  exit 1
fi

# mega-tie-set evidence rows (VERDICT r14 #7, measured): on a corpus
# whose query cluster (10k members) dwarfs the 512 depth cap, NO
# ≤512-exact-read selection rule can recover the exact top-10 (ADC
# noise > the order-statistic gaps — floors pin the measured 1/2/0/4),
# so the gate instead pins DETECTION: the observed-ambiguity estimator
# must resolve ambiguity >> the cap there. RECALL_PROBE_TIESET=0 skips.
if [ "${RECALL_PROBE_TIESET:-1}" = "1" ]; then
  if [ ! -d "$C10K" ]; then
    echo "recall_probe: generating 10k-member clustered corpus at $C10K"
    sbt -batch "runMain graft.GenClustered $C10K 10000" >/dev/null
  fi
  tlog=$(mktemp /tmp/recall_tieset.XXXX.log)
  if sbt -batch "runMain graft.queries.AnnRecallProbe --tieset $C10K" \
      >"$tlog" 2>&1; then
    grep -aE "^\[annrecall\]|^\||^RECALLGATE" "$tlog"
    echo "recall_probe: tieset GREEN (full log: $tlog)"
  else
    grep -aE "^\[annrecall\]|^\||^RECALLGATE" "$tlog" || tail -40 "$tlog"
    echo "recall_probe: RED — the tieset floor was tripped (log: $tlog)" >&2
    exit 1
  fi
fi
