#!/usr/bin/env bash
# One-command skew-ledger + scale regression probe (VERDICT r12 #5).
#
# The 10x/100x evidence rows in BASELINE.md §skew-ledger were re-derived
# ad hoc each round (Gen10x + hand-run BucketProbe + hand-run TimeQ);
# this script makes the 100x regression check a round-open ritual like
# tools/round_close.sh:
#   1. ensures /tmp/sf1 (10x) and /tmp/sf10 (100x) exist (graft.Gen10x;
#      --regen forces a rebuild of both)
#   2. runs graft.queries.BucketProbe at sf0.1, 10x and 100x and prints
#      the merged markdown ledger table (paste into BASELINE.md)
#   3. times the blocked-dedup/ANN family at 10x via graft.TimeQ
#      (set SCALE_PROBE_QUERIES to override the list; SCALE_PROBE_TIMEQ=0
#      skips the timing pass)
#
# sbt invocations are strictly SEQUENTIAL (shared target/ — two
# concurrent sbt commands abort suites on stale classes).
set -euo pipefail
cd "$(dirname "$0")/.."

SF01=${SCALE_PROBE_SF01:-/root/testdata/sf0.1}
SF10X=/tmp/sf1
SF100X=/tmp/sf10
QUERIES=${SCALE_PROBE_QUERIES:-q_embed_neardup,q_minhash_neardup,q_containment_dedup,q_knn_join_lsh}

if [ "${1:-}" = "--regen" ]; then rm -rf "$SF10X" "$SF100X"; fi
if [ ! -d "$SF10X" ]; then
  echo "scale_probe: generating 10x set at $SF10X"
  sbt -batch "runMain graft.Gen10x $SF10X 10" >/dev/null
fi
if [ ! -d "$SF100X" ]; then
  echo "scale_probe: generating 100x set at $SF100X"
  sbt -batch "runMain graft.Gen10x $SF100X 100" >/dev/null
fi

tmp=$(mktemp -d /tmp/scale_probe.XXXX)
for sc in "sf0.1:$SF01" "10x:$SF10X" "100x:$SF100X"; do
  name=${sc%%:*}; dir=${sc#*:}
  echo "scale_probe: BucketProbe at $name ($dir)"
  sbt -batch "runMain graft.queries.BucketProbe $dir" 2>&1 \
    | grep -a "^LEDGER" > "$tmp/$name.ledger"
  sed "s/^/[$name] /" "$tmp/$name.ledger"
done

# merged markdown table, same shape as BASELINE.md §skew-ledger
python3 - "$tmp" <<'EOF'
import re, sys, os
tmp = sys.argv[1]
scales = ["sf0.1", "10x", "100x"]
rows = {}
order = []
for sc in scales:
    for line in open(os.path.join(tmp, sc + ".ledger")):
        m = re.match(r"LEDGER site=(\S+) cap=(\d+) overflow=(\d+) max_occ=(\d+)", line)
        if not m:
            continue
        site, cap, ov, mx = m.groups()
        if site not in rows:
            rows[site] = {"cap": cap}
            order.append(site)
        rows[site][sc] = f"{ov} ({mx})"
print("\n| site | cap | sf0.1 overflow (max) | 10x overflow (max) | 100x overflow (max) |")
print("|---|---|---|---|---|")
for site in order:
    r = rows[site]
    print(f"| {site} | {r['cap']} | " + " | ".join(r.get(sc, "-") for sc in scales) + " |")
EOF

if [ "${SCALE_PROBE_TIMEQ:-1}" != "0" ]; then
  echo "scale_probe: TimeQ $QUERIES at 10x"
  sbt -batch "runMain graft.TimeQ $QUERIES $SF10X 2" 2>&1 | grep -a "^\[timeq\]"
fi
echo "scale_probe: done (ledger files in $tmp)"
