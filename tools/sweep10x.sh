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
#   bash tools/sweep10x.sh            # full sweep, reusing /tmp/sf1 if present
#   bash tools/sweep10x.sh --regen    # force-regenerate /tmp/sf1 first
#   bash tools/sweep10x.sh --subset   # stratified ~86-query tier (one+
#                                     # representative per §2 family) —
#                                     # the DEFAULT round_close tier
#                                     # (VERDICT r15 #6): ~20 min vs the
#                                     # full sweep's ~80, same families
#                                     # the full sweep caught bugs in
#
# Referenced from tools/round_close.sh: the stratified subset runs on
# EVERY close (the mandatory close gate is the full sbt test suite plus
# this tier); ROUND_CLOSE_SWEEP10X=1 upgrades the close to the full
# 310-query sweep. sbt invocations are strictly SEQUENTIAL (shared
# target/).
set -euo pipefail
cd "$(dirname "$0")/.."

SF10X=${SWEEP10X_DIR:-/tmp/sf1}
DUMP=${SWEEP10X_DUMP:-/tmp/verify10x}

# Stratified tier: at least one query per SURVEY §2 family, weighted
# toward the families where 10x hash evidence has historically caught
# real defects (blocked dedup, ANN, sketches, multimodal fusion,
# stateful streaming). Keep SORTED so drift is reviewable.
SUBSET=$(tr -s ' \n' ',' <<'EOF' | sed 's/^,//;s/,$//'
q_agg_pricing q_anti_join q_approx_distinct q_approx_quantiles
q_asof_join q_binaryfile_scan q_bloom_probe q_bm25_topk q_bpe_learn
q_bucketed_join q_cdc_merge q_cms_sketch_table q_cms_user_freq
q_containment_dedup q_contamination q_count_distinct q_csv_scan
q_cube q_curation_e2e q_dataset_split q_dedup_canonical
q_dedup_clusters q_dedup_exact q_dedup_incremental q_doc_fingerprint
q_domain_mix q_edit_distance q_embed_neardup q_event_funnel
q_filter_scan q_gap_fill q_heavy_hitters q_ivf_incremental
q_join_broadcast q_join_full_outer q_join_smj q_knn_brute q_knn_graph
q_knn_ivf q_knn_ivfpq8 q_knn_join_lsh q_knn_pq8 q_json_funcs
q_lang_id q_line_dedup q_lm_score q_media_decode q_minhash_neardup
q_multimodal_dedup q_mv_incremental q_ngram_jaccard
q_pagerank_neardup q_phash_dedup q_pii_redact q_pivot
q_quality_score q_rag_e2e q_range_join q_recursive_cte
q_retention_cohorts q_scd2_dimension q_semantic_dedup q_semi_join
q_session_window_batch q_simhash_neardup q_sql_udf
q_stream_cms_state q_stream_dedup_wm q_stream_foreach_batch
q_stream_minhash_dedup q_stream_phash_dedup q_stream_session
q_stream_tumbling q_stream_tws_ttl q_string_funcs q_theta_sketch
q_token_budget q_token_stats q_topk_per_group q_tpch_q1 q_tpch_q9
q_triangle_count q_typed_udaf q_url_dedup q_window_frame
q_window_rank
EOF
)

NAMES=""
if [ "${1:-}" = "--regen" ]; then rm -rf "$SF10X"; shift || true; fi
if [ "${1:-}" = "--subset" ]; then
  NAMES="$SUBSET"
  DUMP=${SWEEP10X_DUMP:-/tmp/verify10x_subset}
fi
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
sbt -batch "runMain graft.Verify $SF10X $DUMP $NAMES" >/tmp/sweep10x_verify.log 2>&1 || {
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

TIER=$([ -n "$NAMES" ] && echo "stratified-subset" || echo "full")
if python3 tools/check_oracle_10x.py "$DUMP" "$SF10X" $NAMES; then
  echo "sweep10x: GREEN tier=$TIER ($(git rev-parse --short HEAD), $(date -u +%FT%TZ))"
else
  echo "sweep10x: RED tier=$TIER — oracle mismatches above ($(git rev-parse --short HEAD))" >&2
  exit 1
fi
