#!/bin/bash
# Round-14 end-of-round campaign on final HEAD: quiescence-gated
# full-suite sf0.1 bench (BENCH_LOCAL refresh), scale-subset legs at
# sf0.1/sf1/sf10, determinism probe (two Verify runs), the sf0.01 +
# sf1 oracle gates (116 queries), the COMMITTED CORRECTNESS_LOCAL.json artifact
# (VERDICT r13 item 2 — fails the campaign if empty or missing
# entries vs the Verify manifest), and the isolated q108 stage
# attribution (VERDICT r13 item 3). 115 queries this round (round 13's
# 113 + q118 LM perplexity + q119 corpus LM gate + q120 ridge quality
# classifier).
set -e
cd /root/repo
export SPARK_DRIVER_MEM=48g
export SPARK_GRAFT_CPUS=32

SUBSET="q114_incremental_semdedup_skew,q115_streaming_semdedup,q113_semdedup_planted,q112_incremental_semdedup,q111_curation_semantic,q110_knn_ivf_hnsw_coarse,q109_semdedup,q87_percentiles_shared,q80_percentiles_exact2p,q61_dedup_clusters,q03_top_revenue_orders,q103_winsorize,q83_training_set_prep,q104_region_market_share,q66_jaccard_prefix_filter,q35_minhash_neardup,q76_incremental_neardup,q106_embedding_neardup_lsh,q107_knn_join_lsh,q108_video_pipeline,q81_repeated_spans,q34_ngram_jaccard_topk,q05_nation_revenue,q97_bigram_topk,q10_running_revenue,q52_percentiles,q93_inverted_index,q09_window_rank,q31_quality_langid,q101_cohort_retention,q14_join_part_supplier,q94_funnel,q96_term_pmi,q42_sessionize,q59_tfidf,q43_asof_join,q33_dedup_exact,q32_langid_confusion,q102_event_transitions,q41_tumbling_window,q44_sliding_window,q89_lead_lag,q69_percentiles_approx,q70_distinct_approx,q116_knn_binary,q117_hamming_neardup,q118_lm_perplexity,q119_lm_quality_gate,q120_quality_classifier"

echo "=== waiting for quiescence (load < 0.7, max 15 min) ==="
for i in $(seq 1 90); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $load < 0.7 else 0)")
  [ "$ok" = "1" ] && break
  sleep 10
done
echo "load at start: $(cat /proc/loadavg)"

echo "=== leg 0: full-suite bench @ sf0.1 (runs=3) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  tools/run.sh graft.Bench
cp BENCH_LOCAL.json /tmp/r14_bench_full_sf01.json

echo "=== leg 1: subset @ sf0.1 (runs=2) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench
cp BENCH_LOCAL.json /tmp/r14_probe_sf01.json

echo "=== leg 2: subset @ sf1 (runs=2) ==="
SPARK_GRAFT_SF_DIR=/root/repo/data/sf1 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench
cp BENCH_LOCAL.json /tmp/r14_probe_sf1.json

echo "=== leg 3: subset @ sf10 (runs=2) ==="
echo "load before sf10 leg: $(cat /proc/loadavg)"
SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench
cp BENCH_LOCAL.json /tmp/r14_probe_sf10.json

cp /tmp/r14_bench_full_sf01.json BENCH_LOCAL.json

echo "=== isolated q108 stage attribution @ sf10 (VERDICT r13 item 3) ==="
echo "load before q108 leg: $(cat /proc/loadavg)"
tools/run.sh graft.tools_scratch.R14Probe q108 /root/repo/data/sf10 3 \
  2>/dev/null | grep "\[q108\]" | tee /tmp/r14_q108_attribution.txt

echo "=== determinism probe: two Verify runs @ sf0.01 ==="
rm -rf /tmp/r14_det_a /tmp/r14_det_b
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/r14_det_a \
  > /tmp/r14_det_a.log 2>&1
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/r14_det_b \
  > /tmp/r14_det_b.log 2>&1
python3 tools/determinism.py /tmp/r14_det_a /tmp/r14_det_b | tail -2

echo "=== sf0.01 oracle gate + COMMITTED local correctness artifact ==="
python3 tools/validate.py --json CORRECTNESS_LOCAL.json \
  /root/testdata/sf0.01 /tmp/r14_det_a | tail -3
# belt and suspenders (VERDICT r13 item 2): the committed artifact must
# exist, be non-empty, and cover every query in the Verify manifest
python3 - <<'EOF'
import json, sys
art = json.load(open("CORRECTNESS_LOCAL.json"))
manifest = [l.strip() for l in open("/tmp/r14_det_a/queries.txt") if l.strip()]
missing = [q for q in manifest if q not in art]
assert art, "CORRECTNESS_LOCAL.json is EMPTY"
assert not missing, f"artifact missing entries: {missing}"
fails = [q for q, v in art.items() if not v["pass"]]
print(f"artifact OK: {len(art)} entries == {len(manifest)} manifest; fails={fails}")
sys.exit(1 if fails else 0)
EOF

echo "=== sf1 oracle gate: Verify @ data/sf1 + DuckDB compare ==="
rm -rf /tmp/r14_verify_sf1
tools/run.sh graft.Verify /root/repo/data/sf1 /tmp/r14_verify_sf1 \
  > /tmp/r14_verify_sf1.log 2>&1
python3 tools/validate.py /root/repo/data/sf1 /tmp/r14_verify_sf1 | tail -3

echo "=== campaign done; load at end: $(cat /proc/loadavg) ==="
echo "FINAL ACT (manual): sbt test on final HEAD, then commit"
