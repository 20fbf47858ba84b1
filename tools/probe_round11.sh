#!/bin/bash
# Round-11 scale campaign on final HEAD: quiescence-gated re-sweep of
# the scale subset (now 42 queries: round-10's 41 + q115 streaming
# semdedup) at sf0.1/sf1/sf10, full-suite sf0.1 bench, determinism
# probe, and the sf1 oracle gate. VERDICT-10 task 5: round-10's sf10
# leg started at load 15, so its ABSOLUTES read 20-40% high; this leg
# re-establishes clean absolutes for SCALING.md.
set -e
cd /root/repo
export SPARK_DRIVER_MEM=48g
export SPARK_GRAFT_CPUS=32

SUBSET="q114_incremental_semdedup_skew,q115_streaming_semdedup,q113_semdedup_planted,q112_incremental_semdedup,q111_curation_semantic,q110_knn_ivf_hnsw_coarse,q109_semdedup,q87_percentiles_shared,q80_percentiles_exact2p,q61_dedup_clusters,q03_top_revenue_orders,q103_winsorize,q83_training_set_prep,q104_region_market_share,q66_jaccard_prefix_filter,q35_minhash_neardup,q76_incremental_neardup,q106_embedding_neardup_lsh,q107_knn_join_lsh,q108_video_pipeline,q81_repeated_spans,q34_ngram_jaccard_topk,q05_nation_revenue,q97_bigram_topk,q10_running_revenue,q52_percentiles,q93_inverted_index,q09_window_rank,q31_quality_langid,q101_cohort_retention,q14_join_part_supplier,q94_funnel,q96_term_pmi,q42_sessionize,q59_tfidf,q43_asof_join,q33_dedup_exact,q32_langid_confusion,q102_event_transitions,q41_tumbling_window,q44_sliding_window,q89_lead_lag"

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
cp BENCH_LOCAL.json /tmp/r11_bench_full_sf01.json

echo "=== leg 1: subset @ sf0.1 (runs=2) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench
cp BENCH_LOCAL.json /tmp/r11_probe_sf01.json

echo "=== leg 2: subset @ sf1 (runs=2) ==="
SPARK_GRAFT_SF_DIR=/root/repo/data/sf1 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench
cp BENCH_LOCAL.json /tmp/r11_probe_sf1.json

echo "=== leg 3: subset @ sf10 (runs=2, the leg round 10 lost to load) ==="
echo "load before sf10 leg: $(cat /proc/loadavg)"
SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench
cp BENCH_LOCAL.json /tmp/r11_probe_sf10.json

cp /tmp/r11_bench_full_sf01.json BENCH_LOCAL.json

echo "=== determinism probe: two Verify runs @ sf0.01 ==="
rm -rf /tmp/r11_det_a /tmp/r11_det_b
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/r11_det_a \
  > /tmp/r11_det_a.log 2>&1
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/r11_det_b \
  > /tmp/r11_det_b.log 2>&1
python3 tools/determinism.py /tmp/r11_det_a /tmp/r11_det_b | tail -2

echo "=== sf1 oracle gate: Verify @ data/sf1 + DuckDB compare ==="
rm -rf /tmp/r11_verify_sf1
tools/run.sh graft.Verify /root/repo/data/sf1 /tmp/r11_verify_sf1 \
  > /tmp/r11_verify_sf1.log 2>&1
python3 tools/validate.py /root/repo/data/sf1 /tmp/r11_verify_sf1 | tail -3

echo "=== scale ratios ==="
python3 tools/scale_report.py /tmp/r11_probe_sf01.json /tmp/r11_probe_sf1.json 10 || true
python3 tools/scale_report.py /tmp/r11_probe_sf01.json /tmp/r11_probe_sf10.json 100 || true
echo "load at end: $(cat /proc/loadavg)"
echo "=== round-11 campaign complete ==="
