#!/bin/bash
# Round-8 measurement campaign (VERDICT r7 tasks 1-3):
#   leg 0: full-suite sf0.1 bench (3 interleaved runs) -> BENCH_LOCAL.json
#   gen:   ScaleGen sf1 (10x) + sf10 (100x) fixtures on HEAD
#   legs:  35-query expensive subset at sf0.1 / sf1 / sf10, min-of-2
#          interleaved sweeps each (SCALING.md methodology), one code
#          version throughout.
# All legs run sequentially on a quiet VM; BENCH_LOCAL.json is copied
# aside after each leg (Bench overwrites it in cwd).
set -e
cd /root/repo
export SPARK_DRIVER_MEM=48g
export SPARK_GRAFT_CPUS=32

# 33-query data-dominated subset from SCALING.md + q107 (bulk kNN join,
# never measured above sf0.1) + q108 (real video path) + q109 (semantic
# dedup, new this round).
SUBSET="q109_semdedup,q87_percentiles_shared,q80_percentiles_exact2p,q61_dedup_clusters,q03_top_revenue_orders,q103_winsorize,q83_training_set_prep,q104_region_market_share,q66_jaccard_prefix_filter,q35_minhash_neardup,q76_incremental_neardup,q106_embedding_neardup_lsh,q107_knn_join_lsh,q108_video_pipeline,q81_repeated_spans,q34_ngram_jaccard_topk,q05_nation_revenue,q97_bigram_topk,q10_running_revenue,q52_percentiles,q93_inverted_index,q09_window_rank,q31_quality_langid,q101_cohort_retention,q14_join_part_supplier,q94_funnel,q96_term_pmi,q42_sessionize,q59_tfidf,q43_asof_join,q33_dedup_exact,q32_langid_confusion,q102_event_transitions,q41_tumbling_window,q44_sliding_window,q89_lead_lag"

echo "=== leg 0: full-suite bench @ sf0.1 (runs=3) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  tools/run.sh graft.Bench
cp BENCH_LOCAL.json /tmp/r8_bench_full_sf01.json

echo "=== ScaleGen sf1 (10x) ==="
tools/run.sh graft.tools_scratch.ScaleGen /root/testdata/sf0.1 /root/repo/data/sf1 10
echo "=== ScaleGen sf10 (100x) ==="
tools/run.sh graft.tools_scratch.ScaleGen /root/testdata/sf0.1 /root/repo/data/sf10 100

echo "=== leg 1: subset @ sf0.1 (runs=2) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench
cp BENCH_LOCAL.json /tmp/r8_probe_sf01.json

echo "=== leg 2: subset @ sf1 (runs=2) ==="
SPARK_GRAFT_SF_DIR=/root/repo/data/sf1 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench
cp BENCH_LOCAL.json /tmp/r8_probe_sf1.json

echo "=== leg 3: subset @ sf10 (runs=2) ==="
SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench
cp BENCH_LOCAL.json /tmp/r8_probe_sf10.json

cp /tmp/r8_bench_full_sf01.json BENCH_LOCAL.json
echo "=== probe legs done ==="
python3 tools/scale_report.py /tmp/r8_probe_sf01.json /tmp/r8_probe_sf1.json 10 || true
python3 tools/scale_report.py /tmp/r8_probe_sf01.json /tmp/r8_probe_sf10.json 100 || true
echo "=== campaign complete ==="
