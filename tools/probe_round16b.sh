#!/bin/bash
# Round-16 SECOND-HALF campaign (after q129 DSIR + q130 MMR landed):
#   leg 0: full-suite sf0.1 bench x3 (127 queries) -> BENCH_LOCAL.json
#   leg 1: scale-subset legs @ sf0.1 / sf1 / sf10, runs=3 each — the
#          round-16 58-query subset + q129/q130/q131 (60 queries)
#   leg 2: determinism probe (two Verify runs @ sf0.01, value compare)
#   leg 3: sf0.01 oracle gate -> COMMITTED CORRECTNESS_LOCAL.json
#   leg 4: sf1 oracle gate
#   (the DSIR model-exchange receipt runs separately:
#    tools/run.sh graft.tools_scratch.DsirProbe 2000000 2)
# Fixture prereq: data/sf1 + data/sf10 regenerated via
#   tools/run.sh graft.tools_scratch.ScaleGen /root/testdata/sf0.1 data/sf1 10
#   tools/run.sh graft.tools_scratch.ScaleGen /root/testdata/sf0.1 data/sf10 100
# FINAL ACT (manual): sbt test on final HEAD, then commit.
set -e
cd /root/repo
export SPARK_DRIVER_MEM=48g
export SPARK_GRAFT_CPUS=32

SUBSET="q114_incremental_semdedup_skew,q115_streaming_semdedup,q113_semdedup_planted,q112_incremental_semdedup,q111_curation_semantic,q110_knn_ivf_hnsw_coarse,q109_semdedup,q87_percentiles_shared,q80_percentiles_exact2p,q61_dedup_clusters,q03_top_revenue_orders,q103_winsorize,q83_training_set_prep,q104_region_market_share,q66_jaccard_prefix_filter,q35_minhash_neardup,q76_incremental_neardup,q106_embedding_neardup_lsh,q107_knn_join_lsh,q108_video_pipeline,q81_repeated_spans,q34_ngram_jaccard_topk,q05_nation_revenue,q97_bigram_topk,q10_running_revenue,q52_percentiles,q93_inverted_index,q09_window_rank,q31_quality_langid,q101_cohort_retention,q14_join_part_supplier,q94_funnel,q96_term_pmi,q42_sessionize,q59_tfidf,q43_asof_join,q33_dedup_exact,q32_langid_confusion,q102_event_transitions,q41_tumbling_window,q44_sliding_window,q89_lead_lag,q69_percentiles_approx,q70_distinct_approx,q116_knn_binary,q117_hamming_neardup,q118_lm_perplexity,q119_lm_quality_gate,q120_quality_classifier,q121_decontam_bloom,q122_heavy_hitters,q123_heavy_hitters_per_source,q124_gopher_repetition,q125_repetition_gate,q126_streaming_vocabulary,q127_lm_pruned_gate,q128_knn_sharded_hnsw,q129_dsir_selection,q130_mmr_diversified,q131_knn_matryoshka"

quiesce() {
  for i in $(seq 1 90); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $load < 0.7 else 0)")
    [ "$ok" = "1" ] && break
    sleep 10
  done
  echo "load: $(cat /proc/loadavg)"
}

echo "=== leg 0: full-suite bench @ sf0.1 (runs=3, 127 queries) ==="
quiesce
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  tools/run.sh graft.Bench 2>/tmp/r16b_bench.log | tail -1
cp BENCH_LOCAL.json /tmp/r16b_bench_full_sf01.json

echo "=== leg 1a: subset @ sf0.1 (runs=3) ==="
quiesce
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench \
  2>/tmp/r16b_probe_sf01.log | tail -1
cp BENCH_LOCAL.json BENCH_SF01_subset_r16b.json

echo "=== leg 1b: subset @ sf1 (runs=3) ==="
quiesce
SPARK_GRAFT_SF_DIR=/root/repo/data/sf1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench \
  2>/tmp/r16b_probe_sf1.log | tail -1
cp BENCH_LOCAL.json BENCH_SF1_r16b.json

echo "=== leg 1c: subset @ sf10 (runs=3) ==="
quiesce
SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_QUERIES="$SUBSET" tools/run.sh graft.Bench \
  2>/tmp/r16b_probe_sf10.log | tail -1
cp BENCH_LOCAL.json BENCH_SF10_r16b.json
cp /tmp/r16b_bench_full_sf01.json BENCH_LOCAL.json

echo "=== leg 2: determinism probe (two Verify runs @ sf0.01) ==="
rm -rf /tmp/r16b_det_a /tmp/r16b_det_b
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/r16b_det_a \
  > /tmp/r16b_det_a.log 2>&1
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/r16b_det_b \
  > /tmp/r16b_det_b.log 2>&1
python3 tools/determinism.py /tmp/r16b_det_a /tmp/r16b_det_b | tail -2

echo "=== leg 3: sf0.01 oracle gate -> CORRECTNESS_LOCAL.json ==="
python3 tools/validate.py --json CORRECTNESS_LOCAL.json \
  /root/testdata/sf0.01 /tmp/r16b_det_a | tail -3
python3 - <<'EOF'
import json, sys
art = json.load(open("CORRECTNESS_LOCAL.json"))
entries = {k: v for k, v in art.items() if not k.startswith("_")}
manifest = [l.strip() for l in open("/tmp/r16b_det_a/queries.txt") if l.strip()]
missing = [q for q in manifest if q not in entries]
assert entries, "CORRECTNESS_LOCAL.json is EMPTY"
assert not missing, f"artifact missing entries: {missing}"
assert "_meta" in art and art["_meta"].get("duckdb_version"), "duckdb version not pinned"
fails = [q for q, v in entries.items() if not v["pass"]]
print(f"artifact OK: {len(entries)} entries == {len(manifest)} manifest; "
      f"duckdb {art['_meta']['duckdb_version']}; fails={fails}")
sys.exit(1 if fails else 0)
EOF

echo "=== leg 4: sf1 oracle gate ==="
rm -rf /tmp/r16b_verify_sf1
tools/run.sh graft.Verify /root/repo/data/sf1 /tmp/r16b_verify_sf1 \
  > /tmp/r16b_verify_sf1.log 2>&1
python3 tools/validate.py /root/repo/data/sf1 /tmp/r16b_verify_sf1 | tail -3

echo "=== campaign done; load at end: $(cat /proc/loadavg) ==="
echo "FINAL ACT (manual): sbt test on final HEAD, then commit"
