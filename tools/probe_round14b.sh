#!/bin/bash
# Round-14 FINAL campaign on final HEAD (second half of the round; the
# first-half campaign — probe_round14.sh — committed the 49-query scale
# legs and the earlier BENCH_LOCAL; old-query code is unchanged since,
# so those legs stay valid and this pass covers what the late additions
# changed):
#   leg 0: full-suite sf0.1 bench x3 (121 queries) -> BENCH_LOCAL.json
#   leg 1: determinism probe (two Verify runs @ sf0.01, value compare)
#   leg 2: sf0.01 oracle gate -> COMMITTED CORRECTNESS_LOCAL.json
#          (fails if empty or missing any manifest entry)
#   leg 3: sf1 oracle gate (withhold set must stay the adjudicated
#          designed class; the five new queries all carry static SQL)
#   leg 4: isolated q108 stage attribution @ sf10, quiesce-gated — the
#          clean settling run (the mid-round one overlapped two small
#          verify jobs)
# FINAL ACT (manual): sbt test on final HEAD, then commit.
set -e
cd /root/repo
export SPARK_DRIVER_MEM=48g
export SPARK_GRAFT_CPUS=32

quiesce() {
  for i in $(seq 1 90); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $load < 0.7 else 0)")
    [ "$ok" = "1" ] && break
    sleep 10
  done
  echo "load: $(cat /proc/loadavg)"
}

echo "=== leg 0: full-suite bench @ sf0.1 (runs=3, 121 queries) ==="
quiesce
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  tools/run.sh graft.Bench 2>/tmp/r14b_bench.log | tail -1
cp BENCH_LOCAL.json /tmp/r14b_bench_full_sf01.json

echo "=== leg 1: determinism probe (two Verify runs @ sf0.01) ==="
rm -rf /tmp/r14b_det_a /tmp/r14b_det_b
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/r14b_det_a \
  > /tmp/r14b_det_a.log 2>&1
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/r14b_det_b \
  > /tmp/r14b_det_b.log 2>&1
python3 tools/determinism.py /tmp/r14b_det_a /tmp/r14b_det_b | tail -2

echo "=== leg 2: sf0.01 oracle gate -> CORRECTNESS_LOCAL.json ==="
python3 tools/validate.py --json CORRECTNESS_LOCAL.json \
  /root/testdata/sf0.01 /tmp/r14b_det_a | tail -3
python3 - <<'EOF'
import json, sys
art = json.load(open("CORRECTNESS_LOCAL.json"))
manifest = [l.strip() for l in open("/tmp/r14b_det_a/queries.txt") if l.strip()]
missing = [q for q in manifest if q not in art]
assert art, "CORRECTNESS_LOCAL.json is EMPTY"
assert not missing, f"artifact missing entries: {missing}"
fails = [q for q, v in art.items() if not v["pass"]]
print(f"artifact OK: {len(art)} entries == {len(manifest)} manifest; fails={fails}")
sys.exit(1 if fails else 0)
EOF

echo "=== leg 3: sf1 oracle gate ==="
rm -rf /tmp/r14b_verify_sf1
tools/run.sh graft.Verify /root/repo/data/sf1 /tmp/r14b_verify_sf1 \
  > /tmp/r14b_verify_sf1.log 2>&1
python3 tools/validate.py /root/repo/data/sf1 /tmp/r14b_verify_sf1 | tail -3

echo "=== leg 4: isolated q108 attribution @ sf10 (clean settling run) ==="
quiesce
tools/run.sh graft.tools_scratch.R14Probe q108 /root/repo/data/sf10 3 \
  2>/dev/null | grep "\[q108\]" | tee /tmp/r14b_q108_attribution.txt

echo "=== campaign done; load at end: $(cat /proc/loadavg) ==="
echo "FINAL ACT (manual): sbt test on final HEAD, then commit"
