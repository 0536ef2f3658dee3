#!/usr/bin/env bash
# Round-20 sweep driver: the same critical-first, compose-and-commit-
# per-point shape as sweep_r19.sh (x100 -> x1000 -> x2000 -> sf0.1 ->
# x10), run at the round's FINAL HEAD — the r19 judge's item #1 (the
# r19 sweep points predated that round's last rewrites). Prior-round
# point files are moved aside first so the incremental compose never
# mixes r19 measurements into an r20-headed artifact. (Driver-side
# tooling; the library never depends on this.)
set -uo pipefail
cd "$(dirname "$0")/.."

TS=$(date +%s)
mkdir -p /tmp/scale/r19_points
for f in /tmp/scale/bench_sf01.json /tmp/scale/bench_x10.json \
         /tmp/scale/bench_x100.json /tmp/scale/bench_x1000.json \
         /tmp/scale/bench_x2000.json; do
  [ -f "$f" ] && mv "$f" /tmp/scale/r19_points/ 2>/dev/null || true
done

run_point() { # sfdir out  (same noise note as run_scale.sh)
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_BENCH_OUT="$2" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -3
}

idle_wait() {
  for i in $(seq 1 60); do
    l=$(cut -d" " -f1 /proc/loadavg)
    awk "BEGIN{exit !($l < 1.0)}" && return 0
    sleep 10
  done
}

compose_and_commit() { # msg
  args=()
  [ -f /tmp/scale/bench_sf01.json ]  && args+=("sf0.1 (17 MB, driver scale)=/tmp/scale/bench_sf01.json")
  [ -f /tmp/scale/bench_x10.json ]   && args+=("10x sf0.1 (170 MB)=/tmp/scale/bench_x10.json")
  [ -f /tmp/scale/bench_x100.json ]  && args+=("100x sf0.1 (1.7 GB)=/tmp/scale/bench_x100.json")
  [ -f /tmp/scale/bench_x1000.json ] && args+=("1000x sf0.1 (17 GB, reduced suite)=/tmp/scale/bench_x1000.json")
  [ -f /tmp/scale/bench_x2000.json ] && args+=("2000x sf0.1 (34 GB, heavy family, input > heap)=/tmp/scale/bench_x2000.json")
  python3 scripts/compose_scale.py BENCH_SCALE.json "${args[@]}" || return 1
  git add BENCH_SCALE.json
  git commit -m "$1" || true
}

echo "[sweep] x100 point"
idle_wait
SPARK_GRAFT_CLUSTER_PROBE=1 run_point /tmp/scale/x100 /tmp/scale/bench_x100.json
compose_and_commit "r20 sweep: x100 point measured and composed"

echo "[sweep] x1000 point"
idle_wait
SPARK_DRIVER_MEM=32g \
SPARK_GRAFT_PROBE_DEGRADE=1 \
SPARK_GRAFT_EXCLUDE=range_join,contamination,doc_fingerprint,langid_confusion,quality_scores \
SPARK_GRAFT_SKIP_BLOCKS=vector,skew_join_planted,proximity_count_ab,segmenter_sustained,streaming_state_sustained,tail_attribution \
  run_point /tmp/scale/x1000 /tmp/scale/bench_x1000.json
compose_and_commit "r20 sweep: x1000 point added"

echo "[sweep] x2000 bigger-than-heap point"
idle_wait
SPARK_DRIVER_MEM=32g \
SPARK_GRAFT_ONLY=salted_join,q3_shipping,pack_sequences,minhash_neardups,simhash_neardups,minhash_bands,dedup_clusters,lang_stopwords,sessionize,a6_pricing_summary,heavy_hitters,a1_sum \
SPARK_GRAFT_SKIP_BLOCKS=vector,skew_join_planted,proximity_count_ab,segmenter_sustained,streaming_state_sustained,tail_attribution,ts_decode_ab,a8_fixed_cost,asof_floor,join_floor_profile,dense_lookup_ab,a6_floor_ab \
  run_point /tmp/scale/x2000 /tmp/scale/bench_x2000.json
compose_and_commit "r20 sweep: x2000 bigger-than-heap heavy-family point added"

echo "[sweep] sf0.1 point"
idle_wait
run_point /root/testdata/sf0.1 /tmp/scale/bench_sf01.json
cp bench_history/BENCH_FULL_latest.json bench_history/BENCH_FULL_r20.json 2>/dev/null || true
git add bench_history/BENCH_FULL_r20.json bench_history/BENCH_FULL_latest.json 2>/dev/null || true
compose_and_commit "r20 sweep: sf0.1 point added; full per-query maps committed"

echo "[sweep] x10 point"
idle_wait
run_point /tmp/scale/x10 /tmp/scale/bench_x10.json
compose_and_commit "r20 sweep: complete (all five points at HEAD)"

echo "[sweep] done at $(( $(date +%s) - TS ))s"
