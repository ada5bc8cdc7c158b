#!/bin/sh
# Whole-surface scale rehearsal, the comparability protocol in one
# command (PERFORMANCE.md round-11 section):
#   1. regenerate both scaled artifacts (salted sf1, growing-vocab sf1g)
#   2. warm ann_index + sig_store per dataset (store builds land OUTSIDE
#      the measured pass)
#   3. wipe knn_graph ONCE (entries are keyed per dataset basename, so
#      every measured run builds its own graph: cold on every side)
#   4. measured bench runs: base sf0.1 -> BENCH_DETAIL_sf0.1_raw.json,
#      sf1 -> BENCH_DETAIL_sf1_raw.json, sf1g -> BENCH_DETAIL_sf1g_raw.json
#   5. merge per-query 10x factors -> BENCH_sf1.json / BENCH_sf1g.json
# Keep the machine otherwise quiet: the artifacts are wall-clock.
#
# All three legs run SINGLE-REP (SPARK_GRAFT_BENCH_REPS=1): a 10x factor
# is a ratio of two walls measured under ONE protocol, and the cold-store
# accounting must match on both sides — with the sf0.1 leg at
# median-of-3, pass 1 would absorb the cold knn-graph build and the
# median would report the warm serve, while the single-shot sf1 leg still
# carries its cold build: the carrying query's factor would inflate ~3x
# as a pure protocol artifact. The canonical median-of-3 BENCH_DETAIL.json
# is the DRIVER's bench run, not this script's base leg (which therefore
# writes its own _raw file and never clobbers the canonical artifact).
set -e
cd "$(dirname "$0")/.."

python tools/make_scaled_data.py 10
python tools/make_scaled_data.py --vocab-growth 10
python tools/warm_stores.py /root/testdata/sf0.1 benchdata/sf1 benchdata/sf1g
rm -rf benchdata/knn_graph

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_DETAIL=BENCH_DETAIL_sf0.1_raw.json python bench.py
SPARK_GRAFT_SF_DIR=benchdata/sf1 SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_DETAIL=BENCH_DETAIL_sf1_raw.json python bench.py
SPARK_GRAFT_SF_DIR=benchdata/sf1g SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_DETAIL=BENCH_DETAIL_sf1g_raw.json python bench.py

python tools/merge_sf1_factors.py BENCH_DETAIL_sf0.1_raw.json BENCH_DETAIL_sf1_raw.json BENCH_sf1.json
python tools/merge_sf1_factors.py BENCH_DETAIL_sf0.1_raw.json BENCH_DETAIL_sf1g_raw.json BENCH_sf1g.json
