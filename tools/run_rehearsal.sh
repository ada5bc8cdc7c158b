#!/bin/sh
# Whole-surface scale rehearsal, the comparability protocol in one
# command (PERFORMANCE.md round-11 section):
#   1. regenerate both scaled artifacts (salted sf1, growing-vocab sf1g)
#   2. warm ann_index + sig_store + planted_cells per dataset (store
#      builds land OUTSIDE the measured pass)
#   3. wipe knn_graph once PER REP (entries are keyed per dataset
#      basename, so every leg of a rep builds its own graph cold; the
#      second wipe keeps rep 2's cold-build profile identical to rep 1)
#   4. measured bench runs, TWO FULL REPS of each leg (r14 protocol):
#      rep 1 -> BENCH_DETAIL_{sf0.1,sf1,sf1g}_raw.json,
#      rep 2 -> BENCH_DETAIL_{sf0.1,sf1,sf1g}_raw2.json.
#      Why full second reps (not just line-sitters): the r14 run showed
#      the AGGREGATE factor is the most noise-exposed number in the
#      artifact — a ratio of two single-shot totals inherits both legs'
#      host swings multiplicatively (base 357.2 s at the fast edge of
#      the recorded 344.7-424.0 s identical-code band turned r13's
#      4.23x into 5.61x with zero plan changes). Two full reps give
#      every row a factor_lo/factor_hi from the 2x2 matrix AND the
#      aggregate its own envelope. knn_graph is wiped before EACH rep
#      so both reps carry the same cold-build profile per leg.
#   5. merge per-query 10x factors -> BENCH_sf1.json / BENCH_sf1g.json.
#      The merge stamps every >10x row with its committed adjudication
#      class (tools/adjudication.py) and EXITS NON-ZERO on any
#      unadjudicated crossing — under set -e that fails this script,
#      which is the contract: new crossings demand a written
#      adjudication, not a prose footnote.
# Keep the machine otherwise quiet: the artifacts are wall-clock.
#
# All legs run SINGLE-REP (SPARK_GRAFT_BENCH_REPS=1): a 10x factor
# is a ratio of two walls measured under ONE protocol, and the cold-store
# accounting must match on both sides — with the sf0.1 leg at
# median-of-3, pass 1 would absorb the cold knn-graph build and the
# median would report the warm serve, while the single-shot sf1 leg still
# carries its cold build: the carrying query's factor would inflate ~3x
# as a pure protocol artifact. The canonical median-of-3 BENCH_DETAIL.json
# is the DRIVER's bench run, not this script's base leg (which therefore
# writes its own _raw file and never clobbers the canonical artifact).
# Rep-2 legs run instrument-free (NO_RECALL_ROW): the recall rows
# already rode rep 1; the envelope rep times queries only.
set -e
cd "$(dirname "$0")/.."

python tools/make_scaled_data.py 10
python tools/make_scaled_data.py --vocab-growth 10
python tools/warm_stores.py /root/testdata/sf0.1 benchdata/sf1 benchdata/sf1g
# stale line-sitter rep2 files from the pre-r14 protocol must not leak
rm -f BENCH_DETAIL_sf1_rep2.json BENCH_DETAIL_sf1g_rep2.json

run_legs() { # suffix: '' for rep 1, '2' for rep 2 (instrument-free)
  if [ -n "$1" ]; then
    export SPARK_GRAFT_NO_RECALL_ROW=1
  else
    unset SPARK_GRAFT_NO_RECALL_ROW
  fi
  # one wipe per rep: graph entries are keyed per dataset basename, so
  # each leg of this rep still builds its own graph cold
  rm -rf benchdata/knn_graph
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_DETAIL="BENCH_DETAIL_sf0.1_raw$1.json" python bench.py
  SPARK_GRAFT_SF_DIR=benchdata/sf1 SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_DETAIL="BENCH_DETAIL_sf1_raw$1.json" python bench.py
  SPARK_GRAFT_SF_DIR=benchdata/sf1g SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_DETAIL="BENCH_DETAIL_sf1g_raw$1.json" python bench.py
}
run_legs ""
run_legs "2"

python tools/merge_sf1_factors.py BENCH_DETAIL_sf0.1_raw.json BENCH_DETAIL_sf1_raw.json \
  BENCH_sf1.json BENCH_DETAIL_sf1_raw2.json BENCH_DETAIL_sf0.1_raw2.json
python tools/merge_sf1_factors.py BENCH_DETAIL_sf0.1_raw.json BENCH_DETAIL_sf1g_raw.json \
  BENCH_sf1g.json BENCH_DETAIL_sf1g_raw2.json BENCH_DETAIL_sf0.1_raw2.json
