"""Measure a set of queries at a base scale vs the 10x replicated set
(tools/make_scaled_data.py) and print per-query scale factors — the
same experiment PERFORMANCE.md's round-4 table records for the rest of
the surface.

Usage:
    python tools/scale_check_new_ops.py [query ...] \
        [--base DIR] [--scaled DIR]

Defaults: base=/root/testdata/sf0.1, scaled=<repo>/benchdata/sf1,
queries = this round's new/changed operators.
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from disco_spark import registry  # noqa: E402
from disco_spark.session import get_spark, load_tables  # noqa: E402

DEFAULT_OPS = [  # round-7 new surface; pass names argv-style for others
    "events_sessionize_gap",
    "text_lm_perplexity",
    "graph_triangle_count",
    "ann_index_delete_topk",
    "rollup_incremental_refresh",
    "cdc_upsert_latest_wins",
]

ap = argparse.ArgumentParser()
ap.add_argument("queries", nargs="*", default=None)
ap.add_argument("--base", default="/root/testdata/sf0.1")
ap.add_argument("--scaled", default=os.path.join(REPO, "benchdata", "sf1"))
args = ap.parse_args()
ops = args.queries or DEFAULT_OPS

registry.load_all()
unknown = [q for q in ops if q not in registry.QUERIES]
assert not unknown, f"unknown queries: {unknown}"
spark = get_spark("scale_check")
results = {}
for sf_dir in (args.base, args.scaled):
    load_tables(spark, sf_dir)
    for name in ops:
        t0 = time.perf_counter()
        n = registry.QUERIES[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        results.setdefault(name, []).append((dt, n))
        print(f"{sf_dir.split('/')[-1]} {name}: {dt:.2f}s rows={n}", flush=True)
print("\n== scale factors (scaled / base) ==")
for name, ((t01, n01), (t1, n1)) in results.items():
    print(f"{name}: {t1 / t01:.1f}x wall ({t01:.2f}s -> {t1:.2f}s), "
          f"rows {n01} -> {n1}")
spark.stop()
