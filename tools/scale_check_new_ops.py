"""Measure the session's new operators at sf0.1 vs the 10x replicated
sf1 set (tools/make_scaled_data.py) and print per-query scale factors —
the same experiment PERFORMANCE.md's round-4 table records for the rest
of the surface."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from disco_spark import registry  # noqa: E402
from disco_spark.session import get_spark, load_tables  # noqa: E402

NEW_OPS = [
    "zorder_orders_key",
    "text_quality_gopher",
    "rollup_histogram_quantiles_6h",
    "contamination_train_bloom",
    "dedup_paragraph_clean",
    "streaming_contamination_screen",
]

registry.load_all()
spark = get_spark("scale_check")
results = {}
for sf_dir in ("/root/testdata/sf0.1", "/root/repo/benchdata/sf1"):
    load_tables(spark, sf_dir)
    for name in NEW_OPS:
        t0 = time.perf_counter()
        n = registry.QUERIES[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        results.setdefault(name, []).append((dt, n))
        print(f"{sf_dir.split('/')[-1]} {name}: {dt:.2f}s rows={n}", flush=True)
print("\n== scale factors (sf1 / sf0.1) ==")
for name, ((t01, n01), (t1, n1)) in results.items():
    print(f"{name}: {t1 / t01:.1f}x wall ({t01:.2f}s -> {t1:.2f}s), "
          f"rows {n01} -> {n1}")
spark.stop()
