"""Dump .explain('formatted') for headline queries and summarize plan
shape (guide §7.2): Exchange count, join strategies, Python-eval nodes,
scans with/without PushedFilters.

Usage:
    python tools/audit_plans.py --out plans/r14 --suffix _before [names...]

With no names, audits every bench.py HEADLINE query. Queries whose
builder function itself runs jobs (cluster maps' driver union-find,
streaming availableNow runs) still only pay plan construction here —
the explain never executes the returned frame — but construction-time
actions do run; budget a few minutes for the full sweep.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from disco_spark import registry  # noqa: E402
from disco_spark.session import get_spark, load_tables  # noqa: E402


def formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def summarize(plan: str) -> str:
    pats = [
        ("exch", r"Exchange"),
        ("smj", r"SortMergeJoin"),
        ("bhj", r"BroadcastHashJoin"),
        ("shj", r"ShuffledHashJoin"),
        ("bnl", r"BroadcastNestedLoopJoin"),
        ("cart", r"CartesianProduct"),
        ("sort", r"\bSort\b"),
        ("win", r"Window"),
        ("pyeval", r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas"),
        ("expand", r"Expand"),
    ]
    return " ".join(f"{k}={len(re.findall(p, plan))}" for k, p in pats)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="_before")
    args = ap.parse_args()

    registry.load_all()
    if args.names:
        names = args.names
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in registry.QUERIES]
    spark = get_spark("disco_spark_plan_audit")
    load_tables(spark, args.sf_dir)
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        t0 = time.perf_counter()
        try:
            plan = formatted_plan(registry.QUERIES[name](spark, args.sf_dir))
        except Exception as e:  # noqa: BLE001 — audit keeps going
            print(f"{name}: ERROR {e}", flush=True)
            continue
        with open(os.path.join(args.out, f"{name}{args.suffix}.txt"), "w") as f:
            f.write(plan)
        dt = time.perf_counter() - t0
        print(f"{name}: {summarize(plan)} build={dt:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
