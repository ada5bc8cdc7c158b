"""Randomized cross-model checks for the continuation operators:
engine plans vs brute-force Python references on seeded random data
(the 044b9cc pattern — sessionize/triangles had these; here skyline,
interval coalescing, and weighted median get theirs)."""

from __future__ import annotations

import os
import random
import tempfile

from pyspark.sql import functions as F


def test_skyline_matches_bruteforce(spark):
    """Harness skyline == O(n^2) brute-force non-domination filter on
    random 2-D points (with deliberate duplicates for tie coverage)."""
    from disco_spark.operators.relational3 import skyline_parts_price_size

    rng = random.Random(7)
    pts = [
        (i, float(rng.randint(1, 40)), rng.randint(1, 40))
        for i in range(1, 301)
    ]
    pts += [(1000 + i, p, s) for i, (_, p, s) in enumerate(pts[:20])]
    df = spark.createDataFrame(
        pts, "p_partkey long, p_retailprice double, p_size int"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "part.parquet"))
        got = {
            r["p_partkey"]
            for r in skyline_parts_price_size(spark, d).collect()
        }
    want = set()
    for k, p, s in pts:
        dominated = any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for _, p2, s2 in pts
        )
        if not dominated:
            want.add(k)
    assert got == want


def test_interval_coalesce_matches_bruteforce(spark):
    """Sweep-line coverage == brute-force interval union per user on
    random event times (dense enough to force overlaps)."""
    from disco_spark.operators.interval import (
        ACTIVITY_WINDOW_S,
        interval_coalesce_coverage,
    )

    rng = random.Random(13)
    rows = []
    for u in range(1, 11):
        for _ in range(rng.randint(1, 30)):
            rows.append((u, rng.randint(0, 5000)))
    ev = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.timestamp_seconds("sec").alias("ts")
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r["user_id"]: (r["n_intervals"], r["covered_s"])
            for r in interval_coalesce_coverage(spark, d).collect()
        }
    by_user = {}
    for u, s in rows:
        by_user.setdefault(u, []).append((s, s + ACTIVITY_WINDOW_S))
    want = {}
    for u, ivs in by_user.items():
        merged = []
        for s, e in sorted(ivs):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        want[u] = (len(merged), sum(e - s for s, e in merged))
    assert got == want


def test_weighted_median_matches_bruteforce(spark):
    """Engine weighted median == the Python running-weight cut on
    random weighted prices."""
    from disco_spark.operators.relational3 import (
        weighted_median_price_by_priority,
    )

    rng = random.Random(21)
    li, od = [], []
    for ok in range(1, 41):
        prio = f"P{ok % 3}"
        od.append((ok, prio))
        for pk in range(1, rng.randint(2, 6)):
            li.append(
                (pk, ok, float(rng.randint(1, 500)), float(rng.randint(1, 9)))
            )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            li,
            "l_partkey long, l_orderkey long, l_extendedprice double,"
            " l_quantity double",
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        spark.createDataFrame(
            od, "o_orderkey long, o_orderpriority string"
        ).write.parquet(os.path.join(d, "orders.parquet"))
        got = {
            r["o_orderpriority"]: r["weighted_median_price"]
            for r in weighted_median_price_by_priority(spark, d).collect()
        }
    prio_of = dict(od)
    groups = {}
    for pk, ok, price, qty in li:
        groups.setdefault(prio_of[ok], []).append(
            (round(price * 100), ok, pk, int(qty))
        )
    want = {}
    for prio, rows_ in groups.items():
        rows_.sort()
        tot = sum(w for _, _, _, w in rows_)
        cum = 0
        for cents, _, _, w in rows_:
            cum += w
            if 2 * cum >= tot:
                want[prio] = cents / 100
                break
    assert got == want
